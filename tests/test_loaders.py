"""Loader tests against real files written on the fly (.mat both formats,
.npy, CSV) — exercising the non-synthetic code paths."""

import numpy as np
import pytest
from scipy.io import loadmat, savemat

from position_induced_transformer_tpu.data import loaders


def test_burgers_real_mat(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "data_burgers.mat")
    savemat(path, {"x": rng.random((40, 64)), "y": rng.random((40, 64))})
    x_tr, y_tr, x_te, y_te = loaders.burgers(path, ntrain=32, ntest=8)
    assert x_tr.shape == (32, 64, 1) and x_te.shape == (8, 64, 1)
    assert x_tr.dtype == np.float32


def test_sod_real_mat_primitive_transform(tmp_path):
    rng = np.random.default_rng(1)
    rho = rng.uniform(0.5, 2.0, (10, 32, 1))
    u = rng.uniform(-1, 1, (10, 32, 1))
    p = rng.uniform(0.5, 2.0, (10, 32, 1))
    # conservative variables (rho, m=rho*u, E = p/(g-1) + rho u^2/2)
    cons = np.concatenate(
        [rho, rho * u, p / 0.4 + 0.5 * rho * u**2], axis=-1
    ).astype(np.float32)
    path = str(tmp_path / "data_sod.mat")
    savemat(path, {"x": cons, "y": cons.copy()})
    x_tr, y_tr, _, _ = loaders.sod(path, ntrain=8, ntest=2)
    # loader recovers primitive variables (reference: train_sod.py:12-16)
    np.testing.assert_allclose(x_tr[..., 1:2], u[:8], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(x_tr[..., 2:3], p[:8], rtol=1e-4, atol=1e-5)


def test_load_mat_hdf5_fallback(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "v73.mat")
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=arr.T)  # MATLAB HDF5 is column-major
    out = loaders.load_mat(path)
    np.testing.assert_array_equal(out["u"], arr)


def test_cylinder_real_files(tmp_path):
    rng = np.random.default_rng(2)
    traj_tr = rng.random((4, 50, 3, 11)).astype(np.float32)
    traj_te = rng.random((2, 50, 3, 11)).astype(np.float32)
    p_tr = str(tmp_path / "tr.mat")
    p_te = str(tmp_path / "te.mat")
    savemat(p_tr, {"trajectories": traj_tr})
    savemat(p_te, {"trajectories": traj_te})
    verts = str(tmp_path / "v.csv")
    verts_small = str(tmp_path / "vs.csv")
    np.savetxt(verts, rng.random((50, 2)), delimiter=",")
    np.savetxt(verts_small, rng.random((10, 2)), delimiter=",")
    # pad the csvs past the LFS-stub size gate
    elems = str(tmp_path / "e.csv")
    np.savetxt(elems, rng.integers(1, 51, (20, 3)), delimiter=",")  # 1-based
    x_tr, y_tr, x_te, y_te, mesh, mesh_ltt, te, elements = loaders.cylinder(
        p_tr, p_te, verts, verts_small, ntrain=4, ntest=2,
        elements_path=elems,
    )
    assert x_tr.shape == (40, 50, 3)  # 10 one-step pairs per trajectory
    np.testing.assert_allclose(
        x_tr[0], traj_tr[0, :, :, 0], rtol=1e-6
    )
    assert mesh.shape == (50, 2) and mesh_ltt.shape == (10, 2)
    assert te.shape == (2, 50, 3, 11)
    # elements.csv is 1-based in the reference (train_cylinder.py:67)
    assert elements.min() >= 0 and elements.max() <= 49


def test_elasticity_real_npy(tmp_path):
    rng = np.random.default_rng(3)
    np.save(tmp_path / "Random_UnitCell_rr_10.npy", rng.random((42, 20)))
    np.save(tmp_path / "Random_UnitCell_XY_10.npy", rng.random((30, 2, 20)))
    np.save(tmp_path / "Random_UnitCell_sigma_10.npy", rng.random((30, 20)))
    X, ext, Y, Xt, extt, Yt = loaders.elasticity(
        str(tmp_path), ntrain=16, ntest=4
    )
    assert X.shape == (16, 30, 44)  # XY ++ broadcast 42-dim radius vector
    assert ext.shape == (16, 30, 2) and Y.shape == (16, 30, 1)


def test_darcy_real_mat_downsampling(tmp_path):
    """Real piececonst_r421 layout: coeff/sol (N, 421, 421), strided
    downsampling to s=43 with a channel axis appended (reference:
    train_darcy.py:11-22 r=10 slicing)."""
    rng = np.random.default_rng(2)
    tr = str(tmp_path / "train.mat")
    te = str(tmp_path / "test.mat")
    savemat(tr, {"coeff": rng.random((4, 421, 421)), "sol": rng.random((4, 421, 421))})
    savemat(te, {"coeff": rng.random((3, 421, 421)), "sol": rng.random((3, 421, 421))})
    x_tr, y_tr, x_te, y_te = loaders.darcy(
        tr, te, downsampling=10, ntrain=4, ntest=3
    )
    assert x_tr.shape == (4, 43, 43, 1) and y_te.shape == (3, 43, 43, 1)
    assert x_tr.dtype == np.float32
    # strided slice, not interpolation
    full = loadmat(tr)["coeff"].astype(np.float32)
    np.testing.assert_array_equal(x_tr[..., 0], full[:, ::10, ::10][:, :43, :43])


def test_vorticity_real_mat_frame_split(tmp_path):
    """Real NavierStokes layout: u (N, 64, 64, T); the loader splits
    frames into [:memory] inputs and [memory:memory+steps] targets
    (reference: train_vorticity.py:7-21)."""
    rng = np.random.default_rng(3)
    path = str(tmp_path / "ns.mat")
    u = rng.random((6, 16, 16, 9)).astype(np.float32)
    savemat(path, {"u": u})
    x_tr, y_tr, x_te, y_te = loaders.vorticity(
        path, ntrain=4, ntest=2, memory=4, steps=5
    )
    assert x_tr.shape == (4, 16, 16, 4) and y_tr.shape == (4, 16, 16, 5)
    np.testing.assert_array_equal(x_te, u[-2:, :, :, :4])
    np.testing.assert_array_equal(y_te, u[-2:, :, :, 4:9])


def test_naca_real_npy_layout(tmp_path):
    """Real NACA directory layout: shape_coords (N,120,2), C-grid
    vertex X/Y (N,221,51), state Q (N,C,221,51) of which the first 4
    channels transpose to (N,221,51,4) (reference: train_naca.py:8-13)."""
    rng = np.random.default_rng(4)
    n, nx, ny = 5, 221, 51
    np.save(tmp_path / "shape_coords.npy", rng.random((n, 120, 2)).astype(np.float32))
    np.save(tmp_path / "NACA_Cylinder_X.npy", rng.random((n, nx, ny)))
    np.save(tmp_path / "NACA_Cylinder_Y.npy", rng.random((n, nx, ny)))
    q = rng.random((n, 6, nx, ny))
    np.save(tmp_path / "NACA_Cylinder_Q.npy", q)
    coords_tr, X_tr, Y_tr, coords_te, X_te, Y_te = loaders.naca(
        str(tmp_path), ntrain=3, ntest=2
    )
    assert coords_tr.shape == (3, 120, 2)
    assert X_tr.shape == (3, nx, ny, 2) and X_tr.dtype == np.float32
    assert Y_te.shape == (2, nx, ny, 4)
    np.testing.assert_allclose(
        Y_te, q[-2:, :4].transpose(0, 2, 3, 1).astype(np.float32)
    )
    # mach=True: the single Q[:, 4] Mach field (the TF reference's
    # target, tensorflow/6_NACA/utils.py:48) — NOT channel 0 of Q[:, :4]
    _, _, Ym_tr, _, _, Ym_te = loaders.naca(
        str(tmp_path), ntrain=3, ntest=2, mach=True
    )
    assert Ym_tr.shape == (3, nx, ny, 1)
    np.testing.assert_allclose(
        Ym_te[..., 0], q[-2:, 4].astype(np.float32)
    )


def test_undersized_real_file_raises(tmp_path):
    """A real file smaller than ntrain+ntest must raise — the reference's
    x[:ntrain]/x[-ntest:] slicing silently truncates AND overlaps the
    splits (test-set leakage)."""
    rng = np.random.default_rng(5)
    path = str(tmp_path / "small.mat")
    savemat(path, {"x": rng.random((10, 16)), "y": rng.random((10, 16))})
    with pytest.raises(ValueError, match="10 samples"):
        loaders.burgers(path, ntrain=8, ntest=4)
    # exactly enough is fine
    x_tr, _, x_te, _ = loaders.burgers(path, ntrain=8, ntest=2)
    assert x_tr.shape[0] == 8 and x_te.shape[0] == 2


def test_explicit_path_fallback_warns(tmp_path):
    """A typo'd --data-path must not silently produce synthetic numbers."""
    with pytest.warns(UserWarning, match="SYNTHETIC"):
        loaders.burgers(str(tmp_path / "nope.mat"), ntrain=8, ntest=2)
    # no path: silent synthetic fallback (the documented CI design)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        loaders.burgers(None, ntrain=8, ntest=2)


def test_lfs_pointer_detected_small_real_accepted(tmp_path):
    """Stub detection reads the git-LFS pointer signature; a legitimately
    tiny real file passes."""
    stub = tmp_path / "stub.mat"
    stub.write_bytes(
        b"version https://git-lfs.github.com/spec/v1\n"
        b"oid sha256:abc\nsize 123\n"
    )
    assert not loaders._is_real_file(str(stub))
    small = tmp_path / "small.csv"
    small.write_text("0.1,0.2\n0.3,0.4\n")  # well under 1 KB, real
    assert loaders._is_real_file(str(small))


def test_vorticity_frame_count_validated(tmp_path):
    rng = np.random.default_rng(6)
    path = str(tmp_path / "vort.mat")
    savemat(path, {"u": rng.random((6, 8, 8, 12)).astype(np.float32)})
    with pytest.raises(ValueError, match="frames"):
        loaders.vorticity(path, ntrain=4, ntest=2, memory=10, steps=20)
    out = loaders.vorticity(path, ntrain=4, ntest=2, memory=4, steps=8)
    assert out[1].shape[-1] == 8  # full target horizon present
