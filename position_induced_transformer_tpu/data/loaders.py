"""Dataset loaders for the seven reference benchmarks.

Numpy-only I/O (scipy ``.mat`` with an HDF5 fallback for MATLAB v7.3 files,
``.npy``, CSV meshes) mirroring the reference loaders' shapes and
preprocessing (reference: train_burgers.py:7-17, train_sod.py:7-21,
train_darcy.py:7-23, train_vorticity.py:7-21, train_elasticity.py:7-16,
train_naca.py:7-15, train_cylinder.py:8-16). Every loader falls back to the
synthetic generators when the real files are absent (the bundled data are
git-LFS stubs — SURVEY.md §2.3), so end-to-end training always runs.

Returned arrays are host numpy float32; device placement happens once in the
training loop, not per batch.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from position_induced_transformer_tpu.data import synthetic


def load_mat(path: str) -> dict:
    """Load a MATLAB file, handling both pre-7.3 and HDF5-based formats
    (the reference needs mat73 for some FNO files — train_vorticity.py:8-12)."""
    from scipy.io import loadmat as scipy_loadmat

    try:
        return scipy_loadmat(path)
    except (NotImplementedError, ValueError):
        # v7.3 files raise NotImplementedError; bare-HDF5 files (no MATLAB
        # header) raise ValueError — both are readable through h5py
        import h5py

        out = {}
        with h5py.File(path, "r") as f:
            for k, v in f.items():
                if isinstance(v, h5py.Dataset):
                    # MATLAB HDF5 stores column-major; transpose to match loadmat
                    out[k] = np.array(v).T
        return out


def _is_real_file(path) -> bool:
    # git-LFS pointer stubs are ~133 bytes; treat them as absent.
    return path is not None and os.path.exists(path) and os.path.getsize(path) > 1024


def burgers(path=None, ntrain=1024, ntest=128, L=1024) -> Tuple[np.ndarray, ...]:
    if _is_real_file(path):
        data = load_mat(path)
        x = data["x"].astype(np.float32)[..., None]
        y = data["y"].astype(np.float32)[..., None]
    else:
        x, y = synthetic.burgers(n=ntrain + ntest, L=L)
    return x[:ntrain], y[:ntrain], x[-ntest:], y[-ntest:]


def sod(path=None, ntrain=1024, ntest=128, L=1024) -> Tuple[np.ndarray, ...]:
    gamma = 1.4
    if _is_real_file(path):
        data = load_mat(path)
        x = data["x"].astype(np.float32)
        y = data["y"].astype(np.float32)
        for arr in (x, y):
            # conservative -> primitive: p = (E - rho*u^2/2)(gamma-1), u = m/rho
            # (reference: train_sod.py:12-16)
            arr[..., 2] = (arr[..., 2] - 0.5 * arr[..., 1] ** 2 / arr[..., 0]) * (
                gamma - 1
            )
            arr[..., 1] = arr[..., 1] / arr[..., 0]
    else:
        x, y = synthetic.sod(n=ntrain + ntest, L=L)
    return x[:ntrain], y[:ntrain], x[-ntest:], y[-ntest:]


def darcy(
    train_path=None, test_path=None, downsampling=10, ntrain=1024, ntest=100
) -> Tuple[np.ndarray, ...]:
    s = int(((421 - 1) / downsampling) + 1)
    if _is_real_file(train_path) and _is_real_file(test_path):
        def slice_file(path, n):
            data = load_mat(path)
            a = data["coeff"].astype(np.float32)
            u = data["sol"].astype(np.float32)
            return (
                a[:n, ::downsampling, ::downsampling][:, :s, :s][..., None],
                u[:n, ::downsampling, ::downsampling][:, :s, :s][..., None],
            )

        xtr, ytr = slice_file(train_path, ntrain)
        xte, yte = slice_file(test_path, ntest)
        return xtr, ytr, xte, yte
    x, y = synthetic.darcy(n=ntrain + ntest, s=s)
    return x[:ntrain], y[:ntrain], x[-ntest:], y[-ntest:]


def vorticity(
    path=None, ntrain=1000, ntest=200, memory=10, steps=20
) -> Tuple[np.ndarray, ...]:
    if _is_real_file(path):
        flow = load_mat(path)["u"].astype(np.float32)
    else:
        flow = synthetic.vorticity(n=ntrain + ntest, frames=memory + steps)
    return (
        flow[:ntrain, :, :, :memory],
        flow[:ntrain, :, :, memory : memory + steps],
        flow[-ntest:, :, :, :memory],
        flow[-ntest:, :, :, memory : memory + steps],
    )


def elasticity(
    dirpath=None, ntrain=1000, ntest=200, n_points=972
) -> Tuple[np.ndarray, ...]:
    paths = None
    if dirpath is not None:
        paths = {
            k: os.path.join(dirpath, f"Random_UnitCell_{k}_10.npy")
            for k in ("rr", "XY", "sigma")
        }
    if paths and all(_is_real_file(p) for p in paths.values()):
        r = np.transpose(np.load(paths["rr"]), (1, 0))[:, None, :]
        ext = np.transpose(np.load(paths["XY"]), (2, 0, 1)).astype(np.float32)
        rvec = np.repeat(5 * r - 1, ext.shape[1], 1).astype(np.float32)
        X = np.concatenate([ext, rvec], axis=-1)
        Y = np.transpose(np.load(paths["sigma"]), (1, 0))[..., None].astype(
            np.float32
        )
    else:
        X, ext, Y = synthetic.elasticity(n=ntrain + ntest, L=n_points)
    return (
        X[:ntrain],
        ext[:ntrain],
        Y[:ntrain],
        X[-ntest:],
        ext[-ntest:],
        Y[-ntest:],
    )


def naca(
    dirpath=None, ntrain=1000, ntest=200, nx=221, ny=51, n_shape=120
) -> Tuple[np.ndarray, ...]:
    if dirpath is not None and all(
        _is_real_file(os.path.join(dirpath, f))
        for f in (
            "shape_coords.npy",
            "NACA_Cylinder_X.npy",
            "NACA_Cylinder_Y.npy",
            "NACA_Cylinder_Q.npy",
        )
    ):
        coords = np.load(os.path.join(dirpath, "shape_coords.npy")).astype(np.float32)
        vx = np.load(os.path.join(dirpath, "NACA_Cylinder_X.npy"))[..., None]
        vy = np.load(os.path.join(dirpath, "NACA_Cylinder_Y.npy"))[..., None]
        X = np.concatenate([vx, vy], -1).astype(np.float32)
        Y = (
            np.load(os.path.join(dirpath, "NACA_Cylinder_Q.npy"))[:, :4]
            .transpose(0, 2, 3, 1)
            .astype(np.float32)
        )
    else:
        coords, X, Y = synthetic.naca(
            n=ntrain + ntest, n_shape=n_shape, nx=nx, ny=ny
        )
    return (
        coords[:ntrain],
        X[:ntrain],
        Y[:ntrain],
        coords[-ntest:],
        X[-ntest:],
        Y[-ntest:],
    )


def cylinder(
    train_path=None,
    test_path=None,
    vertices_path=None,
    vertices_small_path=None,
    ntrain=1000,
    ntest=100,
    n_points=4390,
    n_latent=896,
    elements_path=None,
):
    """Returns (trainX, trainY, testX, testY, mesh, mesh_ltt, test_traj,
    elements).

    Trajectories (N, 4390, 3, 11) are flattened into 10 one-step pairs per
    trajectory for training (reference: train_cylinder.py:8-16); the raw test
    trajectories are kept for rollout evaluation. ``elements`` is the (M, 3)
    0-based triangle connectivity used for tricontourf field plots
    (reference: train_cylinder.py:67 loads elements.csv, 1-based); when no
    file is available a Delaunay triangulation of the synthetic mesh stands
    in so the plotting path stays exercised in CI.
    """
    if _is_real_file(train_path) and _is_real_file(test_path):
        tr = load_mat(train_path)["trajectories"].astype(np.float32)[:ntrain]
        te = load_mat(test_path)["trajectories"].astype(np.float32)[:ntest]
        mesh = np.genfromtxt(vertices_path, delimiter=",").astype(np.float32)
        mesh_ltt = np.genfromtxt(vertices_small_path, delimiter=",").astype(
            np.float32
        )
    else:
        traj, mesh, mesh_ltt = synthetic.cylinder(
            n_traj=ntrain + ntest, L=n_points, n_small=n_latent
        )
        tr, te = traj[:ntrain], traj[-ntest:]
    if _is_real_file(elements_path):
        elements = (
            np.genfromtxt(elements_path, delimiter=",").astype(np.int32) - 1
        )
    else:
        from scipy.spatial import Delaunay

        elements = Delaunay(np.asarray(mesh)).simplices.astype(np.int32)
    L = tr.shape[1]

    def one_step_pairs(t):
        x = t[:, :, :, :-1].transpose(0, 3, 1, 2).reshape(-1, L, 3)
        y = t[:, :, :, 1:].transpose(0, 3, 1, 2).reshape(-1, L, 3)
        return x, y

    trainX, trainY = one_step_pairs(tr)
    testX, testY = one_step_pairs(te)
    return trainX, trainY, testX, testY, mesh, mesh_ltt, te, elements
