"""Dataset loaders for the seven reference benchmarks.

Numpy-only I/O (scipy ``.mat`` with an HDF5 fallback for MATLAB v7.3 files,
``.npy``, CSV meshes) mirroring the reference loaders' shapes and
preprocessing (reference: train_burgers.py:7-17, train_sod.py:7-21,
train_darcy.py:7-23, train_vorticity.py:7-21, train_elasticity.py:7-16,
train_naca.py:7-15, train_cylinder.py:8-16). Every loader falls back to the
synthetic generators when the real files are absent (the bundled data are
git-LFS stubs — SURVEY.md §2.3), so end-to-end training always runs; a
fallback from an EXPLICITLY supplied path warns, so a typo'd --data-path
cannot silently report synthetic losses as real-benchmark results.

Returned arrays are host numpy float32; device placement happens once in the
training loop, not per batch.
"""

from __future__ import annotations

import os
import warnings
from typing import Tuple

import numpy as np

from position_induced_transformer_tpu.data import synthetic

_LFS_POINTER = b"version https://git-lfs"


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
        skipped = []
        with h5py.File(path, "r") as f:
            for k, v in f.items():
                if isinstance(v, h5py.Dataset):
                    # MATLAB HDF5 stores column-major; transpose to match loadmat
                    out[k] = np.array(v).T
                elif not k.startswith("#"):
                    skipped.append(k)
        if skipped:
            warnings.warn(
                f"{path}: skipped non-array HDF5 entries {skipped} "
                "(MATLAB structs/cells are not supported by this loader)",
                stacklevel=2,
            )
        return out


def _is_real_file(path) -> bool:
    """A usable data file: exists and is not a git-LFS pointer stub.

    Stub detection reads the LFS pointer signature rather than relying on
    a size threshold alone, so legitimately small real files (e.g. a tiny
    elements.csv) are not silently rejected."""
    if path is None or not os.path.exists(path):
        return False
    try:
        with open(path, "rb") as f:
            head = f.read(len(_LFS_POINTER))
    except OSError:
        return False
    return not head.startswith(_LFS_POINTER)


def _warn_fallback(requested, name: str):
    """Explicitly supplied data path(s) unusable -> warn before the
    synthetic fallback. ``requested`` is the user's path argument (a path
    or dir; None means 'use synthetic', which stays silent)."""
    if requested is not None:
        warnings.warn(
            f"{name}: supplied data path {requested!r} is missing or a "
            "git-LFS stub; falling back to SYNTHETIC data — results are "
            "not real-benchmark numbers",
            stacklevel=3,
        )


def _split(arrays, n: int, ntrain: int, ntest: int, name: str):
    """Head-``ntrain`` / tail-``ntest`` split with validation: the
    reference slices x[:ntrain] / x[-ntest:] (train_burgers.py:13-16),
    which on an undersized file silently truncates the train split and
    OVERLAPS it with the test split (leakage) — and ``[-0:]`` would
    return everything. Raise instead."""
    if ntest < 1 or ntrain < 1:
        raise ValueError(f"{name}: ntrain/ntest must be >= 1")
    if n < ntrain + ntest:
        raise ValueError(
            f"{name}: dataset has {n} samples but ntrain+ntest = "
            f"{ntrain + ntest}; pass smaller --ntrain/--ntest"
        )
    out = []
    for a in arrays:
        out.append(a[:ntrain])
        out.append(a[-ntest:])
    return tuple(out)


def burgers(path=None, ntrain=1024, ntest=128, L=1024) -> Tuple[np.ndarray, ...]:
    if _is_real_file(path):
        data = load_mat(path)
        x = data["x"].astype(np.float32)[..., None]
        y = data["y"].astype(np.float32)[..., None]
    else:
        _warn_fallback(path, "burgers")
        x, y = synthetic.burgers(n=ntrain + ntest, L=L)
    x_tr, x_te, y_tr, y_te = _split((x, y), x.shape[0], ntrain, ntest, "burgers")
    return x_tr, y_tr, x_te, y_te


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
        _warn_fallback(path, "sod")
        x, y = synthetic.sod(n=ntrain + ntest, L=L)
    x_tr, x_te, y_tr, y_te = _split((x, y), x.shape[0], ntrain, ntest, "sod")
    return x_tr, y_tr, x_te, y_te


def darcy(
    train_path=None, test_path=None, downsampling=10, ntrain=1024, ntest=100
) -> Tuple[np.ndarray, ...]:
    s = int(((421 - 1) / downsampling) + 1)
    if _is_real_file(train_path) and _is_real_file(test_path):
        def slice_file(path, n, what):
            data = load_mat(path)
            a = data["coeff"].astype(np.float32)
            if a.shape[0] < n:
                raise ValueError(
                    f"darcy {what} file has {a.shape[0]} samples, "
                    f"requested {n}"
                )
            u = data["sol"].astype(np.float32)
            return (
                a[:n, ::downsampling, ::downsampling][:, :s, :s][..., None],
                u[:n, ::downsampling, ::downsampling][:, :s, :s][..., None],
            )

        xtr, ytr = slice_file(train_path, ntrain, "train")
        xte, yte = slice_file(test_path, ntest, "test")
        return xtr, ytr, xte, yte
    _warn_fallback(train_path or test_path, "darcy")
    x, y = synthetic.darcy(n=ntrain + ntest, s=s)
    x_tr, x_te, y_tr, y_te = _split((x, y), x.shape[0], ntrain, ntest, "darcy")
    return x_tr, y_tr, x_te, y_te


def vorticity(
    path=None, ntrain=1000, ntest=200, memory=10, steps=20
) -> Tuple[np.ndarray, ...]:
    if _is_real_file(path):
        flow = load_mat(path)["u"].astype(np.float32)
        if flow.shape[-1] < memory + steps:
            raise ValueError(
                f"vorticity file has {flow.shape[-1]} frames; the "
                f"configured memory+rollout needs {memory + steps} — "
                "targets would be silently truncated"
            )
    else:
        _warn_fallback(path, "vorticity")
        flow = synthetic.vorticity(n=ntrain + ntest, frames=memory + steps)
    (flow_tr, flow_te) = _split(
        (flow,), flow.shape[0], ntrain, ntest, "vorticity"
    )
    return (
        flow_tr[:, :, :, :memory],
        flow_tr[:, :, :, memory : memory + steps],
        flow_te[:, :, :, :memory],
        flow_te[:, :, :, memory : memory + steps],
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
        # cast BEFORE the (N, 972, 42) repeat: float64 would double the
        # transient host allocation (~650 MB at the real 2000 samples)
        r = np.transpose(np.load(paths["rr"]), (1, 0))[:, None, :].astype(
            np.float32
        )
        ext = np.transpose(np.load(paths["XY"]), (2, 0, 1)).astype(np.float32)
        rvec = np.repeat(5 * r - 1, ext.shape[1], 1)
        X = np.concatenate([ext, rvec], axis=-1)
        Y = np.transpose(np.load(paths["sigma"]), (1, 0))[..., None].astype(
            np.float32
        )
    else:
        _warn_fallback(dirpath, "elasticity")
        X, ext, Y = synthetic.elasticity(n=ntrain + ntest, L=n_points)
    X_tr, X_te, ext_tr, ext_te, Y_tr, Y_te = _split(
        (X, ext, Y), X.shape[0], ntrain, ntest, "elasticity"
    )
    return X_tr, ext_tr, Y_tr, X_te, ext_te, Y_te


def naca(
    dirpath=None, ntrain=1000, ntest=200, nx=221, ny=51, n_shape=120,
    mach=False,
) -> Tuple[np.ndarray, ...]:
    """``mach=False``: targets are Q channels 0-3, the torch-family
    convention (reference: train_naca.py). ``mach=True``: the single Mach
    field Q[:, 4] — the TF reference's target
    (tensorflow/6_NACA/utils.py:48 ``Q.npy[:,4,...][...,newaxis]``);
    the synthetic fallback stands in with its first channel."""
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
        Q = np.load(os.path.join(dirpath, "NACA_Cylinder_Q.npy"))
        if mach:
            Y = Q[:, 4][..., None].astype(np.float32)
        else:
            Y = Q[:, :4].transpose(0, 2, 3, 1).astype(np.float32)
    else:
        _warn_fallback(dirpath, "naca")
        coords, X, Y = synthetic.naca(
            n=ntrain + ntest, n_shape=n_shape, nx=nx, ny=ny
        )
        if mach:
            Y = Y[..., :1]
    c_tr, c_te, X_tr, X_te, Y_tr, Y_te = _split(
        (coords, X, Y), X.shape[0], ntrain, ntest, "naca"
    )
    return c_tr, X_tr, Y_tr, c_te, X_te, Y_te


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
    real = (
        _is_real_file(train_path)
        and _is_real_file(test_path)
        and _is_real_file(vertices_path)
        and _is_real_file(vertices_small_path)
    )
    if real:
        tr = load_mat(train_path)["trajectories"].astype(np.float32)[:ntrain]
        te = load_mat(test_path)["trajectories"].astype(np.float32)[:ntest]
        if tr.shape[0] < ntrain or te.shape[0] < ntest:
            raise ValueError(
                f"cylinder files have {tr.shape[0]}/{te.shape[0]} "
                f"trajectories, requested {ntrain}/{ntest}"
            )
        mesh = np.genfromtxt(vertices_path, delimiter=",").astype(np.float32)
        mesh_ltt = np.genfromtxt(vertices_small_path, delimiter=",").astype(
            np.float32
        )
    else:
        _warn_fallback(train_path or test_path, "cylinder")
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
