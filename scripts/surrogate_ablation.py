"""Operator-learning evidence for the round-5 NACA/elasticity/cylinder
surrogates (VERDICT r4 item 1): show the targets are NOT pointwise-
computable from query-local information, and that the INPUT function
carries the field.

Two evidence levels, written to SURROGATE_ABLATION.json:

1. Data-level (this script, CPU): a strong POINTWISE oracle — ridge
   regression on 256 random-Fourier features of the query-local inputs
   (coordinates; for cylinder also the current-frame values at the point)
   — fit on train samples, scored on held-out samples (rel-L2). The r4
   surrogates were ~exactly representable this way (NACA rel-L1 0.003%);
   the r5 targets must NOT be (large pointwise-oracle error = the field
   genuinely depends on the non-local input function). Also reports the
   input-shuffle BOUND: the error of predicting sample i's target with
   sample perm(i)'s — the inflation a perfectly-trained model shows when
   fed shuffled inputs.

2. Model-level: after a full-budget training run, evaluate the trained
   model twice — true inputs vs inputs shuffled across samples
   (targets/meshes fixed); large inflation = the model actually uses the
   input function (scripts/tpu_full_budget.py records `shuffle_relL2`
   alongside the true metric for these three benchmarks).

Usage: python scripts/surrogate_ablation.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from position_induced_transformer_tpu.data import synthetic

OUT = "/root/repo/SURROGATE_ABLATION.json"


def rel_l2(pred, y):
    """Per-sample per-VARIABLE relative L2 (norm over the mesh axes per
    trailing channel, mean over channels and samples) — the reference's
    RelLpNorm convention (utils.py:59-98), which the benchmark accuracy
    columns report."""
    axes = tuple(range(1, y.ndim - 1))
    num = np.sqrt(((pred - y) ** 2).sum(axes))
    den = np.sqrt((y**2).sum(axes)) + 1e-30
    return float((num / den).mean())


def ridge_rff(feats_tr, y_tr, n_feat=256, lam=1e-6, seed=0):
    """Pointwise ridge on random-Fourier features -> predict closure.
    feats: (N, d) rows are individual points pooled across samples;
    y: (N, k)."""
    rng = np.random.default_rng(seed)
    d = feats_tr.shape[1]
    scale = feats_tr.std(0, keepdims=True) + 1e-9
    mu = feats_tr.mean(0, keepdims=True)
    W = rng.standard_normal((d, n_feat)) * 2.0
    b = rng.uniform(0, 2 * np.pi, n_feat)

    def phi(f):
        z = (f - mu) / scale
        return np.concatenate(
            [np.cos(z @ W + b), z, np.ones((f.shape[0], 1))], axis=1
        )

    P = phi(feats_tr)
    A = P.T @ P + lam * P.shape[0] * np.eye(P.shape[1])
    coef = np.linalg.solve(A, P.T @ y_tr)
    return lambda f: phi(f) @ coef


def eval_naca(n=400, ntr=300):
    coords, X, Y = synthetic.naca(n=n, nx=111, ny=26)
    # pointwise oracle: query C-grid coordinate only (the r4 target was an
    # exact function of it)
    f = X.reshape(n, -1, 2)
    y = Y.reshape(n, -1, 4)
    sub = np.random.default_rng(1).choice(f.shape[1], 600, replace=False)
    ftr = f[:ntr][:, sub].reshape(-1, 2)
    ytr = y[:ntr][:, sub].reshape(-1, 4)
    predict = ridge_rff(ftr, ytr)
    pred_te = predict(f[ntr:].reshape(-1, 2)).reshape(n - ntr, -1, 4)
    perm = np.roll(np.arange(n - ntr), 1)
    return {
        "pointwise_coords_oracle_relL2": rel_l2(pred_te, y[ntr:]),
        "input_shuffle_bound_relL2": rel_l2(y[ntr:][perm], y[ntr:]),
    }


def eval_elasticity(n=400, ntr=300):
    X, ext, Y = synthetic.elasticity(n=n, L=486)
    perm = np.roll(np.arange(n - ntr), 1)
    out = {}
    # coords-only pointwise oracle (the r4 target was ~this)
    predict = ridge_rff(ext[:ntr].reshape(-1, 2), Y[:ntr].reshape(-1, 1))
    pred = predict(ext[ntr:].reshape(-1, 2)).reshape(n - ntr, -1, 1)
    out["pointwise_coords_oracle_relL2"] = rel_l2(pred, Y[ntr:])
    # rvec-shuffle bound: the void shape owns the field
    out["input_shuffle_bound_relL2"] = rel_l2(Y[ntr:][perm], Y[ntr:])
    return out


def eval_cylinder(n=200, ntr=150):
    traj, verts, _ = synthetic.cylinder(n_traj=n, L=1000)
    # pointwise one-step oracle: (x, y, u, v, p)_t -> (u, v, p)_{t+1}
    xt = traj[..., 0]  # (n, L, 3)
    yt = traj[..., 1]
    vb = np.broadcast_to(verts[None], (n,) + verts.shape)
    feats = np.concatenate([vb, xt], axis=-1)  # (n, L, 5)
    predict = ridge_rff(
        feats[:ntr].reshape(-1, 5), yt[:ntr].reshape(-1, 3)
    )
    pred = predict(feats[ntr:].reshape(-1, 5)).reshape(n - ntr, -1, 3)
    perm = np.roll(np.arange(n - ntr), 1)
    return {
        "pointwise_local_oracle_relL2": rel_l2(pred, yt[ntr:]),
        "input_shuffle_bound_relL2": rel_l2(yt[ntr:][perm], yt[ntr:]),
    }


def main():
    results = {}
    try:
        with open(OUT) as f:
            results = json.load(f)
    except FileNotFoundError:
        pass
    for name, fn in (
        ("naca", eval_naca),
        ("elasticity", eval_elasticity),
        ("cylinder", eval_cylinder),
    ):
        r = fn()
        print(name, json.dumps(r))
        results[name] = r
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
