"""Same-session A/B of the batched-kernel softmax-shift variants.

Isolates the cost of the head-independent softmax shift on the band
kernels by monkeypatching kernels.posatt_batched._shifted_dist before
any trace:

  none  — identity (the no-max variant: exact only while s*dmin < ~88,
          dead rows beyond — see _shifted_dist docstring)
  where — kept-masked min (where + min + sub per tile; the first exact
          variant — emulated keep-free via the huge-pad invariant so it
          has the same pass count)
  bare  — bare row min (min + sub per tile; production — relies on
          _PAD_COORD/_TF_BIG padding + the order-statistic mask
          invariant)

Usage: python scripts/tpu_shift_ab.py            # driver, runs all arms
       python scripts/tpu_shift_ab.py CHILD mode # one arm (internal)

Each arm runs in its own process; the driver interleaves arms twice to
expose relay-load drift and writes SHIFT_AB.json.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child(mode: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from position_induced_transformer_tpu.kernels import posatt_batched as pb

    if mode == "none":
        pb._shifted_dist = lambda dist: dist
    elif mode == "where":
        pb._shifted_dist = lambda dist: dist - jnp.min(
            jnp.where(dist < 1e29, dist, jnp.inf), axis=-1, keepdims=True
        )
    elif mode != "bare":
        raise SystemExit(f"unknown mode {mode}")

    sys.path.insert(0, HERE)
    from tpu_checks import timeit_scanned

    from position_induced_transformer_tpu.data import loaders
    from position_induced_transformer_tpu.data.meshes import angular_sort_perm
    from position_induced_transformer_tpu.kernels import (
        BandSpec,
        band_tile_rows,
        position_attention_batched,
        position_attention_batched_tf_coords,
    )
    from position_induced_transformer_tpu.ops.locality import (
        batched_band_starts,
        batched_halfdist_percentile_thresholds,
        batched_topk_thresholds,
    )

    out = {}

    # --- NACA decoder band (bandwidth-bound, H=1) — as check_naca_band
    B, H, D, loc = 20, 1, 128, 0.02
    _, X_tr, _, _, _, _ = loaders.naca(None, B, 2, nx=221, ny=51)
    X = jnp.asarray(X_tr[:B])
    mk = X[:, ::4, ::4, :][:, :56, :13, :].reshape(B, -1, 2)
    mq = X.reshape(B, -1, 2)
    Lq = mq.shape[1]
    thr = batched_topk_thresholds(mq, mk, loc, chunk=4)
    spec = BandSpec(
        *batched_band_starts(mq, mk, thr, band_tile_rows(Lq), chunk=4)
    )
    u0 = jnp.asarray(
        np.random.default_rng(2).random((B, mk.shape[1], D)), jnp.float32
    )
    fn = lambda x, lm: position_attention_batched(mq, mk, lm, x, loc, thr, spec)
    out["naca_band_fwd_us"], _ = timeit_scanned(fn, u0.shape, (H, 1, 1))
    gfn = jax.grad(lambda x, lm: jnp.sum(fn(x, lm)), argnums=(0, 1))
    out["naca_band_bwd_us"], _ = timeit_scanned(
        lambda x, lm: gfn(x, lm)[0], u0.shape, (H, 1, 1)
    )

    # --- elasticity circular band (compute-bound, H=2, D=256) — as
    # check_elasticity_band
    B2, H2, D2, loc2 = 10, 2, 256, 0.02
    _, ext, _, *_ = loaders.elasticity(None, B2, 2)
    perm = angular_sort_perm(ext)
    m = jnp.asarray(np.take_along_axis(np.asarray(ext), perm[..., None], 1))
    L = m.shape[1]
    thr2 = batched_topk_thresholds(m, m, loc2)
    spec2 = BandSpec(
        *batched_band_starts(m, m, thr2, band_tile_rows(L), circular=True)
    )
    v0 = jnp.asarray(np.random.default_rng(2).random((B2, L, D2)), jnp.float32)
    fn2 = lambda x, lm: position_attention_batched(m, m, lm, x, loc2, thr2, spec2)
    out["elasticity_band_fwd_us"], _ = timeit_scanned(fn2, v0.shape, (H2, 1, 1))

    # --- elasticity_tf coordinate kernel band (8 heads, in-op values) —
    # as check_elasticity_tf_coords
    H3, V3, pct = 8, 64, 2.0
    thr3 = batched_halfdist_percentile_thresholds(m, pct)
    band3 = batched_band_starts(
        m, m, 2.0 * thr3, band_tile_rows(L), circular=True
    )
    spec3 = None if band3 is None else BandSpec(*band3)
    x8 = jnp.asarray(
        np.random.default_rng(3).standard_normal((B2, L, H3 * V3)), jnp.float32
    )
    fn3 = lambda v, sc: position_attention_batched_tf_coords(
        m, m, sc.reshape(H3, 1), v, thr3, spec3
    )
    out["tf_coords_band_fwd_us"], _ = timeit_scanned(fn3, x8.shape, (H3, 1, 1))

    print(json.dumps({"mode": mode, **out}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "CHILD":
        child(sys.argv[2])
        raise SystemExit(0)

    results = []
    for rep in range(2):
        for mode in ("bare", "none", "where"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "CHILD", mode],
                capture_output=True, text=True, timeout=3600,
                cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"arm {mode} rep {rep} FAILED:\n{p.stderr[-3000:]}")
                continue
            r = json.loads(line[-1])
            r["rep"] = rep
            results.append(r)
            print(json.dumps(r), flush=True)
    with open(os.path.join(REPO, "SHIFT_AB.json"), "w") as f:
        json.dump({"results": results}, f, indent=1)
    print("wrote SHIFT_AB.json")
