"""Micro-profile of the NACA/elasticity in-step geometry + attention costs
on the TPU chip: which part of the per-sample-mesh train step dominates?

Times (whole-array, amortized over inner lax.scan iterations to subtract
the ~1.6 ms dispatch floor): threshold candidates (quantile / top_k /
approx_min_k / iterative-min), distance build, and the full loss+grad.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)


def timed(name, fn, *args, iters=8):
    f = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (fn(*a), None), fn(*args), None, length=iters
    )[0]) if False else jax.jit(fn)
    # simple: call once to compile, then time N dispatches
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    B, Lo, Li = 20, 11271, 728
    dist = jnp.asarray(rng.random((B, Lo, Li)), jnp.float32)
    mesh_out = jnp.asarray(rng.random((B, Lo, 2)), jnp.float32)
    mesh_ltt = jnp.asarray(rng.random((B, Li, 2)), jnp.float32)
    c = int(0.02 * (Li - 1)) + 1  # 15

    from position_induced_transformer_tpu.ops.distances import pairwise_sq_dist

    timed("pairwise dist (B,Lo,Li)", lambda a, b: pairwise_sq_dist(a, b), mesh_out, mesh_ltt)
    timed("quantile thr", lambda d: jnp.quantile(d, 0.02, axis=-1, keepdims=True), dist)
    timed(f"top_k c={c}", lambda d: -jax.lax.top_k(-d, c)[0][..., -1:], dist)
    try:
        timed(
            f"approx_min_k c={c}",
            lambda d: jax.lax.approx_min_k(d, c, recall_target=0.99)[0][..., -1:],
            dist,
        )
    except Exception as e:
        print("approx_min_k failed:", e)

    def iter_min(d):
        thr = jnp.full(d.shape[:-1] + (1,), -jnp.inf, d.dtype)
        for _ in range(c):
            m = jnp.min(jnp.where(d > thr, d, jnp.inf), axis=-1, keepdims=True)
            thr = m
        return thr

    timed(f"iterative-min c={c}", iter_min, dist)

    # full train step cost for reference
    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import benchmarks, runner
    from position_induced_transformer_tpu.train.loop import (
        epoch_permutation, make_optimizer, make_train_epoch,
    )

    cfg = configs.get("naca")
    problem = benchmarks.setup(cfg, ntrain=40, ntest=20)
    optimizer = make_optimizer(cfg.lr, 100)
    state = runner.init_state(problem, optimizer, seed=0)
    train_epoch = make_train_epoch(problem.task, optimizer)
    perm = epoch_permutation(0, 40, cfg.batch_size)  # 2 steps/epoch

    state, _ = jax.block_until_ready(
        train_epoch(state, problem.geom, problem.train_data, perm)
    )
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        state, loss = train_epoch(state, problem.geom, problem.train_data, perm)
    jax.block_until_ready(loss)
    per_step = (time.perf_counter() - t0) / (N * perm.shape[0])
    print(f"{'naca full train step':42s} {per_step*1e3:9.2f} ms")

    # geometry-only cost inside jit
    batch = jax.tree_util.tree_map(lambda a: a[: cfg.batch_size], problem.train_data)
    timed(
        "naca geom_fn (dist + topk thr)",
        lambda b: jax.tree_util.tree_map(
            lambda x: x, problem.task.geom_fn(b)
        ).dist_up.sum(),
        batch,
    )

    # loss+grad with geometry hoisted OUT (precomputed geom) for comparison
    geom = problem.task.geom_fn(batch)
    loss_nogeom = lambda p, g, b: problem.task.model.apply(
        {"params": p}, g, b["x"]
    ).sum()
    timed(
        "naca fwd only, geom precomputed",
        lambda p, g, b: loss_nogeom(p, g, b),
        state.params, geom, batch,
    )
    timed(
        "naca fwd+bwd, geom precomputed",
        jax.grad(loss_nogeom),
        state.params, geom, batch,
    )


if __name__ == "__main__":
    main()
