"""Micro-profile of the NACA/elasticity in-step geometry + attention costs
on the TPU chip: which part of the per-sample-mesh train step dominates?

Timing follows the tunnel rules (CLAUDE.md): every timed call sees fresh
on-device-generated inputs (the relay memoizes identical executions), work
is amortized over a jitted lax.scan to bury the ~ms dispatch floor, a
generation-only baseline is subtracted, and completion is forced with a
scalar D2H read (block_until_ready does not reliably block here).
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


def timed(name, fn, shapes, iters=8, rounds=3):
    """Median per-iteration seconds of fn(*arrays) over a jitted scan with
    fresh uniform inputs per iteration; generation baseline subtracted."""
    if not isinstance(shapes, (list, tuple)) or isinstance(shapes[0], int):
        shapes = (shapes,)

    def gen(key):
        keys = jax.random.split(key, len(shapes))
        return tuple(
            jax.random.uniform(k, (iters,) + tuple(s))
            for k, s in zip(keys, shapes)
        )

    @jax.jit
    def run(seed):
        xs = gen(jax.random.PRNGKey(seed))
        def body(acc, x):
            return acc + jnp.sum(fn(*x)), None
        return jax.lax.scan(body, 0.0, xs)[0]

    @jax.jit
    def base(seed):
        xs = gen(jax.random.PRNGKey(seed))
        return sum(jnp.sum(x) for x in xs)

    float(run(0)); float(base(0))  # compile + settle
    runs, bases = [], []
    for r in range(rounds):
        t0 = time.perf_counter(); float(base(r + 1))
        bases.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(r + 1))
        runs.append(time.perf_counter() - t0)
    dt = max(
        (float(np.median(runs)) - float(np.median(bases))) / iters, 1e-9
    )
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    B, Lo, Li = 20, 11271, 728
    c = int(0.02 * (Li - 1)) + 1  # 15

    from position_induced_transformer_tpu.ops.distances import pairwise_sq_dist

    timed(
        "pairwise dist (B,Lo,Li)",
        lambda a, b: pairwise_sq_dist(a, b),
        [(B, Lo, 2), (B, Li, 2)],
    )
    timed(
        "quantile thr",
        lambda d: jnp.quantile(d, 0.02, axis=-1, keepdims=True),
        (B, Lo, Li),
    )
    timed(
        f"top_k c={c}",
        lambda d: -jax.lax.top_k(-d, c)[0][..., -1:],
        (B, Lo, Li),
    )
    try:
        timed(
            f"approx_min_k c={c}",
            lambda d: jax.lax.approx_min_k(d, c, recall_target=0.99)[0][..., -1:],
            (B, Lo, Li),
        )
    except Exception as e:
        print("approx_min_k failed:", e)

    def iter_min(d):
        thr = jnp.full(d.shape[:-1] + (1,), -jnp.inf, d.dtype)
        for _ in range(c):
            thr = jnp.min(jnp.where(d > thr, d, jnp.inf), axis=-1, keepdims=True)
        return thr

    timed(f"iterative-min c={c}", iter_min, (B, Lo, Li))

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

    state, loss = train_epoch(
        state, problem.geom, problem.train_data,
        epoch_permutation(0, 40, cfg.batch_size),
    )
    float(loss)
    t0 = time.perf_counter()
    N = 5
    n_steps = 0
    for ep in range(1, 1 + N):
        perm = epoch_permutation(ep, 40, cfg.batch_size)  # fresh shuffle
        n_steps += perm.shape[0]
        state, loss = train_epoch(state, problem.geom, problem.train_data, perm)
    float(loss)  # scalar D2H read = the reliable pipeline drain
    per_step = (time.perf_counter() - t0) / n_steps
    print(f"{'naca full train step':42s} {per_step*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
