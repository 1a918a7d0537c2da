"""On-TPU validation + micro-benchmarks for the fused posatt kernel.

Run on the attached TPU chip (default backend). Compares the compiled
Pallas kernel against the XLA oracle and times both at the reference's hot
shapes, reporting effective HBM bandwidth and FLOP rate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from position_induced_transformer_tpu.kernels import position_attention_fixed
from position_induced_transformer_tpu.ops import euclidean_sq, position_attention
from position_induced_transformer_tpu.ops.locality import quantile_threshold


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def check(L_out, L_in, B, H, D, loc, label):
    rng = np.random.default_rng(0)
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    thr = quantile_threshold(dist, loc) if loc < 1.0 else None
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    fused1 = jax.jit(
        lambda d, l, x: position_attention_fixed(d, l, x, loc, thr=thr, version=1)
    )
    fused2 = jax.jit(
        lambda d, l, x: position_attention_fixed(d, l, x, loc, thr=thr, version=2)
    )
    fused2b = jax.jit(
        lambda d, l, x: position_attention_fixed(
            d, l, x, loc, thr=thr, version=2, mxu_bf16=True
        )
    )
    oracle = jax.jit(lambda d, l, x: position_attention(d, l, x, loc))

    want = jax.block_until_ready(oracle(dist, lmda, u))
    errs = {}
    for name, fn in (("v1", fused1), ("v2", fused2)):
        got = jax.block_until_ready(fn(dist, lmda, u))
        errs[name] = float(jnp.max(jnp.abs(got - want)))

    t1 = timeit(fused1, dist, lmda, u)
    t2 = timeit(fused2, dist, lmda, u)
    t2b = timeit(fused2b, dist, lmda, u)
    t_oracle = timeit(oracle, dist, lmda, u)
    flops = 2 * H * B * L_out * L_in * D
    print(
        json.dumps(
            {
                "case": label,
                "err_v1": errs["v1"],
                "err_v2": errs["v2"],
                "v1_us": round(t1 * 1e6, 1),
                "v2_us": round(t2 * 1e6, 1),
                "xla_us": round(t_oracle * 1e6, 1),
                "v2_speedup_vs_xla": round(t_oracle / t2, 2),
                "v2_gflops": round(flops / t2 / 1e9, 1),
                "v2bf16_us": round(t2b * 1e6, 1),
                "v2bf16_gflops": round(flops / t2b / 1e9, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # reference hot shapes
    check(256, 256, 8, 2, 64, 1.0, "burgers processor (global)")
    check(256, 1024, 8, 2, 2, 0.02, "burgers encoder cross")
    check(1024, 256, 8, 2, 64, 0.02, "burgers decoder cross")
    check(256, 256, 20, 2, 256, 1.0, "vorticity processor")
    check(4096, 256, 20, 2, 256, 0.02, "vorticity decoder")
    check(177241 // 4, 256, 4, 2, 64, 0.02, "darcy ZSSR decoder slab")
