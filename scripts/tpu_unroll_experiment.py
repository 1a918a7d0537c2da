"""Measure the effect of lax.scan unrolling on whole-epoch throughput.

Small PiT steps leave the TPU scalar core dominating between matmuls;
unrolling the epoch scan amortizes per-step control overhead at the cost
of program size. Run on the TPU chip; informs the `unroll` default in
train/loop.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import optax

from position_induced_transformer_tpu import configs
from position_induced_transformer_tpu.train import benchmarks, runner
from position_induced_transformer_tpu.train.loop import (
    TrainState,
    _gather,
    epoch_permutation,
    make_optimizer,
)


def main():
    cfg = configs.BURGERS
    problem = benchmarks.setup(cfg, ntrain=256, ntest=8)
    opt = make_optimizer(cfg.lr, 16000)
    task = problem.task

    for unroll in (1, 2, 4, 8):
        def train_epoch(state, geom, data, perm):
            def step(carry, idx):
                params, opt_state = carry
                batch = _gather(data, idx)
                loss, grads = jax.value_and_grad(task.loss_fn)(
                    params, geom, batch
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (p, o), losses = jax.lax.scan(
                step, (state.params, state.opt_state), perm, unroll=unroll
            )
            return TrainState(p, o, state.step + perm.shape[0]), losses.sum()

        fn = jax.jit(train_epoch, donate_argnums=(0,))
        state = runner.init_state(problem, opt, 0)
        state, _ = jax.block_until_ready(
            fn(state, problem.geom, problem.train_data, epoch_permutation(0, 256, 8))
        )
        t0 = time.perf_counter()
        for i in range(5):
            state, loss = fn(
                state, problem.geom, problem.train_data,
                epoch_permutation(i + 1, 256, 8),
            )
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {"unroll": unroll, "steps_per_sec": round(160 / dt, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
