"""Unified jitted training loop for all seven benchmarks.

TPU-first redesign of the reference's seven hand-rolled driver loops
(reference: train_burgers.py:82-114 et al.):

- The **whole epoch** — batch gather, forward, backward, Adam update,
  cosine LR step — is one jitted ``lax.scan`` over a shuffled index matrix.
  The reference crosses host<->device per batch (DataLoader + ``.item()``);
  here the dataset lives on device and the epoch executes as a single XLA
  program.
- The cosine schedule is stepped **per batch** exactly like the reference
  (``scheduler.step()`` after each optimizer step — train_burgers.py:93);
  optax schedules index by update count, which matches.
- Autoregressive rollout training (vorticity, reference:
  train_vorticity.py:118-129) is a ``lax.scan`` over time steps inside the
  loss, with optional per-step rematerialization (``jax.checkpoint``) so
  20-step BPTT fits in HBM.
- Per-sample-mesh benchmarks (elasticity/NACA) pass a ``geom_fn`` that
  rebuilds batched geometry from the batch inside the step.

Losses replicate the reference's argument conventions, including the
vorticity/cylinder drivers' swapped (pred, true) order
(reference: train_vorticity.py:124 ``myloss(out, y[...,t:t+1])``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from position_induced_transformer_tpu.ops.metrics import rel_lp_norm


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _keras_adam(
    schedule, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7
) -> optax.GradientTransformation:
    """``tf.keras.optimizers.Adam`` semantics, exactly.

    keras applies epsilon OUTSIDE the bias correction (reference drivers
    compile with it, e.g. tensorflow/1_InviscidBurgers/train.py:48):

        lr_t = lr(t) * sqrt(1 - b2^(t+1)) / (1 - b1^(t+1))
        p   -= lr_t * m / (sqrt(v) + eps)          # v UNcorrected, eps 1e-7

    whereas torch/optax Adam add eps to the corrected root
    (``m_hat / (sqrt(v_hat) + eps)``, eps 1e-8) — a ~1e-6-relative
    different trajectory. The TF-semantics family trains with this
    transform so its dynamics are pinned bit-for-bit against the numpy
    oracle (tests/tf_numpy_oracle.py ``adam_keras``); the torch family
    keeps ``optax.adam``, which is already torch-identical.

    State reuses :class:`optax.ScaleByAdamState` (count/mu/nu mirror the
    param treedef) so generic state consumers — ``shard_state``'s
    path-matching TP placement, Orbax checkpoints — treat it like Adam.
    """

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, grads
        )
        # keras: decayed lr at the PRE-increment iteration count, bias
        # correction at local_step = iterations + 1
        t = state.count + 1
        tf_ = t.astype(jnp.float32)
        lr_t = (
            schedule(state.count)
            * jnp.sqrt(1.0 - b2**tf_)
            / (1.0 - b1**tf_)
        )
        updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return updates, optax.ScaleByAdamState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_lr_schedule(
    lr: float, total_steps: int, eta_min: float = 0.0, warmup_steps: int = 0
):
    """Per-step cosine decay (the reference schedule, exactly, when
    ``warmup_steps == 0``) with an optional linear 0 -> lr warmup head."""
    cosine = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=total_steps, alpha=eta_min / lr if lr else 0.0
    )
    if not warmup_steps:
        return cosine
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.cosine_decay_schedule(
                init_value=lr,
                decay_steps=max(total_steps - warmup_steps, 1),
                alpha=eta_min / lr if lr else 0.0,
            ),
        ],
        [warmup_steps],
    )


def make_optimizer(
    lr: float, total_steps: int, eta_min: float = 0.0, flavor: str = "adam",
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """Adam + per-step cosine annealing to ``eta_min``
    (reference: train_burgers.py:75-76).

    ``flavor='keras'`` selects the keras epsilon/bias-correction
    formulation (:func:`_keras_adam`) used by the TF-semantics family
    (reference: tensorflow/*/train.py ``tf.keras.optimizers.Adam(
    CosineDecay(lr, epochs * (ntrain // batch)))``).

    ``warmup_steps``: opt-in linear 0 -> lr ramp before the cosine decay
    (which then runs over the remaining steps). 0 reproduces the
    reference schedule bit-exactly; nonzero is a generic stabilizer for
    knife-edge configs (configs.BenchmarkConfig.warmup_steps)."""
    schedule = make_lr_schedule(lr, total_steps, eta_min, warmup_steps)
    if flavor == "keras":
        return _keras_adam(schedule)
    if flavor != "adam":
        raise ValueError(f"unknown optimizer flavor {flavor!r}")
    return optax.adam(learning_rate=schedule)


@dataclasses.dataclass(frozen=True)
class Task:
    """A model bound to its loss/rollout/normalization conventions."""

    model: Any  # flax module with __call__(geom, x)
    loss_p: int = 2
    out_dim: int = 1
    swap_loss_args: bool = False  # vorticity/cylinder pass (pred, true)
    postprocess: Optional[Callable] = None  # e.g. y-normalizer denormalize
    rollout_steps: int = 0
    remat_rollout: "bool | str" = True  # BPTT memory/compute trade-off:
    # True/'full' = jax.checkpoint per rollout step (recompute everything),
    # 'dots' = checkpoint with dots_saveable (keep matmul outputs, recompute
    # elementwise — less bwd recompute for more HBM), False/'none' = store
    # all activations. Env PIT_ROLLOUT_REMAT overrides (measurement:
    # scripts/tpu_epoch_sweep.py).
    geom_fn: Optional[Callable] = None  # batch -> Geometry (per-sample meshes)
    geometry_required_keys: "Optional[tuple]" = None  # batch variables
    # geom_fn cannot do without (deployment infer/serve reads them from
    # the user's input file). None = infer by probing geom_fn, which
    # relies on the convention batch["coords"] for required keys vs
    # batch.get("thr_*") for optionals (evaluate._AccessRecorder);
    # declare the tuple explicitly when deviating from that convention.
    apply_fn: Optional[Callable] = None  # (params, geom, batch) -> out,
    # overriding model.apply(geom, x) — used by the TF-semantics family
    # whose call signature differs (geom, mesh, inputs)
    batch_mean_loss: bool = False  # TF loss convention: mean over batch
    # (reference: tensorflow/1_InviscidBurgers/utils.py:25 reduce_mean)
    keras_adam: bool = False  # train with the keras Adam formulation
    # (make_optimizer flavor='keras') so TF-family dynamics match the
    # reference's tf.keras.optimizers.Adam bit-for-bit — see _keras_adam
    trajectory_loss: bool = False  # TF rollout convention: ONE loss over the
    # whole unrolled trajectory, mean over (batch, steps) of stepwise rel-Lp
    # (reference: tensorflow/4_Vorticity/utils.py:11-21 rel_norm_step used as
    # the keras loss over reccurent_PiT's concatenated prediction) — vs the
    # torch convention of summing per-step losses (train_vorticity.py:118-126)
    param_constraint: Optional[Callable] = None  # params -> params, applied
    # after every optimizer update (keras constraint semantics, reference:
    # tensorflow/6_NACA/utils.py:115 NonNeg on the bandwidth)
    pp_micro: int = 0  # microbatch count of a pipeline-parallel task
    # (parallel/pipeline.pipeline_task); batch sizes fed to the forward
    # must be divisible by it — predict/eval round their batch size DOWN
    # to a multiple (floor pp_micro, runner.round_batch); the padded tail
    # keeps every batch at exactly that size

    def _geometry(self, geom, batch):
        return self.geom_fn(batch) if self.geom_fn is not None else geom

    def _apply(self, params, geom, x):
        if self.apply_fn is not None:
            return self.apply_fn(params, geom, {"x": x})
        return self.model.apply({"params": params}, geom, x)

    def forward(self, params, geom, batch):
        out = self._apply(params, self._geometry(geom, batch), batch["x"])
        if self.postprocess is not None:
            out = self.postprocess(out)
        return out

    def _loss(self, true, pred, weights=None):
        """Batch-summed relative-Lp loss; ``weights`` masks padded eval
        duplicates (the single place the swap/batch-mean conventions live —
        the eval epoch's LOSS reuses it rather than re-deriving them).

        Note: the eval epoch's named METRIC columns (rel_l1/rel_l2/
        rel_max) always use the standard true-denominator convention,
        even for swap benchmarks — the swap is a property of the
        reference's training objective (train_cylinder.py:101 passes
        (out, y)), and its diagnostic prints inherit it incidentally;
        the recorded metrics keep one comparable convention across all
        benchmarks."""
        if self.swap_loss_args:
            true, pred = pred, true
        loss = rel_lp_norm(true, pred, self.out_dim, self.loss_p, weights=weights)
        if self.batch_mean_loss:
            # mean over the VALID samples: a padded eval tail batch masks
            # its duplicates via weights, so the denominator is their count
            denom = true.shape[0] if weights is None else jnp.sum(weights)
            loss = loss / denom
        return loss

    def rollout_preds(self, params, geom, batch):
        """Unrolled autoregressive predictions, gradient-capable: (B, L, steps)
        matching ``batch['y']``'s layout (window fed back each step,
        reference: train_vorticity.py:118-126 /
        tensorflow/4_Vorticity/utils.py:115-121 reccurent_PiT)."""
        g = self._geometry(geom, batch)
        apply = lambda p, xx: self._apply(p, g, xx)
        mode = os.environ.get("PIT_ROLLOUT_REMAT") or self.remat_rollout
        if mode in (True, "full", "1", "true"):
            apply = jax.checkpoint(apply)
        elif mode == "dots":
            apply = jax.checkpoint(
                apply, policy=jax.checkpoint_policies.dots_saveable
            )
        elif mode not in (False, "none", "0", "false"):
            raise ValueError(
                f"unrecognized PIT_ROLLOUT_REMAT/remat_rollout value "
                f"{mode!r}; expected full|dots|none (a typo here would "
                "silently store all BPTT activations)"
            )
        # False/'none': store all activations across the unroll

        def step(window, _):
            out = apply(params, window)
            if self.postprocess is not None:
                # same per-step transform as the eval-time Task.rollout:
                # the fed-back state and the scored outputs must be the
                # postprocessed (e.g. denormalized) ones on BOTH paths,
                # or train and final-eval trajectories silently diverge
                out = self.postprocess(out)
            window = jnp.concatenate([window[..., 1:], out], axis=-1)
            return window, out

        # PIT_ROLLOUT_UNROLL: unroll factor for the rollout scan (amortizes
        # per-step sequencing like the epoch scan's unroll=2; default 1 —
        # measured no win for the BPTT rollout, see BASELINE.md)
        _unroll = int(os.environ.get("PIT_ROLLOUT_UNROLL") or 1)
        _, outs = jax.lax.scan(
            step, batch["x"], None, length=self.rollout_steps,
            unroll=_unroll,
        )
        pred = jnp.moveaxis(outs, 0, -1)  # (B, L, out_dim, steps)
        return pred.reshape(batch["y"].shape)

    def stepwise_rel(self, y, pred, swap: bool = False):
        """Per-sample per-step relative Lp error matrix (B, steps).

        ``swap`` honors the reference drivers that pass (pred, true)
        (train_vorticity.py:124) — it swaps the normalizing denominator.
        ``ops.metrics.rel_norm_step`` is the L2 batch-mean reduction of
        this matrix (kept separate as the TF parity surface); a change to
        the norm arithmetic here must be mirrored there."""
        b, s = y.shape[0], y.shape[-1]
        t = y.reshape(b, -1, s)
        q = pred.reshape(b, -1, s)
        if swap:
            t, q = q, t
        if self.loss_p == 1:
            return jnp.sum(jnp.abs(t - q), axis=1) / jnp.sum(jnp.abs(t), axis=1)
        if self.loss_p == 2:
            return jnp.linalg.norm(t - q, axis=1) / jnp.linalg.norm(t, axis=1)
        p = float(self.loss_p)  # honor the configured norm for any p
        num = jnp.sum(jnp.abs(t - q) ** p, axis=1) ** (1.0 / p)
        den = jnp.sum(jnp.abs(t) ** p, axis=1) ** (1.0 / p)
        return num / den

    def loss_fn(self, params, geom, batch):
        """Batch-summed training loss (divide by n_samples outside)."""
        if self.rollout_steps == 0:
            return self._loss(batch["y"], self.forward(params, geom, batch))

        pred = self.rollout_preds(params, geom, batch)
        rel = self.stepwise_rel(batch["y"], pred, swap=self.swap_loss_args)
        if self.trajectory_loss:
            # ONE rel_norm_step objective over the whole trajectory: mean
            # over steps (and over batch under batch_mean_loss), reference:
            # tensorflow/4_Vorticity/train.py:40 loss=rel_norm_step(steps)
            loss = jnp.sum(jnp.mean(rel, axis=-1))
        else:
            # torch convention: per-step losses summed over the rollout
            # (train_vorticity.py:122-126)
            loss = jnp.sum(rel)
        if self.batch_mean_loss:
            loss = loss / rel.shape[0]
        return loss

    def rollout(self, params, geom, x, steps: int):
        """Autoregressive prediction, returns (B, L, steps)
        (reference eval rollouts: train_vorticity.py:151-161,
        train_cylinder.py:144-153)."""
        g = self._geometry(geom, {"x": x})

        def step(window, _):
            out = self._apply(params, g, window)
            if self.postprocess is not None:
                out = self.postprocess(out)
            if self.rollout_steps or window.shape[-1] > out.shape[-1]:
                window = jnp.concatenate([window[..., 1:], out], axis=-1)
            else:  # one-step residual models (cylinder): feed output back
                window = out
            return window, out

        _, outs = jax.lax.scan(step, x, None, length=steps)
        return jnp.moveaxis(outs, 0, -1)  # (B, L, d, steps) or (B, L, steps)


def _gather(tree, idx):
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=0), tree)


def make_train_epoch(
    task: Task, optimizer: optax.GradientTransformation, mesh=None,
    unroll: int = 2, grad_accum: int = 1,
):
    """Whole-epoch train function: jitted scan over a (n_batches, B) index
    matrix. Donates the TrainState so parameters update in place in HBM.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — each
    batch is sharding-constrained across it (data parallelism; gradient
    all-reduce over ICI is inserted by XLA GSPMD).
    ``unroll``: scan unroll factor; 2 measured ~1.4x epoch throughput at
    the reference step sizes on TPU v5e (scripts/tpu_unroll_experiment.py)
    by amortizing per-step sequencing overhead.
    ``grad_accum``: split every batch into this many sequential
    microbatches and accumulate gradients before the single optimizer
    update — identical optimization trajectory at ~1/grad_accum the peak
    activation memory (only one microbatch's forward/backward is live at
    a time), for configs whose reference batch does not fit HBM (e.g.
    cylinder's batch 200 at higher resolutions). Exact for both loss
    conventions: batch-summed losses/gradients add across microbatches;
    ``batch_mean_loss`` tasks average (equal microbatch sizes make the
    mean of microbatch means the full-batch mean). The per-step ``loss``
    reported matches the non-accumulated convention either way."""
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def _shard(batch):
        if mesh is not None:
            from position_induced_transformer_tpu.parallel.sharding import (
                shard_batch,
            )

            batch = shard_batch(mesh, batch)
        return batch

    def train_epoch(state: TrainState, geom, data, perm):
        def step(carry, idx):
            params, opt_state = carry
            if grad_accum > 1:
                def micro(acc, midx):
                    loss_sum, gacc = acc
                    loss, grads = jax.value_and_grad(task.loss_fn)(
                        params, geom, _shard(_gather(data, midx))
                    )
                    return (
                        loss_sum + loss,
                        jax.tree_util.tree_map(jnp.add, gacc, grads),
                    ), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                (loss, grads), _ = jax.lax.scan(
                    micro, (jnp.zeros(()), zeros), idx.reshape(grad_accum, -1)
                )
                if task.batch_mean_loss:
                    # microbatch losses/grads are means over their own
                    # samples; the full-batch mean is their average
                    loss = loss / grad_accum
                    grads = jax.tree_util.tree_map(
                        lambda g: g / grad_accum, grads
                    )
            else:
                loss, grads = jax.value_and_grad(task.loss_fn)(
                    params, geom, _shard(_gather(data, idx))
                )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if task.param_constraint is not None:
                # keras applies weight constraints after each update
                # (reference: tensorflow/6_NACA/utils.py:115 NonNeg)
                params = task.param_constraint(params)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (state.params, state.opt_state), perm, unroll=unroll
        )
        return (
            TrainState(params, opt_state, state.step + perm.shape[0]),
            jnp.sum(losses),
        )

    return jax.jit(train_epoch, donate_argnums=(0,))


def make_eval_epoch(
    task: Task, metrics: dict[str, Callable] | None = None, mesh=None
):
    """Jitted full-dataset evaluation over a (n_batches, B) index matrix.

    ``metrics`` maps name -> fn(true, pred, weights=...) with batch-summed
    outputs; defaults to the task loss. Returns name -> scalar sum (divide
    by n_test outside, matching the reference's convention). Rollout
    tasks (``task.rollout_steps > 0``) IGNORE ``metrics`` and return the
    fixed stepwise set {loss, rel_l2_step, rel_l2_final} — one unroll
    serves the loss and the reference's per-step diagnostics.

    ``n_valid``: number of real samples covered by ``perm``. The reference
    evaluates every test sample (torch DataLoader without drop_last,
    train_burgers.py:96-106); :func:`eval_permutation` pads the final
    partial batch by repeating the last index, and ``n_valid`` masks the
    padded duplicates out of the metric sums. Default: the dataset size —
    correct for the canonical full-coverage :func:`eval_permutation`
    matrix (padding positions are exactly those >= n), and an all-ones
    no-op for a perm covering a subset (perm.size <= n)."""

    def eval_epoch(state: TrainState, geom, data, perm, n_valid=None):
        if n_valid is None:
            n_valid = jax.tree_util.tree_leaves(data)[0].shape[0]
        # n_valid >= perm.size degrades to all-ones (subset perms); the
        # formula stays arithmetic because n_valid may be a traced arg
        wts = (
            (jnp.arange(perm.size) < n_valid)
            .astype(jnp.float32)
            .reshape(perm.shape)
        )

        def step(_, idx_w):
            idx, w = idx_w
            batch = _gather(data, idx)
            if mesh is not None:
                from position_induced_transformer_tpu.parallel.sharding import (
                    shard_batch,
                )

                batch = shard_batch(mesh, batch)
            if task.rollout_steps:
                # one unroll serves both the loss and the stepwise rel-L2
                # the reference prints every epoch (train_vorticity.py:130-146)
                pred = task.rollout_preds(state.params, geom, batch)
                rel_loss = task.stepwise_rel(
                    batch["y"], pred, swap=task.swap_loss_args
                )
                # batch-summed (the runner divides by n_test), regardless of
                # the train-side batch_mean_loss convention
                if task.trajectory_loss:
                    loss = jnp.sum(w * jnp.mean(rel_loss, axis=-1))
                else:
                    loss = jnp.sum(w[:, None] * rel_loss)
                rel = task.stepwise_rel(batch["y"], pred)  # true denominator
                return None, {
                    "loss": loss,
                    "rel_l2_step": jnp.sum(w * jnp.mean(rel, axis=-1)),
                    "rel_l2_final": jnp.sum(w * rel[:, -1]),
                }
            if metrics is None:
                pred = task.forward(state.params, geom, batch)
                loss = task._loss(batch["y"], pred, weights=w)
                if task.batch_mean_loss:
                    # keep this path batch-summed like every other eval
                    # branch ('divide by n_test outside'): _loss divides
                    # by the valid count for TF-family tasks, so undo it
                    loss = loss * jnp.sum(w)
                return None, {"loss": loss}
            pred = task.forward(state.params, geom, batch)
            return None, {
                name: fn(batch["y"], pred, weights=w)
                for name, fn in metrics.items()
            }

        _, sums = jax.lax.scan(step, None, (perm, wts))
        return jax.tree_util.tree_map(jnp.sum, sums)

    return jax.jit(eval_epoch)


def epoch_permutation(rng: "jax.Array | int", n: int, batch_size: int):
    """Shuffled (n_batches, batch_size) index matrix; drops the remainder
    exactly like ``ntrain // batch`` in the reference iteration count."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    n_batches = n // batch_size
    perm = jax.random.permutation(rng, n)[: n_batches * batch_size]
    return perm.reshape(n_batches, batch_size)


def eval_permutation(n: int, batch_size: int):
    """Sequential (ceil(n/batch), batch) index matrix covering ALL n
    samples; the final partial batch is padded by repeating the last index.
    Pass ``n_valid=n`` to the eval epoch so padded duplicates are masked
    out of the metric sums (the reference's test loader keeps the
    remainder — train_burgers.py:96-106)."""
    n_batches = -(-n // batch_size)
    idx = jnp.minimum(jnp.arange(n_batches * batch_size), n - 1)
    return idx.reshape(n_batches, batch_size)
