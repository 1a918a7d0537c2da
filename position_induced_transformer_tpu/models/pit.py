"""Position-induced Transformer — torch-semantics model family, in flax.

Capability parity with the reference model zoo (reference: pit.py:73-298
``pit``/``pit_fixed``/``pit_periodic1d``/``pit_periodic2d`` and the
per-benchmark subclasses in the seven train scripts), re-designed TPU-first:

- One ``PiT`` module covers every variant. Mesh metric and fixed-vs-batched
  handling live in the :class:`~..models.geometry.Geometry` pytree that is
  passed to ``__call__`` — the module itself is resolution-independent, which
  is the invariant that makes zero-shot super-resolution work (params carry
  no L dependence; re-binding a trained model to a finer mesh is just
  building a new Geometry).
- Composition flags absorb the per-benchmark subclasses: ``concat_mesh``
  (reference: train_burgers.py:45), ``use_instance_norm``
  (reference: train_vorticity.py:43,56-59), ``residual_output``
  (reference: train_cylinder.py:52).
- Initializations reproduce the reference exactly (kaiming-normal MLP
  weights, torch-default uniform biases, U[0,1) bandwidths) so weight
  transplants between the two frameworks are loss-preserving.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from position_induced_transformer_tpu.models.geometry import Geometry
from position_induced_transformer_tpu.ops.initializers import (
    kaiming_normal,
    torch_linear_bias,
    uniform01,
)
from position_induced_transformer_tpu.ops.normalization import instance_norm
from position_induced_transformer_tpu.ops.posatt import position_attention


class TorchLinear(nn.Module):
    """Dense layer with torch ``nn.Linear`` parameterization.

    Kernel is stored (fan_in, features); weight init kaiming-normal
    (reference: pit.py:18-19), bias init U(+-1/sqrt(fan_in)) (torch default,
    which the reference keeps).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", kaiming_normal, (fan_in, self.features))
        bias = self.param("bias", torch_linear_bias(fan_in), (self.features,))
        # mixed precision: params are stored f32 (master weights; Adam
        # moments stay f32) and cast to the activations' dtype at use —
        # with f32 activations (default + all parity tests) the casts are
        # no-ops. bf16 operands ride the same single MXU pass f32-default
        # matmuls already use; the win is the halved activation traffic.
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class KaimingMLP(nn.Module):
    """Two-layer MLP with exact (erf) GELU between (reference: pit.py:13-26)."""

    hidden: int
    features: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden, name="mlp1")(x)
        x = nn.gelu(x, approximate=False)
        return TorchLinear(self.features, name="mlp2")(x)


def _dispatch_posatt(
    dist, lmda, inputs, locality, thr, fused: bool, mesh_q=None, mesh_k=None,
    band=None,
):
    """Route to a fused Pallas kernel or the XLA path.

    Fixed meshes (``dist.ndim == 2``): XLA wins EVERY reference shape
    end-to-end on TPU v5e, including ZSSR-scale decode — its 3-pass
    softmax fusion streams the distance matrix without materializing the
    (H, L_out, L_in) attention tensor, exactly what the hand-written
    kernel does, at a higher achieved bandwidth. Measured (2026-08-16,
    post timing-fix): training epochs 0.53-1.0x with the fused kernel
    forced on (FUSED_SWEEP.json, scripts/tpu_fused_experiment.py); full
    421^2 ZSSR forward 7.6 ms XLA vs 10.3 ms fused / 10.0 ms
    decoder-only-fused (B=4). The head-folded v3 kernel narrowed but did
    not close the gap (kernels/posatt_pallas.py). So `auto` uses XLA for
    all fixed-mesh shapes; the kernels stay available behind
    ``PIT_FUSED_MODE=always`` (+ version flag) for other hardware
    generations.

    Lazy batched meshes (``dist is None``, per-sample point clouds): the
    batched kernel computes distances + locality threshold + softmax +
    contraction tile-resident from raw coordinates and is the measured
    production win (NACA 2.75x, elasticity 1.37x — BASELINE.md);
    non-TPU backends fall back to building the distances in XLA.

    ``PIT_FUSED_MODE`` env var overrides the heuristics: 'always' forces
    the kernels, 'never' disables them (measurement harness:
    scripts/tpu_fused_experiment.py).
    """
    import os

    import jax

    mode = os.environ.get("PIT_FUSED_MODE", "auto")
    if mode not in ("auto", "always", "never"):
        raise ValueError(
            f"unrecognized PIT_FUSED_MODE {mode!r}; expected "
            "auto|always|never (a typo here would silently measure the "
            "wrong dispatch path)"
        )
    on_tpu = jax.default_backend() == "tpu"
    # the Pallas kernels are f32 programs; under mixed precision
    # (models/pit.py compute_dtype) round-trip the values through f32 at
    # the kernel boundary and hand back the activations' dtype
    cdt = inputs.dtype
    if dist is None:  # lazy batched geometry: raw per-sample coordinates
        # 'always' is the operator override: it forces the kernel even
        # when the module's fused flag is False (direct PiT construction
        # defaults fused_kernel=False, unlike configs.ModelConfig)
        if (mode == "always" or (fused and mode != "never")) and on_tpu:
            # shape-aware dispatch: for SMALL batched ops the (B, Lq, Lk)
            # intermediates XLA materializes are a few MB and its fusion
            # beats the kernel's per-grid-cell overhead (NACA encoder
            # cross, 20x728x120: 16 us XLA vs 68 us fused upper bounds,
            # ROOFLINE r3) — route those to XLA and keep the kernel for
            # the large shapes where never materializing the tensors is
            # the win (elasticity processor 10x972x972 = 9.4M elements:
            # fused 186 us vs XLA 280 us; NACA decoder 226M: 8.4x).
            # Threshold between the measured points; 'always' still
            # forces the kernel everywhere. Override for measurement:
            # PIT_BATCHED_XLA_MAX_ELEMS (0 disables the XLA routing).
            max_elems = int(
                float(os.environ.get("PIT_BATCHED_XLA_MAX_ELEMS", 4e6))
            )
            small = (
                mode != "always"
                and inputs.shape[0]
                * mesh_q.shape[-2]
                * (-(-mesh_k.shape[-2] // 128) * 128)
                <= max_elems
            )
            if not small:
                from position_induced_transformer_tpu.kernels import (
                    position_attention_batched,
                )

                if locality < 1.0 and thr is None:
                    # No setup-precomputed thresholds (lazy Geometry from
                    # a user problem): compute the ROBUST wide-gap
                    # thresholds here rather than letting the kernel fall
                    # back to its in-kernel distinct-value masked-min
                    # extraction — that extraction is exactly the
                    # tie-fragile mechanism robust_topk_threshold removes,
                    # and using it only on this path would make the TPU
                    # kernel's kept sets silently differ from every other
                    # dispatch path on tie-heavy meshes. Costs a full
                    # per-step distance + top_k pass; per-sample meshes
                    # are constant across training, so setups should
                    # hoist (ops/locality.batched_topk_thresholds) — all
                    # shipped benchmark setups do.
                    from position_induced_transformer_tpu.ops.distances import (
                        pairwise_sq_dist,
                    )
                    from position_induced_transformer_tpu.ops.locality import (
                        robust_topk_threshold,
                    )

                    thr = robust_topk_threshold(
                        pairwise_sq_dist(mesh_q, mesh_k), locality
                    )
                return position_attention_batched(
                    mesh_q, mesh_k, lmda, inputs.astype(jnp.float32),
                    locality, thr, band,
                ).astype(cdt)
        from position_induced_transformer_tpu.ops.distances import (
            pairwise_sq_dist,
        )
        from position_induced_transformer_tpu.ops.locality import (
            robust_topk_threshold,
        )

        dist = pairwise_sq_dist(mesh_q, mesh_k)
        if locality < 1.0 and thr is None:
            # per-step threshold; precomputed Geometry.thr_* skip this
            # (the per-sample meshes are constant — setups hoist where it
            # pays, ops/locality.batched_topk_thresholds). The robust
            # wide-gap variant keeps this path's kept sets identical to
            # the setup-precomputed ones on tie-heavy grids. Cost note:
            # robust needs ORDER STATISTICS around the cut, so it always
            # pays lax.top_k (a full bitonic sort on TPU) — the old c-pass
            # masked-min fast path extracts DISTINCT values, which is
            # exactly the tie-fragile indexing robustness removes, and
            # recovering multiplicities costs a count reduction per pass
            # that erases the saving. Accepted: the hot per-sample-mesh
            # configs take the batched Pallas route above, and the
            # elasticity live path (L=972) measured +4% epoch time with
            # the r5 sweep refresh.
            thr = robust_topk_threshold(dist, locality)
    elif mode == "always" and dist.ndim == 2 and on_tpu:
        from position_induced_transformer_tpu.kernels import (
            position_attention_fixed,
        )

        return position_attention_fixed(
            dist, lmda, inputs.astype(jnp.float32), locality, thr=thr
        ).astype(cdt)
    return position_attention(dist, lmda, inputs, locality, thr=thr)


class PosAtt(nn.Module):
    """Self position-attention block with residual-by-concat.

    Holds only the (n_head, 1, 1) bandwidth parameter; distances and
    locality thresholds come from the Geometry (reference: pit.py:28-57).
    """

    n_head: int
    locality: float = 1.0
    fused: bool = False

    @nn.compact
    def __call__(
        self, dist, inputs, thr=None, mesh_q=None, mesh_k=None, band=None
    ):
        lmda = self.param("lmda", uniform01, (self.n_head, 1, 1))
        conv = _dispatch_posatt(
            dist, lmda, inputs, self.locality, thr, self.fused, mesh_q,
            mesh_k, band,
        )
        return jnp.concatenate([inputs, conv], axis=-1)


class PosAttCross(nn.Module):
    """Cross position-attention: convolution only, no concat
    (reference: pit.py:59-71)."""

    n_head: int
    locality: float
    fused: bool = False

    @nn.compact
    def __call__(
        self, dist, inputs, thr=None, mesh_q=None, mesh_k=None, band=None
    ):
        lmda = self.param("lmda", uniform01, (self.n_head, 1, 1))
        return _dispatch_posatt(
            dist, lmda, inputs, self.locality, thr, self.fused, mesh_q,
            mesh_k, band,
        )


class PiT(nn.Module):
    """Encoder -> Processor -> Decoder position-induced transformer.

    ``__call__(geom, func_in)`` with ``func_in`` (B, L_in, in_dim) returns
    (B, L_out, out_dim). Structure mirrors reference pit.py:73-127:

    - encoder: [optional mesh-coord concat ->] cross-posatt down onto the
      latent cloud -> MLP(H*(in+space) -> hid -> hid) -> GELU
    - processor: n_blocks x [global self-posatt (concat residual) ->
      MLP((1+H)*hid -> hid -> hid) -> GELU]
    - decoder: cross-posatt up -> MLP(H*hid -> hid -> out_dim)
    """

    space_dim: int  # informational: actual coordinate dims come from the
    # Geometry/input arrays (kept for config symmetry with the reference
    # constructors, pit.py:161)
    in_dim: int
    out_dim: int
    hid_dim: int
    n_head: int
    n_blocks: int
    en_loc: float
    de_loc: float
    concat_mesh: bool = True
    use_instance_norm: bool = False
    residual_output: bool = False
    fused_kernel: bool = False  # fused Pallas posatt (fixed meshes, TPU)
    compute_dtype: str = "float32"  # mixed precision: 'bfloat16' runs the
    # network's ACTIVATIONS in bf16 (params stay f32 master weights; the
    # softmax, locality masks, distance matrices, instance-norm statistics
    # and the model's output stay f32) — halves the activation HBM traffic
    # on the bandwidth-bound rollout benchmarks. The model's input/output
    # contract is unchanged (f32 in, f32 out), so losses, normalizers and
    # rollout feedback are untouched. Opt in via
    # --set model.compute_dtype=bfloat16 after an accuracy A/B on your
    # data (BASELINE.md records the measured reference-benchmark A/Bs).
    # MAINTENANCE CONTRACT: the composition below (instance-norm
    # placement, residual source, concat order) is mirrored by the
    # stage-parallel forward in parallel/pipeline.make_pipelined_apply —
    # any new composition flag must be applied there too, with a case in
    # tests/test_parallel.py test_pipeline_with_instance_norm_and_residual

    def setup(self):
        self.down = PosAttCross(self.n_head, self.en_loc, self.fused_kernel)
        self.en_layer = KaimingMLP(self.hid_dim, self.hid_dim)
        self.conv = [
            PosAtt(self.n_head, 1.0, self.fused_kernel)
            for _ in range(self.n_blocks)
        ]
        self.mlp = [
            KaimingMLP(self.hid_dim, self.hid_dim) for _ in range(self.n_blocks)
        ]
        self.up = PosAttCross(self.n_head, self.de_loc, self.fused_kernel)
        self.de = KaimingMLP(self.hid_dim, self.out_dim)

    def encoder(self, geom: Geometry, func_in: jnp.ndarray) -> jnp.ndarray:
        if self.concat_mesh:
            mesh = geom.mesh_in
            if mesh.ndim == 2:  # fixed mesh: broadcast over batch
                mesh = jnp.broadcast_to(
                    mesh[None], (func_in.shape[0],) + mesh.shape
                )
            func_in = jnp.concatenate([mesh, func_in], axis=-1)
        func_in = func_in.astype(jnp.dtype(self.compute_dtype))
        f = self.down(
            geom.dist_down, func_in, geom.thr_down,
            mesh_q=geom.mesh_ltt, mesh_k=geom.mesh_in, band=geom.band_down,
        )
        f = self.en_layer(f)
        return nn.gelu(f, approximate=False)

    def processor(self, geom: Geometry, f: jnp.ndarray) -> jnp.ndarray:
        for a, w in zip(self.conv, self.mlp):
            f = a(
                geom.dist_proc, f,
                mesh_q=geom.mesh_ltt, mesh_k=geom.mesh_ltt,
            )
            f = w(f)
            f = nn.gelu(f, approximate=False)
        return f

    def decoder(self, geom: Geometry, f: jnp.ndarray) -> jnp.ndarray:
        f = self.up(
            geom.dist_up, f, geom.thr_up,
            mesh_q=geom.mesh_out, mesh_k=geom.mesh_ltt, band=geom.band_up,
        )
        return self.de(f)

    def __call__(self, geom: Geometry, func_in: jnp.ndarray) -> jnp.ndarray:
        f = self.encoder(geom, func_in)
        if self.use_instance_norm:
            f = instance_norm(f)
        f = self.processor(geom, f)
        if self.use_instance_norm:
            f = instance_norm(f)
        # model boundary: always hand back f32 — the training loop's
        # losses/metrics, normalizer postprocess and rollout window
        # feedback are precision-invariant to the internal compute dtype
        out = self.decoder(geom, f).astype(jnp.float32)
        if self.residual_output:
            out = out + func_in
        return out
