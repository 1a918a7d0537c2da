"""Ablation baseline models from the reference's TF implementation.

Capability parity with SURVEY.md §2.2 T5 (reference:
tensorflow/1_InviscidBurgers/utils.py:230-553):

- ``MultiHeadSelfAtt``: scaled dot-product self-attention with in-op Q/K/V
  projections and trailing GELU.
- ``LiteTransformer``: PiT whose *processor* uses self-attention (position
  attention keeps the encoder/decoder).
- ``Transformer``: all attention replaced by self-attention.
- ``SelfMultiHeadPosAtt`` / ``SelfPiT``: hybrid attention
  ``softmax(QK^T/sqrt(d) - lambda*D)`` — dot-product logits with an
  additive position-distance bias.

The standalone classes below mirror the 1_InviscidBurgers dir's baselines
exactly. The RUNNABLE experiment path is ``BenchmarkConfig.model_variant``
(`--model-variant lite|transformer|selfpit`), which parameterizes each
benchmark's own PiTTF/PiTTFPointCloud with swapped attention kinds — the
same one-line-swap the reference does per dir
(tensorflow/1_InviscidBurgers/train.py:38-40).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from position_induced_transformer_tpu.models.pit_tf import (
    MultiHeadPosAtt,
    MultiHeadSelfAtt,
    SelfMultiHeadPosAtt,
    TFGeometry,
    TFMlp,
)
from position_induced_transformer_tpu.ops.initializers import he_normal_tf


class _EncProcDec(nn.Module):
    """Shared encoder/processor/decoder scaffold for the TF baselines."""

    out_dim: int
    hid_dim: int
    n_head: int
    n_blocks: int = 4

    def _encode(self, mesh, inputs):
        if mesh.ndim == 2:
            mesh = jnp.broadcast_to(mesh[None], (inputs.shape[0],) + mesh.shape)
        en = jnp.concatenate([mesh, inputs], axis=-1)
        en = nn.Dense(self.hid_dim, kernel_init=he_normal_tf, name="en_layer")(en)
        return nn.gelu(en, approximate=False)

    def _process(self, x, attn_factory):
        for i in range(self.n_blocks):
            pa = attn_factory(i)(x)
            x = TFMlp(self.hid_dim, self.hid_dim, name=f"MLP_{i}")(pa) + nn.Dense(
                self.hid_dim, kernel_init=he_normal_tf, name=f"W_{i}"
            )(x)
            x = nn.gelu(x, approximate=False)
        return x

    def _decode(self, de, de2):
        de = TFMlp(self.hid_dim, self.hid_dim, name="mlp")(de2) + nn.Dense(
            self.hid_dim, kernel_init=he_normal_tf, name="w"
        )(de)
        de = nn.gelu(de, approximate=False)
        return TFMlp(self.hid_dim, self.out_dim, name="de_layer")(de)


class LiteTransformer(_EncProcDec):
    """Self-attention processor inside a position-attention encoder/decoder
    (reference: tensorflow/1_InviscidBurgers/utils.py:285-353)."""

    locality_encoder: float = 100.0
    locality_decoder: float = 100.0

    @nn.compact
    def __call__(self, geom: TFGeometry, mesh, inputs):
        en = self._encode(mesh, inputs)
        x = MultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_encoder, name="down"
        )(geom.m_cross.T, en)
        x = self._process(
            x,
            lambda i: MultiHeadSelfAtt(self.n_head, self.hid_dim, name=f"PA_{i}"),
        )
        de = MultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_decoder, name="up"
        )(geom.m_cross, x)
        de2 = MultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_decoder, name="up2"
        )(geom.m_qry, de)
        return self._decode(de, de2)


class Transformer(_EncProcDec):
    """All-self-attention ablation
    (reference: tensorflow/1_InviscidBurgers/utils.py:355-416)."""

    @nn.compact
    def __call__(self, mesh, inputs):
        en = self._encode(mesh, inputs)
        x = MultiHeadSelfAtt(self.n_head, self.hid_dim, name="down")(en)
        x = self._process(
            x,
            lambda i: MultiHeadSelfAtt(self.n_head, self.hid_dim, name=f"PA_{i}"),
        )
        de = MultiHeadSelfAtt(self.n_head, self.hid_dim, name="up")(x)
        de2 = MultiHeadSelfAtt(self.n_head, self.hid_dim, name="up2")(de)
        return self._decode(de, de2)


class SelfPiT(_EncProcDec):
    """PiT with hybrid SelfMultiHeadPosAtt everywhere
    (reference: tensorflow/1_InviscidBurgers/utils.py:483-553)."""

    locality_encoder: float = 100.0
    locality_decoder: float = 100.0

    @nn.compact
    def __call__(self, geom: TFGeometry, mesh, inputs):
        en = self._encode(mesh, inputs)
        x = SelfMultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_encoder, name="down"
        )(geom.m_cross.T, en)
        x = self._process(
            x,
            lambda i: (
                lambda xx: SelfMultiHeadPosAtt(
                    self.n_head, self.hid_dim, 200.0, name=f"MHPA_{i}"
                )(geom.m_ltt, xx)
            ),
        )
        de = SelfMultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_decoder, name="up"
        )(geom.m_cross, x)
        de2 = SelfMultiHeadPosAtt(
            self.n_head, self.hid_dim, self.locality_decoder, name="up2"
        )(geom.m_qry, de)
        return self._decode(de, de2)
