"""Fused Pallas TPU kernels."""

from position_induced_transformer_tpu.kernels.posatt_batched import (
    position_attention_batched,
)
from position_induced_transformer_tpu.kernels.posatt_pallas import (
    position_attention_fixed,
)

__all__ = ["position_attention_fixed", "position_attention_batched"]
