"""Fused Pallas TPU kernels."""

from position_induced_transformer_tpu.kernels.posatt_batched import (
    position_attention_batched,
    position_attention_batched_dist,
)
from position_induced_transformer_tpu.kernels.posatt_pallas import (
    position_attention_fixed,
)

__all__ = [
    "position_attention_fixed",
    "position_attention_batched",
    "position_attention_batched_dist",
]
