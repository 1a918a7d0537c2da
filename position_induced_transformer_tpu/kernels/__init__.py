"""Fused Pallas TPU kernels."""

from position_induced_transformer_tpu.kernels.posatt_pallas import (
    position_attention_fixed,
)

__all__ = ["position_attention_fixed"]
