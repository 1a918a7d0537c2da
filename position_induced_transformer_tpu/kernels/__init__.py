"""Fused Pallas TPU kernels."""

from position_induced_transformer_tpu.kernels.posatt_batched import (
    BandSpec,
    band_tile_rows,
    position_attention_batched,
    position_attention_batched_dist,
    position_attention_batched_tf_coords,
)
from position_induced_transformer_tpu.kernels.posatt_pallas import (
    position_attention_fixed,
)

__all__ = [
    "BandSpec",
    "band_tile_rows",
    "position_attention_fixed",
    "position_attention_batched",
    "position_attention_batched_dist",
    "position_attention_batched_tf_coords",
]
