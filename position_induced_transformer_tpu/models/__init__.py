"""PiT model families (flax.linen)."""

from position_induced_transformer_tpu.models.geometry import Geometry, build_geometry
from position_induced_transformer_tpu.models.pit import (
    KaimingMLP,
    PiT,
    PosAtt,
    PosAttCross,
    TorchLinear,
)

__all__ = [
    "Geometry",
    "build_geometry",
    "PiT",
    "PosAtt",
    "PosAttCross",
    "KaimingMLP",
    "TorchLinear",
]
