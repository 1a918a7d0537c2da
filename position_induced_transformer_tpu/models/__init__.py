"""PiT model families (flax.linen)."""

from position_induced_transformer_tpu.models.baselines import (
    LiteTransformer,
    MultiHeadSelfAtt,
    SelfMultiHeadPosAtt,
    SelfPiT,
    Transformer,
)
from position_induced_transformer_tpu.models.geometry import (
    Geometry,
    build_geometry,
    build_geometry_host,
)
from position_induced_transformer_tpu.models.pit import (
    KaimingMLP,
    PiT,
    PosAtt,
    PosAttCross,
    TorchLinear,
)
from position_induced_transformer_tpu.models.pit_tf import (
    MultiHeadPosAtt,
    MultiHeadPosAttBatched,
    PiTTF,
    PiTTFPointCloud,
    TFGeometry,
    pairwise_dist_half,
    pairwise_dist_periodic_1d,
    pairwise_dist_periodic_2d,
    tf_precompute_thresholds,
)

__all__ = [
    "Geometry",
    "build_geometry",
    "build_geometry_host",
    "PiT",
    "PosAtt",
    "PosAttCross",
    "KaimingMLP",
    "TorchLinear",
    "PiTTF",
    "TFGeometry",
    "MultiHeadPosAtt",
    "MultiHeadPosAttBatched",
    "tf_precompute_thresholds",
    "PiTTFPointCloud",
    "pairwise_dist_periodic_2d",
    "pairwise_dist_periodic_1d",
    "pairwise_dist_half",
    "MultiHeadSelfAtt",
    "SelfMultiHeadPosAtt",
    "LiteTransformer",
    "Transformer",
    "SelfPiT",
]
