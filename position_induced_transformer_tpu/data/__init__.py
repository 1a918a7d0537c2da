"""Data: benchmark loaders, synthetic generators, mesh builders."""

from position_induced_transformer_tpu.data import loaders, meshes, synthetic

__all__ = ["loaders", "meshes", "synthetic"]
