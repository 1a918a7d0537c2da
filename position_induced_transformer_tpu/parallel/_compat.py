"""jax version compatibility for shard_map (single source of truth)."""

from __future__ import annotations

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs legacy check_rep)."""
    try:
        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:
        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
