"""Checkpoint save/restore for resolution-independent parameter pytrees.

The reference saves a torch state dict at the end of training
(reference: train_burgers.py:116) and transplants weights across
resolutions by rebuilding the model (reference:
tensorflow/3_Darcy2D/evaluate.py:47-60). Because our params carry no mesh
dimension (models/pit.py), a checkpoint restored here can be bound to any
Geometry directly — that is the ZSSR mechanism.

Primary format: Orbax (async-capable, TPU-idiomatic). A msgpack fallback
(flax.serialization) covers minimal environments. Reference torch ``.pth``
checkpoints can be imported via utils/torch_compat.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, tree: Any) -> str:
    """Save a pytree checkpoint to ``path`` (directory for orbax)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        import flax.serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fname = path if path.endswith(".msgpack") else path + ".msgpack"
        with open(fname, "wb") as f:
            f.write(flax.serialization.to_bytes(tree))
        return fname


def _restore_here(ckptr, path: str) -> Any:
    """Orbax restore onto the CURRENT topology when the checkpoint's saved
    sharding metadata names devices that do not exist here (e.g. trained
    on a 'stage=2' pipeline mesh or an 8-chip pod, evaluated/served on one
    chip): rebuild the target from the checkpoint's own shape/dtype
    metadata with an explicit single-device sharding. Params carry no mesh
    dimension, so placement is the only thing that changes; callers
    replicate over their own mesh afterwards."""
    meta = ckptr.metadata(path).item_metadata.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    target = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(
            tuple(m.shape), m.dtype, sharding=sharding
        ),
        meta,
    )
    return ckptr.restore(path, target=target)


def restore(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; ``target`` provides structure/dtypes."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            if target is not None:
                shapes = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
                )
                return ckptr.restore(path, target=shapes)
            return ckptr.restore(path)
        except Exception as e:  # noqa: BLE001 — availability over purity:
            # the common failure is a topology mismatch surfacing as an
            # orbax ValueError whose message format is private, so rather
            # than pattern-match it, always attempt the metadata-driven
            # current-topology restore; if that fails too, the ORIGINAL
            # error is the informative one.
            try:
                return _restore_here(ckptr, path)
            except Exception:
                raise e
    import flax.serialization

    fname = path if path.endswith(".msgpack") else path + ".msgpack"
    with open(fname, "rb") as f:
        data = f.read()
    if target is None:
        return flax.serialization.msgpack_restore(data)
    return flax.serialization.from_bytes(target, data)
