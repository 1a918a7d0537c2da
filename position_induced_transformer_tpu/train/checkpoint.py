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
import shutil
import warnings
from typing import Any, Optional

import jax

_CKPTR = None  # one StandardCheckpointer per process: constructing one per
# save would leak its async thread pool across the runner's periodic-
# checkpoint loop (orbax warns 'Checkpointer not closed' at GC)


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save(path: str, tree: Any) -> str:
    """Save a pytree checkpoint to ``path`` (directory for orbax)."""
    path = os.path.abspath(path)
    try:
        ckptr = _checkpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        return path
    except ImportError:
        pass  # no orbax: silent msgpack fallback (minimal environments)
    except Exception as e:  # noqa: BLE001 — availability over purity:
        # periodic checkpointing must not kill a long run on a transient
        # save error, but the failure cannot be silent either (a stale
        # orbax directory from an earlier epoch would shadow the fresh
        # msgpack on restore — remove it) and the error must be surfaced.
        warnings.warn(
            f"orbax save to {path!r} failed ({type(e).__name__}: {e}); "
            "falling back to the msgpack format",
            stacklevel=2,
        )
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
    import flax.serialization

    fname = path if path.endswith(".msgpack") else path + ".msgpack"
    if jax.process_index() != 0:
        # multihost: concurrent writers to one shared-storage file would
        # interleave; params are replicated, process 0's copy suffices
        return fname
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
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
    replicate over their own mesh afterwards. Under multihost the first
    LOCAL device is the one this process can address."""
    meta = ckptr.metadata(path).item_metadata.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    target = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(
            tuple(m.shape), m.dtype, sharding=sharding
        ),
        meta,
    )
    return ckptr.restore(path, target=target)


def _structure_mismatch(restored: Any, target: Any) -> Optional[str]:
    """None if ``restored`` matches ``target``'s treedef + leaf shapes,
    else a description — used to tell a genuine architecture mismatch
    apart from the topology mismatch _restore_here exists for."""
    t_paths = {
        jax.tree_util.keystr(p): tuple(v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(target)
    }
    r_paths = {
        jax.tree_util.keystr(p): tuple(v.shape)
        for p, v in jax.tree_util.tree_leaves_with_path(restored)
    }
    if t_paths == r_paths:
        return None
    missing = sorted(set(t_paths) - set(r_paths))
    extra = sorted(set(r_paths) - set(t_paths))
    shapes = sorted(
        k for k in set(t_paths) & set(r_paths) if t_paths[k] != r_paths[k]
    )
    return (
        f"missing {missing or 'none'}, unexpected {extra or 'none'}, "
        f"mis-shaped {shapes or 'none'}"
    )


def restore(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint; ``target`` provides structure/dtypes."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        ckptr = _checkpointer()

        def validated(restored):
            # orbax's restore does NOT validate leaf shapes against the
            # target (measured: a (4,16) target happily yields the
            # checkpoint's (4,8) array) — an architecture mismatch (e.g.
            # resuming with a different --set model.hid_dim) must fail
            # HERE with a clear message, not as a cryptic shape error
            # deep in the first train step.
            if target is not None:
                mismatch = _structure_mismatch(restored, target)
                if mismatch:
                    raise ValueError(
                        f"checkpoint at {path!r} does not match the "
                        f"requested parameter structure: {mismatch}"
                    )
            return restored

        try:
            if target is not None:
                shapes = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
                )
                restored = ckptr.restore(path, target=shapes)
            else:
                return ckptr.restore(path)
        except Exception as e:  # noqa: BLE001 — availability over purity:
            # the common failure is a topology mismatch surfacing as an
            # orbax error whose message format is private, so rather
            # than pattern-match it, always attempt the metadata-driven
            # current-topology restore; if that fails too, the ORIGINAL
            # error is the informative one. Both paths' results pass the
            # same structure validation (outside this try, so a
            # validation failure is never mistaken for a restore failure).
            try:
                restored = _restore_here(ckptr, path)
            except Exception:
                raise e
        return validated(restored)
    import flax.serialization

    fname = path if path.endswith(".msgpack") else path + ".msgpack"
    if not os.path.exists(fname):
        raise FileNotFoundError(
            f"no checkpoint at {path!r}: neither an orbax directory nor "
            f"a msgpack file ({fname!r}) exists"
        )
    with open(fname, "rb") as f:
        data = f.read()
    if target is None:
        return flax.serialization.msgpack_restore(data)
    return flax.serialization.from_bytes(target, data)
