"""Weight transplant between reference torch checkpoints and flax params.

Lets users of the reference bring trained ``model.pth`` state dicts
(reference: train_burgers.py:116 et al.) into this framework, and lets the
test suite validate bit-level forward parity. Torch itself is not imported
here — callers pass a mapping of parameter name -> numpy array.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _strip_compile_prefix(name: str) -> str:
    # torch.compile wraps state dicts with an ``_orig_mod.`` prefix.
    return name[len("_orig_mod."):] if name.startswith("_orig_mod.") else name


def torch_state_dict_to_flax(state: Mapping[str, np.ndarray]) -> Dict:
    """Convert a reference ``pit`` state dict to this framework's PiT params.

    Mapping (reference names -> flax tree):
      down.lmda            -> down/lmda
      en_layer.mlpN.weight -> en_layer/mlpN/kernel (transposed: torch stores
                              (out, in), flax (in, out))
      conv.<i>.lmda        -> conv_<i>/lmda
      mlp.<i>.mlpN.*       -> mlp_<i>/mlpN/*
      up.lmda, de.mlpN.*   -> up/lmda, de/mlpN/*
      norm.*               -> rejected with a clear error (the reference's
                              InstanceNorm1d is affine=False and has no
                              parameters; affine weights cannot be imported)
    """
    params: Dict = {}

    def put(path, value):
        node = params
        for key in path[:-1]:
            node = node.setdefault(key, {})
        # host numpy: this is a pure format conversion — jnp.asarray would
        # bounce every tensor through the default device (slow through the
        # TPU relay) and silently downcast float64 to float32
        node[path[-1]] = np.asarray(value)

    for raw_name, value in state.items():
        name = _strip_compile_prefix(raw_name)
        parts = name.split(".")
        arr = np.asarray(value)
        if parts[-1] == "lmda":
            if parts[0] in ("down", "up"):
                put((parts[0], "lmda"), arr)
            elif parts[0] == "conv" and len(parts) == 3:  # conv.<i>.lmda
                put((f"conv_{parts[1]}", "lmda"), arr)
            else:
                raise KeyError(f"unrecognized reference parameter {name!r}")
        elif parts[-1] in ("weight", "bias"):
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            if leaf == "kernel":
                arr = arr.T
            if parts[0] in ("en_layer", "de"):  # en_layer.mlp1.weight
                put((parts[0], parts[1], leaf), arr)
            elif parts[0] == "mlp":  # mlp.<i>.mlp1.weight
                put((f"mlp_{parts[1]}", parts[2], leaf), arr)
            elif parts[0] == "norm":
                # the reference's InstanceNorm1d is affine=False
                # (train_vorticity.py:43) and carries no parameters; an
                # AFFINE norm's learned scale/shift cannot be imported —
                # dropping them silently would diverge numerically
                raise KeyError(
                    f"cannot import {name!r}: the reference uses "
                    "InstanceNorm1d(affine=False); an affine norm's "
                    "parameters have no counterpart here"
                )
            else:
                raise KeyError(f"unrecognized reference parameter {name!r}")
        else:
            raise KeyError(f"unrecognized reference parameter {name!r}")
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``model.pth`` (``{'model_state': state_dict}``,
    train_burgers.py:116 — or a bare state dict) into numpy arrays.
    Imports torch lazily; the rest of this module stays torch-free."""
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    state = loaded.get("model_state", loaded)
    return {k: np.asarray(v.numpy()) for k, v in state.items()}


def save_torch_checkpoint(path: str, state: Mapping[str, np.ndarray]) -> None:
    """Write a reference-compatible ``model.pth``
    (``{'model_state': state_dict}`` of torch tensors)."""
    import torch

    torch.save(
        {
            "model_state": {
                k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()
            }
        },
        path,
    )


def flax_params_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_dict_to_flax`: export PiT params as a
    reference-compatible state-dict mapping (numpy arrays; load with
    ``model.load_state_dict({k: torch.from_numpy(v) ...})``). Enables
    round-tripping trained models back into the reference."""
    out: Dict[str, np.ndarray] = {}

    def emit(torch_prefix: str, tree):
        for mlp_name, leaves in tree.items():  # mlp1 / mlp2
            out[f"{torch_prefix}.{mlp_name}.weight"] = np.asarray(
                leaves["kernel"]
            ).T
            out[f"{torch_prefix}.{mlp_name}.bias"] = np.asarray(leaves["bias"])

    for key, sub in params.items():
        if key in ("down", "up"):
            out[f"{key}.lmda"] = np.asarray(sub["lmda"])
        elif key.startswith("conv_"):
            out[f"conv.{key.split('_')[1]}.lmda"] = np.asarray(sub["lmda"])
        elif key.startswith("mlp_"):
            emit(f"mlp.{key.split('_')[1]}", sub)
        elif key in ("en_layer", "de"):
            emit(key, sub)
        else:
            raise KeyError(f"unrecognized PiT parameter subtree {key!r}")
    return out
