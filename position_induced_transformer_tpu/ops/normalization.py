"""Data normalization utilities.

``PixelWiseNormalizer`` matches the reference's ``PixelWiseNormalization``
(reference: utils.py:6-50): per-pixel mean/std over the training set with a
bilinear-resize fallback when the evaluation resolution differs from the
training resolution — the mechanism that lets a 43x43-trained Darcy
normalizer denormalize 421x421 zero-shot super-resolution outputs.

``instance_norm`` matches ``nn.InstanceNorm1d(hid)`` applied through the
permute dance in the vorticity driver (reference: train_vorticity.py:43,56-59):
per-sample, per-channel normalization over the mesh axis, no affine params,
biased variance, eps=1e-5.

Being a JAX framework there is no device-placement API surface
(``.cuda()/.cpu()`` in the reference) — arrays follow jit placement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PixelWiseNormalizer:
    """Per-pixel (per-location) normalization with resolution-transfer.

    Statistics are computed over the leading (sample) axis of a
    (N, h, w, C) — or generally (N, ..., C) — training array. ``normalize`` /
    ``denormalize`` accept arrays of any spatial resolution: when the
    resolution differs from the stored statistics, the mean/std fields are
    bilinearly resized (half-pixel-centre convention, matching torch
    ``F.interpolate(mode='bilinear', align_corners=False)``).
    """

    mean: jnp.ndarray  # (1, h, w, C) or (1, L, C)
    std: jnp.ndarray
    eps: float = 1e-5

    @classmethod
    def fit(cls, x: jnp.ndarray, eps: float = 1e-5) -> "PixelWiseNormalizer":
        mean = jnp.mean(x, axis=0, keepdims=True)
        # torch.std defaults to the unbiased estimator (reference: utils.py:10).
        std = jnp.std(x, axis=0, keepdims=True, ddof=1)
        return cls(mean=mean, std=std, eps=eps)

    def _stats_for(self, x: jnp.ndarray):
        if x.shape[1:] == self.mean.shape[1:]:
            return self.mean, self.std
        # Resolution mismatch: bilinearly resize the (1, h, w, C) statistics
        # to x's spatial shape (reference: utils.py:16-21 upsampling branch).
        target = (1,) + x.shape[1:]
        mean = jax.image.resize(self.mean, target, method="linear")
        std = jax.image.resize(self.std, target, method="linear")
        return mean, std

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        mean, std = self._stats_for(x)
        return (x - mean) / (std + self.eps)

    def denormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        mean, std = self._stats_for(x)
        return x * (std + self.eps) + mean

    # pytree protocol so normalizers can ride through jit boundaries
    def tree_flatten(self):
        return (self.mean, self.std), self.eps

    @classmethod
    def tree_unflatten(cls, eps, children):
        mean, std = children
        return cls(mean=mean, std=std, eps=eps)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over the mesh axis of a (B, L, C) array.

    Matches ``nn.InstanceNorm1d(C)(x.permute(0,2,1)).permute(0,2,1)``
    (reference: train_vorticity.py:56-59): per (sample, channel) statistics
    over L, biased variance, no learnable affine.
    """
    # statistics in f32 even under mixed precision (bf16 activations):
    # mean/variance accumulation across L=4096 mesh points loses ~2
    # decimal digits in bf16, and the cast-up is free (fused elementwise)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.var(x32, axis=1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
