"""Tests for metrics and normalizers, incl. torch-reference parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu.ops import (
    PixelWiseNormalizer,
    instance_norm,
    rel_l1_quartiles,
    rel_lp_norm,
    rel_max_norm,
    rel_norm_mean,
    rel_norm_step,
    rel_norm_traj,
)

from reference_oracle import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


def test_rel_lp_hand_case():
    true = jnp.array([[[1.0], [0.0]], [[0.0], [2.0]]])  # (2, 2, 1)
    pred = jnp.array([[[0.0], [0.0]], [[0.0], [0.0]]])
    # rel-L2 per sample is 1.0 -> sum over batch = 2.0
    np.testing.assert_allclose(rel_lp_norm(true, pred, out_dim=1, p=2), 2.0)
    np.testing.assert_allclose(rel_lp_norm(true, pred, out_dim=1, p=1), 2.0)
    np.testing.assert_allclose(rel_max_norm(true, pred, out_dim=1), 2.0)


@needs_ref
@pytest.mark.parametrize("p", [1, 2])
def test_rel_lp_parity(p):
    import torch

    _, ref_utils = REF
    rng = np.random.default_rng(0)
    true = rng.random((6, 50, 3)).astype(np.float32)
    pred = rng.random((6, 50, 3)).astype(np.float32)
    theirs = ref_utils.RelLpNorm(out_dim=3, p=p)(
        torch.from_numpy(true), torch.from_numpy(pred)
    ).item()
    ours = float(rel_lp_norm(jnp.asarray(true), jnp.asarray(pred), 3, p))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


@needs_ref
def test_rel_max_parity():
    import torch

    _, ref_utils = REF
    rng = np.random.default_rng(1)
    true = rng.random((4, 30, 2)).astype(np.float32)
    pred = rng.random((4, 30, 2)).astype(np.float32)
    theirs = ref_utils.RelMaxNorm(out_dim=2)(
        torch.from_numpy(true), torch.from_numpy(pred)
    ).item()
    ours = float(rel_max_norm(jnp.asarray(true), jnp.asarray(pred), 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_rel_norm_mean_and_quartiles():
    rng = np.random.default_rng(2)
    true = rng.random((8, 40, 1)).astype(np.float32)
    pred = true * 1.1
    m = float(rel_norm_mean(jnp.asarray(true), jnp.asarray(pred), p=1))
    np.testing.assert_allclose(m, 0.1, rtol=1e-4)
    q25, q50, q75 = rel_l1_quartiles(jnp.asarray(true), jnp.asarray(pred))
    np.testing.assert_allclose(float(q50), 0.1, rtol=1e-4)


def test_stepwise_traj_metrics():
    rng = np.random.default_rng(3)
    true = rng.random((5, 16, 16, 4)).astype(np.float32)
    pred = true.copy()
    pred[..., 2] *= 1.5
    step = np.asarray(rel_norm_step(jnp.asarray(true), jnp.asarray(pred)))
    assert step.shape == (4,)
    assert step[2] > 0.1 and step[0] == 0.0
    traj = float(rel_norm_traj(jnp.asarray(true), jnp.asarray(pred)))
    assert 0 < traj < step[2]


@needs_ref
def test_pixelwise_normalizer_parity_same_and_cross_resolution():
    import torch

    _, ref_utils = REF
    rng = np.random.default_rng(4)
    x = rng.random((20, 8, 8, 1)).astype(np.float32)
    theirs = ref_utils.PixelWiseNormalization(torch.from_numpy(x))
    ours = PixelWiseNormalizer.fit(jnp.asarray(x))

    y = rng.random((5, 8, 8, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.normalize(jnp.asarray(y))),
        theirs.normalize(torch.from_numpy(y)).numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    # cross-resolution (ZSSR path): bilinear-resized statistics
    z = rng.random((5, 16, 16, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ours.denormalize(jnp.asarray(z))),
        theirs.denormalize(torch.from_numpy(z)).numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


@needs_ref
def test_instance_norm_parity():
    import torch

    rng = np.random.default_rng(5)
    x = rng.random((3, 40, 16)).astype(np.float32)  # (B, L, C)
    norm = torch.nn.InstanceNorm1d(16)
    theirs = (
        norm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    )
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_normalizer_roundtrip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((10, 6, 6, 2)).astype(np.float32))
    n = PixelWiseNormalizer.fit(x)
    np.testing.assert_allclose(
        np.asarray(n.denormalize(n.normalize(x))), np.asarray(x), rtol=1e-4, atol=1e-5
    )
