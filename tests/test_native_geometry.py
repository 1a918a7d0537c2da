"""Native (C++) geometry builder vs the jnp reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu.data import native
from position_induced_transformer_tpu.ops import (
    pairwise_sq_dist,
    quantile_threshold,
)

LIB = native.load()
needs_native = pytest.mark.skipif(LIB is None, reason="no native toolchain")


@needs_native
@pytest.mark.parametrize("metric", ["euclidean", "periodic1d", "periodic2d"])
def test_native_matches_jnp(metric):
    rng = np.random.default_rng(0)
    if metric == "periodic2d":
        n = 8
        xs = np.linspace(0, 1, n + 1)[:-1]
        xx, yy = np.meshgrid(xs, xs)
        mesh_in = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
        mesh_out = mesh_in[: n * n // 2]
    elif metric == "periodic1d":
        mesh_in = np.linspace(0, 1, 65)[:-1].reshape(-1, 1).astype(np.float32)
        mesh_out = mesh_in[::2]
    else:
        mesh_in = rng.random((100, 2)).astype(np.float32)
        mesh_out = rng.random((40, 2)).astype(np.float32)

    loc = 0.1
    out = native.geometry_host(mesh_out, mesh_in, metric, loc)
    assert out is not None
    dist, thr = out
    ref_dist = np.asarray(
        pairwise_sq_dist(jnp.asarray(mesh_out), jnp.asarray(mesh_in), metric)
    )
    np.testing.assert_allclose(dist, ref_dist, rtol=1e-6, atol=1e-7)
    ref_thr = np.asarray(quantile_threshold(jnp.asarray(ref_dist), loc))
    np.testing.assert_allclose(thr, ref_thr, rtol=1e-5, atol=1e-7)


@needs_native
def test_native_global_locality_returns_no_threshold():
    rng = np.random.default_rng(1)
    mesh = rng.random((32, 2)).astype(np.float32)
    dist, thr = native.geometry_host(mesh, mesh, "euclidean", 1.0)
    assert thr is None and dist.shape == (32, 32)


@needs_native
def test_native_large_scale_smoke():
    """ZSSR-shaped workload: 40k x 256 distances + row quantiles."""
    rng = np.random.default_rng(2)
    mesh_out = rng.random((40000, 2)).astype(np.float32)
    mesh_in = rng.random((256, 2)).astype(np.float32)
    dist, thr = native.geometry_host(mesh_out, mesh_in, "euclidean", 0.02)
    assert dist.shape == (40000, 256) and thr.shape == (40000, 1)
    assert np.isfinite(dist).all() and np.isfinite(thr).all()
    # thresholds keep ~ the locality fraction per row
    kept = (dist <= thr).mean()
    assert 0.02 <= kept <= 0.05
