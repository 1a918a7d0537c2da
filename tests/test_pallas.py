"""Fused Pallas kernel vs the pure-jnp oracle.

Runs in interpret mode on CPU (bit-level semantics of the kernel program);
the same assertions execute compiled on TPU when one is attached (see
scripts/tpu_checks.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu.kernels import position_attention_fixed
from position_induced_transformer_tpu.ops import (
    euclidean_sq,
    position_attention,
)

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize(
    "L_out,L_in,B,H,D,loc",
    [
        (64, 64, 2, 2, 8, 0.3),  # self-attention, masked
        (64, 64, 2, 1, 8, 1.0),  # global (processor blocks)
        (16, 200, 3, 2, 4, 0.1),  # cross, L_in not tile-aligned
        (100, 48, 2, 2, 16, 0.5),  # L_out not tile-aligned
    ],
)
def test_fused_matches_oracle(L_out, L_in, B, H, D, loc, version):
    rng = np.random.default_rng(0)
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    want = position_attention(dist, lmda, u, loc)
    got = position_attention_fixed(dist, lmda, u, loc, interpret=INTERPRET, version=version)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("fused_bwd", [False, True])
@pytest.mark.parametrize(
    "L_out,L_in,B,H,D,loc",
    [
        (48, 48, 2, 2, 8, 0.4),    # self, masked
        (16, 200, 3, 2, 4, 0.1),   # cross, unaligned L_in
        (100, 48, 2, 1, 16, 1.0),  # global, unaligned L_out
    ],
)
def test_fused_gradients_match_oracle(L_out, L_in, B, H, D, loc, fused_bwd):
    rng = np.random.default_rng(1)
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    lmda = jnp.asarray(rng.random((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    def loss_ref(lmda, u):
        return jnp.sum(position_attention(dist, lmda, u, loc) ** 2)

    def loss_fused(lmda, u):
        return jnp.sum(
            position_attention_fixed(
                dist, lmda, u, loc, interpret=INTERPRET, fused_bwd=fused_bwd
            ) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(lmda, u)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(lmda, u)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6
        )


def test_fused_v2_bf16_option_close_to_oracle():
    rng = np.random.default_rng(2)
    L_out, L_in, B, H, D, loc = 64, 96, 3, 2, 8, 0.3
    mesh_out = jnp.asarray(rng.random((L_out, 2)), jnp.float32)
    mesh_in = jnp.asarray(rng.random((L_in, 2)), jnp.float32)
    dist = euclidean_sq(mesh_out, mesh_in)
    lmda = jnp.asarray(rng.standard_normal((H, 1, 1)), jnp.float32)
    u = jnp.asarray(rng.random((B, L_in, D)), jnp.float32)

    want = position_attention(dist, lmda, u, loc)
    got = position_attention_fixed(
        dist, lmda, u, loc, interpret=INTERPRET, version=2, mxu_bf16=True
    )
    # bf16 MXU inputs: ~1e-2 relative tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-3
    )
