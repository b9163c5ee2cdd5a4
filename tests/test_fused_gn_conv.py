"""Fused GN+swish+conv Pallas kernel vs the XLA sequence (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.fused_gn_conv import fused_gn_swish_conv, gn_affine


def _ref(x, gamma, beta, w, b):
    h = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    h = h * jax.nn.sigmoid(h)
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


@pytest.mark.parametrize("B,H,W,C,O,bh", [
    (2, 8, 16, 64, 32, 4),
    (1, 12, 8, 32, 64, 4),   # multi-block rows, C != O
    (2, 8, 16, 64, 32, 8),   # single row-block (both halos are borders)
])
def test_fused_matches_xla(B, H, W, C, O, bh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(O) * 0.1, jnp.float32)
    ref = _ref(x, gamma, beta, w, b)
    got = fused_gn_swish_conv(x, gamma, beta, w, b, block_h=bh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gn_affine_decomposition():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 64)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(64), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64), jnp.float32)
    s, sh = gn_affine(x, gamma, beta, 32)
    direct = x * s[:, None, None, :] + sh[:, None, None, :]
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(np.asarray(direct), np.asarray(ref), atol=1e-5)


def test_fused_residual_branch():
    """The optional residual-add epilogue must equal ref + residual."""
    rng = np.random.default_rng(3)
    B, H, W, C = 2, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    ref = _ref(x, gamma, beta, w, b) + res
    got = fused_gn_swish_conv(x, gamma, beta, w, b, block_h=8, interpret=True,
                              residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
