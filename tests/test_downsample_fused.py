"""The fused stride-2 downsample Pallas kernel must match the reference op
(asym (0,1) pad + stride-2 VALID 3x3 conv) exactly, and its stats epilogue
must equal a direct reduce of the output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.downsample_conv import downsample_conv3x3_gn


def _ref(x, w, b):
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize("shape,o", [((2, 8, 12, 16), 24), ((3, 32, 32, 8), 8)])
def test_downsample_kernel_matches_reference(shape, o):
    rng = np.random.default_rng(0)
    b, h, wd, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    y, stats = downsample_conv3x3_gn(x, w, bias, interpret=True)
    ref = _ref(x, w, bias)
    assert y.shape == (b, h // 2, wd // 2, o)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    yf = np.asarray(y, np.float64).reshape(b, -1, o)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), yf.sum(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), (yf ** 2).sum(1), rtol=1e-4)


def test_downsample_kernel_with_fused_add():
    rng = np.random.default_rng(2)
    b, h, wd, c = 2, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    y, stats = downsample_conv3x3_gn(x, w, bias, add=a, interpret=True)
    ref = _ref(x + a, w, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    yf = np.asarray(y, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), yf.sum(1), rtol=1e-4, atol=1e-5)
