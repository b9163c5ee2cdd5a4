"""Parity of the fused GroupNorm+swish backward (ops/gn_swish_bwd.py)
vs plain autodiff of the same forward, in Pallas interpret mode on CPU
(real Mosaic on TPU under GVQ_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.gn_swish_bwd import (
    _gn_swish_ref, gn_swish)

INTERPRET = jax.default_backend() == "cpu"


def _make(b, h, w, c, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (b, h, w, c), dtype) * 2.0
    scale = jax.random.normal(ks[1], (c,), jnp.float32) * 0.3 + 1.0
    bias = jax.random.normal(ks[2], (c,), jnp.float32) * 0.2
    dy = jax.random.normal(ks[3], (b, h, w, c), dtype)
    return x, scale, bias, dy


@pytest.mark.parametrize("b,h,w,c,dtype", [
    (2, 16, 16, 64, jnp.float32),
    (2, 16, 16, 64, jnp.bfloat16),
    (1, 32, 8, 128, jnp.bfloat16),   # multi-band rows
    (3, 8, 8, 256, jnp.bfloat16),    # wider channels, odd batch
])
def test_backward_matches_autodiff(b, h, w, c, dtype):
    x, scale, bias, dy = _make(b, h, w, c, dtype)

    def f_ref(x, scale, bias):
        y, _ = _gn_swish_ref(x, scale, bias, 32, 1e-6)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    def f_ker(x, scale, bias):
        y = gn_swish(x, scale, bias, 32, 1e-6, INTERPRET)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    gk = jax.grad(f_ker, argnums=(0, 1, 2))(x, scale, bias)
    tol = 5e-2 if dtype == jnp.bfloat16 else 2e-4
    for a, b_, name in zip(gk, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=tol, rtol=tol, err_msg=name)


def test_forward_matches_groupnorm():
    import flax.linen as nn

    x, scale, bias, _ = _make(2, 16, 16, 64, jnp.float32, seed=1)
    y = gn_swish(x, scale, bias, 32, 1e-6, INTERPRET)
    h = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    ref = h * jax.nn.sigmoid(h)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
