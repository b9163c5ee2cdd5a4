"""Parity of the concat-free group-interleaved packed flash path
(ops/flash_blc.py:flash_attention_qkvi) vs the einsum oracle: forward,
the full qkv gradient, and the weight-permutation helper the model uses
(models/vit.py MultiheadAttention).

Interpret mode on CPU; real Mosaic on TPU (GVQ_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.flash_blc import (
    flash_attention_qkv, flash_attention_qkvi, interleave_qkv_weight,
    qkv_interleave_groups)

INTERPRET = jax.default_backend() == "cpu"

B, L, H, D = 2, 1024, 12, 64
C = H * D
SM = D ** -0.5


def _einsum_ref(q, k, v):
    qh = q.reshape(B, L, H, D).astype(jnp.float32)
    kh = k.reshape(B, L, H, D).astype(jnp.float32)
    vh = v.reshape(B, L, H, D).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * SM
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, L, C)


def _interleave(qkv_std, gi):
    """Activation-side permute (test-only; the model permutes weights)."""
    cgi = gi * D
    nb = C // cgi
    x = qkv_std.reshape(B, L, 3, nb, cgi)
    return jnp.swapaxes(x, 2, 3).reshape(B, L, 3 * C)


def _deinterleave(qkv_i, gi):
    cgi = gi * D
    nb = C // cgi
    x = qkv_i.reshape(B, L, nb, 3, cgi)
    return jnp.swapaxes(x, 2, 3).reshape(B, L, 3 * C)


def test_granularity_flagship_shape():
    gi = qkv_interleave_groups(L, H, D, jnp.bfloat16)
    assert gi > 0 and H % gi == 0
    # unsupported: L not a 128 multiple
    assert qkv_interleave_groups(1000, H, D, jnp.bfloat16) == 0


def test_forward_matches_einsum_and_packed():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = [jax.random.normal(kk, (B, L, C), jnp.bfloat16) for kk in ks]
    qkv = jnp.concatenate([q, k, v], axis=-1)
    gi = qkv_interleave_groups(L, H, D, jnp.bfloat16)
    out_i = flash_attention_qkvi(_interleave(qkv, gi), SM, H, gi, INTERPRET)
    ref = _einsum_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out_i, np.float32),
                               np.asarray(ref), atol=2e-2)
    out_p = flash_attention_qkv(qkv, SM, H, INTERPRET)
    np.testing.assert_allclose(np.asarray(out_i, np.float32),
                               np.asarray(out_p, np.float32), atol=1e-2)


def test_gradient_matches_einsum():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q, k, v = [jax.random.normal(kk, (B, L, C), jnp.bfloat16) for kk in ks[:3]]
    w = jax.random.normal(ks[3], (B, L, C), jnp.bfloat16)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    gi = qkv_interleave_groups(L, H, D, jnp.bfloat16)
    qkv_i = _interleave(qkv, gi)

    def loss_i(qkv_i):
        o = flash_attention_qkvi(qkv_i, SM, H, gi, INTERPRET)
        return jnp.sum(o.astype(jnp.float32) * w.astype(jnp.float32))

    def loss_ref(qkv_std):
        q, k, v = jnp.split(qkv_std, 3, axis=-1)
        return jnp.sum(_einsum_ref(q, k, v) * w.astype(jnp.float32))

    g_i = jax.grad(loss_i)(qkv_i)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(_deinterleave(g_i, gi), np.float32),
        np.asarray(g_ref, np.float32), atol=6e-2)


def test_weight_interleave_consistency():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
    kernel = jax.random.normal(ks[1], (C, 3 * C), jnp.bfloat16) * 0.05
    bias = jax.random.normal(ks[2], (3 * C,), jnp.float32) * 0.01
    gi = qkv_interleave_groups(L, H, D, jnp.bfloat16)
    k_i, b_i = interleave_qkv_weight(kernel, bias, H, D, gi)
    qkv_std = x @ kernel + bias
    qkv_i = x @ k_i + b_i
    np.testing.assert_allclose(
        np.asarray(_interleave(qkv_std, gi), np.float32),
        np.asarray(qkv_i, np.float32), atol=1e-3)
