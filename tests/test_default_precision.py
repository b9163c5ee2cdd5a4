"""Default-matmul-precision smoke coverage (round-4 advisor finding).

The on-chip suite mode (GVQ_TEST_TPU=1) pins jax_default_matmul_precision
to "highest" so the fp32 parity oracles hold on the MXU — but production
runs at the TPU *default* (fp32 dots truncated to one bf16 pass), and
without these tests that configuration was only ever exercised by
benchmarks and training.  Each test here re-enters default precision
locally and asserts loose statistical agreement instead of exact parity:

* GQ search: indices agree with the fp64 oracle on >= 98% of rows (the
  disagreeing rows are genuine near-ties; the reference itself accepts
  TF32 drift here, /root/reference/main.py:577-587);
* flash attention: bf16 kernel output within bf16-scale tolerance of the
  fp32 einsum oracle;
* LayerNorm kernel: default-precision output within loose tolerance.

On the CPU mesh these run unchanged (CPU dots are exact fp32, so they
simply pass with margin); the point is the GVQ_TEST_TPU=1 run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.gq_search import (
    gq_search, gq_scores_reference)
from vqvae_from_gaussian_vae_tpu.ops.flash_blc import flash_attention_blc

INTERPRET = jax.default_backend() == "cpu"


def test_gq_search_default_precision_index_agreement():
    rng = np.random.default_rng(7)
    r, g, n = 512, 16, 4096
    mu = rng.standard_normal((r, g)).astype(np.float32)
    std = np.exp(0.3 * rng.standard_normal((r, g))).astype(np.float32)
    codebook = rng.standard_normal((n, g)).astype(np.float32)

    oracle = np.argmax(gq_scores_reference(mu, std, codebook, 1.0), axis=1)
    with jax.default_matmul_precision("default"):
        idx = np.asarray(gq_search(jnp.asarray(mu), jnp.asarray(std),
                                   jnp.asarray(codebook), 1.0))
    agree = float(np.mean(idx == oracle))
    assert agree >= 0.98, f"default-precision index agreement {agree:.4f}"


def test_flash_attention_default_precision():
    b, l, h, d = 2, 256, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = [jax.random.normal(kk, (b, l, h * d), jnp.bfloat16) for kk in ks]
    sm = d ** -0.5

    qh = q.reshape(b, l, h, d).astype(jnp.float32)
    kh = k.reshape(b, l, h, d).astype(jnp.float32)
    vh = v.reshape(b, l, h, d).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   precision=jax.lax.Precision.HIGHEST) * sm
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), vh,
                     precision=jax.lax.Precision.HIGHEST).reshape(b, l, h * d)

    with jax.default_matmul_precision("default"):
        out = flash_attention_blc(q, k, v, sm, h, INTERPRET)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2)


def test_layer_norm_default_precision():
    from vqvae_from_gaussian_vae_tpu.ops.layer_norm import layer_norm

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 256, 768), jnp.bfloat16)
    scale = jnp.ones((768,), jnp.float32) * 1.3
    bias = jnp.full((768,), 0.1, jnp.float32)
    xf = np.asarray(x, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ref = (xf - mean) / np.sqrt(var + 1e-5) * 1.3 + 0.1
    with jax.default_matmul_precision("default"):
        out = layer_norm(x, scale, bias, 1e-5, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=3e-2)
