"""Pallas GQ kernel logic, validated on CPU via interpret mode (the real
compiled path is exercised on TPU; see also the 100%-match check in
.claude/skills/verify)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.codebook import prior_samples
from vqvae_from_gaussian_vae_tpu.ops.gq_pallas import gq_argmax_pallas
from vqvae_from_gaussian_vae_tpu.ops.gq_search import score_operands


def _operands(rows, n, g, seed=0):
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((rows, g)).astype(np.float32)
    std = np.exp(0.5 * np.clip(rng.standard_normal((rows, g)), -3, 1)).astype(np.float32)
    cb = prior_samples(n, g, 42)[:n]
    return score_operands(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(cb), 1.0)


@pytest.mark.parametrize("rows,n,block_r,block_n", [
    (64, 512, 32, 128),
    (70, 300, 32, 128),   # non-multiple rows and codes (padding + masking)
    (16, 256, 64, 512),   # blocks larger than the data
])
def test_pallas_interpret_matches_dense_argmax(rows, n, block_r, block_n):
    a, b = _operands(rows, n, 8)
    dense = np.asarray(jnp.argmax(a @ b, axis=1))
    got = np.asarray(
        gq_argmax_pallas(a, b, block_r=block_r, block_n=block_n, interpret=True)
    )
    np.testing.assert_array_equal(got, dense)


def test_pallas_interpret_tie_breaking_first_max():
    # duplicate codebook columns force exact ties; torch argmax takes the
    # first occurrence, and so must the kernel's cross-block merge
    a = jnp.ones((8, 4), jnp.float32)
    col = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
    b = jnp.asarray(np.concatenate([col, col], axis=1))  # 32 cols, dup at +16
    dense = np.asarray(jnp.argmax(a @ b, axis=1))
    got = np.asarray(gq_argmax_pallas(a, b, block_r=8, block_n=16, interpret=True))
    np.testing.assert_array_equal(got, dense)
    assert (got < 16).all()  # first duplicate wins across block boundary
