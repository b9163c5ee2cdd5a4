"""GQ nearest-sample search: XLA blocked path vs the reference's literal
log-density-ratio formula, and (on TPU) the Pallas kernel vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.codebook import prior_samples
from vqvae_from_gaussian_vae_tpu.ops.gq_search import (
    gq_scores_reference,
    gq_search,
    score_operands,
)


def _random_posterior(rng, rows, g):
    mu = rng.standard_normal((rows, g)).astype(np.float32)
    std = np.exp(0.5 * np.clip(rng.standard_normal((rows, g)), -3, 1)).astype(np.float32)
    return mu, std


@pytest.mark.parametrize("rows,n,g,beta", [(64, 1024, 16, 1.0), (37, 512, 8, 0.7)])
def test_xla_search_matches_reference_formula(rows, n, g, beta):
    rng = np.random.default_rng(0)
    mu, std = _random_posterior(rng, rows, g)
    cb = prior_samples(n, g, 42)[:n]
    scores = gq_scores_reference(mu, std, cb, beta)
    expected = scores.argmax(axis=1)
    got = np.asarray(gq_search(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(cb), beta, backend="xla"))
    # The fp32 matmul reformulation can flip near-ties whose score gap is
    # below fp32 rounding of the score magnitude; require any flip to have
    # negligible regret in the exact (float64) scoring.
    mismatch = got != expected
    assert mismatch.mean() < 0.02, f"mismatch rate {mismatch.mean()}"
    if mismatch.any():
        chosen = scores[np.arange(rows), got]
        best = scores[np.arange(rows), expected]
        scale = np.maximum(1.0, np.abs(scores).max(axis=1))
        regret = (best - chosen) / scale
        assert regret.max() < 1e-3, f"max relative regret {regret.max()}"


def test_search_matches_torch_reference_backend():
    """Parity against the reference's own torch eval branch (gaussian.py:134-150)."""
    torch = pytest.importorskip("torch")
    from pit.quantization.gaussian import GaussianQuantRegularizer as TorchGQ

    reg = TorchGQ(format="blc", n_samples=1024, group=16, backend="torch").eval()
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 64, 32)).astype(np.float32)
    with torch.no_grad():
        _, info = reg(torch.from_numpy(z))
    ref_idx = info["indices"].numpy().reshape(-1)

    mu = z[..., :16].reshape(-1, 16)
    logvar = np.clip(z[..., 16:], -30.0, 20.0).reshape(-1, 16)
    std = np.exp(0.5 * logvar).astype(np.float32)
    cb = prior_samples(1024, 16, 42)
    got = np.asarray(gq_search(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(cb), 1.0, backend="xla"))
    match = (got == ref_idx).mean()
    assert match > 0.999, f"index match rate {match}"


def test_score_operands_shapes():
    mu = jnp.ones((8, 4))
    std = jnp.ones((8, 4))
    cb = jnp.ones((16, 4))
    a, b = score_operands(mu, std, cb, 1.0)
    assert a.shape == (8, 8) and b.shape == (8, 16)


def test_search_nonmultiple_block_sizes():
    rng = np.random.default_rng(2)
    mu, std = _random_posterior(rng, 130, 8)
    cb = prior_samples(512, 8, 42)
    full = gq_scores_reference(mu, std, cb, 1.0).argmax(axis=1)
    got = np.asarray(
        gq_search(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(cb), 1.0, backend="xla",
                  block_r=64, block_n=100)
    )
    assert (got == full).mean() > 0.99
