"""Codebook generation must be bit-exact vs the reference (gaussian.py:15-19):
checkpoints don't store the table, so index portability rests on it."""

import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops import codebook as cb


def _reference_prior_samples(n, g, seed):
    import torch
    from scipy.stats import norm

    sobol = torch.quasirandom.SobolEngine(g, scramble=True, seed=seed)
    return torch.from_numpy(norm.ppf(sobol.draw(n))).float().numpy()


@pytest.mark.parametrize("n,g,seed", [(1024, 16, 42), (256, 4, 7)])
def test_prior_samples_matches_torch_reference(n, g, seed):
    ours = cb.prior_samples(n, g, seed)
    ref = _reference_prior_samples(n, g, seed)
    assert ours.dtype == np.float32
    np.testing.assert_array_equal(ours, ref)


def test_default_codebook_asset_golden():
    """The shipped 2^16 x 16 seed-42 asset equals fresh torch generation."""
    ours = cb.prior_samples(65536, 16, 42)
    ref = _reference_prior_samples(65536, 16, 42)
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (65536, 16)
    # sanity: roughly standard normal
    assert abs(float(ours.mean())) < 0.01
    assert abs(float(ours.std()) - 1.0) < 0.01


def test_standard_normal_log_prob():
    table = cb.prior_samples(256, 4, 7)
    lp = cb.standard_normal_log_prob(table)
    expected = -0.5 * table**2 - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(lp, expected.astype(np.float32), rtol=1e-6)
