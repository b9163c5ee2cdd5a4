"""Codebook generation must be bit-exact vs the reference (gaussian.py:15-19):
checkpoints don't store the table, so index portability rests on it.

The generator is pure numpy (torch-free); these goldens pin it against
fresh torch SobolEngine generation and against the shipped assets.
"""

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


@pytest.mark.parametrize(
    "n,g,seed",
    [(333, 8, 7), (257, 32, 123456789), (64, 3, 0), (1000, 16, 42), (128, 256, 99)],
)
def test_numpy_generator_matches_torch_no_asset(n, g, seed):
    """cb.generate (pure numpy, bypasses assets) is bit-exact vs torch,
    including odd n (Gray-code tail), dim=3, dim=256 (asset edge), seed=0."""
    ours = cb.generate(n, g, seed)
    ref = _reference_prior_samples(n, g, seed)
    np.testing.assert_array_equal(ours, ref)


def test_default_codebook_asset_golden():
    """The shipped 2^16 x 16 seed-42 asset equals fresh numpy AND torch
    generation (the production table, configs/sd3unet_gq_0.25.yaml:30-33)."""
    ours = cb.prior_samples(65536, 16, 42)
    np.testing.assert_array_equal(ours, cb.generate(65536, 16, 42))
    ref = _reference_prior_samples(65536, 16, 42)
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (65536, 16)
    # sanity: roughly standard normal
    assert abs(float(ours.mean())) < 0.01
    assert abs(float(ours.std()) - 1.0) < 0.01


def test_generate_rejects_unsupported():
    with pytest.raises(ValueError):
        cb.generate(16, 257, 42)  # beyond shipped direction numbers
    with pytest.raises(ValueError):
        cb.generate(16, 4, 2**32)  # non-32-bit seed


def test_standard_normal_log_prob():
    table = cb.prior_samples(256, 4, 7)
    lp = cb.standard_normal_log_prob(table)
    expected = -0.5 * table**2 - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(lp, expected.astype(np.float32), rtol=1e-6)
