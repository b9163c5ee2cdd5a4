"""Metric tests: PSNR/SSIM parity vs torch oracles, FID math, Inception
structure, LPIPS-alex behaviour, IS sanity."""

import jax.numpy as jnp
import numpy as np
import torch

from vqvae_from_gaussian_vae_tpu.evaluations.fid import (
    calculate_frechet_distance,
    fid_from_features,
)
from vqvae_from_gaussian_vae_tpu.evaluations.inception_score import inception_score
from vqvae_from_gaussian_vae_tpu.evaluations.lpips_metric import get_lpips
from vqvae_from_gaussian_vae_tpu.evaluations.psnr import get_psnr
from vqvae_from_gaussian_vae_tpu.evaluations.ssim import get_ssim_and_msssim, ssim


def test_psnr_matches_reference_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    ours = np.asarray(get_psnr(jnp.asarray(a), jnp.asarray(b), zero_mean=True))
    a255, b255 = (a + 1) * 127.5, (b + 1) * 127.5
    mse = ((a255 - b255) ** 2).reshape(3, -1).mean(axis=1)
    expect = 20 * np.log10(255.0 / np.sqrt(mse))
    np.testing.assert_allclose(ours, expect, rtol=1e-4)
    # identical -> inf
    assert np.isinf(np.asarray(get_psnr(jnp.asarray(a), jnp.asarray(a), zero_mean=True))).all()


def _numpy_ssim(a, b, data_range=255.0):
    """Independent scalar SSIM oracle (global statistics variant is NOT
    equivalent; this reimplements the windowed algorithm with numpy)."""
    from vqvae_from_gaussian_vae_tpu.evaluations.ssim import _gaussian_kernel

    k = _gaussian_kernel()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2

    def blur(x):  # x: (H, W), valid separable
        x = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 0, x)
        return np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, x)

    vals = []
    for n in range(a.shape[0]):
        per_c = []
        for c in range(a.shape[-1]):
            x, y = a[n, :, :, c].astype(np.float64), b[n, :, :, c].astype(np.float64)
            mx, my = blur(x), blur(y)
            sxx = blur(x * x) - mx * mx
            syy = blur(y * y) - my * my
            sxy = blur(x * y) - mx * my
            m = ((2 * mx * my + c1) * (2 * sxy + c2)) / ((mx**2 + my**2 + c1) * (sxx + syy + c2))
            per_c.append(m.mean())
        vals.append(np.mean(per_c))
    return np.asarray(vals)


def test_ssim_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    oracle = _numpy_ssim(a, b)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)
    # identity -> 1
    one = np.asarray(ssim(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(one, 1.0, atol=1e-5)


def test_msssim_gating_and_monotonicity():
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    s, ms = get_ssim_and_msssim(jnp.asarray(a), jnp.asarray(a), zero_mean=True)
    assert np.isnan(np.asarray(ms)).all()  # <256px -> NaN, like the reference

    a = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    noise_small = np.clip(a + rng.normal(0, 0.02, a.shape), -1, 1).astype(np.float32)
    noise_big = np.clip(a + rng.normal(0, 0.3, a.shape), -1, 1).astype(np.float32)
    _, ms_id = get_ssim_and_msssim(jnp.asarray(a), jnp.asarray(a), zero_mean=True)
    _, ms_s = get_ssim_and_msssim(jnp.asarray(a), jnp.asarray(noise_small), zero_mean=True)
    _, ms_b = get_ssim_and_msssim(jnp.asarray(a), jnp.asarray(noise_big), zero_mean=True)
    assert float(ms_id[0]) > 0.9999
    assert float(ms_id[0]) > float(ms_s[0]) > float(ms_b[0])


def test_frechet_distance_math():
    # identical Gaussians -> 0
    mu = np.zeros(8)
    sigma = np.eye(8)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    # mean shift only -> ||diff||^2
    mu2 = np.full(8, 0.5)
    np.testing.assert_allclose(
        calculate_frechet_distance(mu, sigma, mu2, sigma), 8 * 0.25, atol=1e-6
    )
    # feature path
    rng = np.random.default_rng(3)
    fa = rng.standard_normal((500, 16))
    fb = rng.standard_normal((500, 16)) + 1.0
    assert fid_from_features(fa, fa) < 1e-6
    assert fid_from_features(fa, fb) > 10.0


def test_inception_v3_structure():
    import jax

    from vqvae_from_gaussian_vae_tpu.evaluations.inception import InceptionV3

    net = InceptionV3(output_blocks=(3,), resize_input=False, normalize_input=False)
    x = jnp.zeros((1, 299, 299, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    (out,) = net.apply(variables, x)
    assert out.shape == (1, 1, 1, 2048)
    # torchvision inception_v3 has 94 BasicConv2d units
    def count(tree):
        return sum(count(v) if isinstance(v, dict) else 0 for v in tree.values()) + (
            1 if "conv" in tree and "bn" in tree else 0
        )
    assert count(variables["params"]) == 94


def test_lpips_alex_behaviour():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    d0 = np.asarray(get_lpips(a, a, zero_mean=True))
    d1 = np.asarray(get_lpips(a, b, zero_mean=True))
    assert d0.shape == (2,)
    np.testing.assert_allclose(d0, 0.0, atol=1e-6)
    assert (np.abs(d1) > 0).all()


def test_inception_score_sanity():
    # uniform predictions -> IS 1; confident diverse predictions -> high IS
    n, c = 100, 10
    uniform = np.full((n, c), 1.0 / c)
    m, s = inception_score(uniform, splits=2)
    np.testing.assert_allclose(m, 1.0, atol=1e-6)
    onehot = np.eye(c)[np.arange(n) % c] * 0.999 + 1e-4
    m2, _ = inception_score(onehot, splits=2)
    assert m2 > 5.0


def test_get_inception_score_matches_reference_oracle():
    """Bit-compatibility with the reference's get_inception_score, whose
    scipy.stats.entropy call runs with the default axis=0 (per-class column
    KL over samples) rather than the standard per-sample IS; see module doc
    and PARITY.md defect table."""
    import sys

    sys.path.insert(0, "/root/reference")
    from pit.evaluations.inception_score import get_inception_score as ref_is

    from vqvae_from_gaussian_vae_tpu.evaluations.inception_score import (
        get_inception_score,
    )

    rng = np.random.default_rng(7)
    for shape in [(64, 10), (257, 1008), (3, 5)]:
        logits = rng.normal(scale=3.0, size=shape).astype(np.float32)
        ours = get_inception_score(logits)
        ref = float(ref_is(logits))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # The formulas coincide only when the class marginal is uniform (the
    # reference's per-class 1/(N*m_c) weight reduces to the standard 1/N);
    # with an imbalanced marginal they diverge.
    labels = np.where(np.arange(100) < 90, 0, 1 + np.arange(100) % 9)
    onehot = np.log(np.eye(10)[labels] * 0.999 + 1e-4)
    probs = np.exp(onehot) / np.exp(onehot).sum(axis=1, keepdims=True)
    standard, _ = inception_score(probs, splits=1)
    assert abs(get_inception_score(onehot) - standard) > 0.5
