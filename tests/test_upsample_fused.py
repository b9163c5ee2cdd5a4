"""The fused phase-conv upsample Pallas kernel must match the plain
nearest+conv path exactly (shared params, fp rounding tolerance).  On CPU
the kernel runs in interpret mode; on-TPU equivalence is covered by the
same call path (ops/upsample_conv.py auto-selects)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.models.unet import Upsample
from vqvae_from_gaussian_vae_tpu.ops.upsample_conv import (
    phase_kernels, upsample_nearest_conv3x3, upsample_nearest_conv3x3_gn,
)


def _plain(x, w, b):
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize("shape", [(2, 8, 12, 16), (1, 32, 32, 24)])
def test_pallas_phase_conv_matches_plain(shape):
    rng = np.random.default_rng(0)
    b, h, wd, c = shape
    o = c
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    out_f = upsample_nearest_conv3x3(x, w, bias, interpret=True)
    out_p = _plain(x, w, bias)
    assert out_f.shape == (b, 2 * h, 2 * wd, o)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-4, atol=1e-4)


def test_stats_variant_matches_groupnorm_stats():
    """The (sum, sumsq) epilogue must equal a direct reduce of the output,
    and group_norm_from_stats must reproduce flax GroupNorm."""
    import flax.linen as nn
    from vqvae_from_gaussian_vae_tpu.models.unet import group_norm_from_stats

    rng = np.random.default_rng(3)
    b, h, wd, c = 2, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    y, stats = upsample_nearest_conv3x3_gn(x, w, bias, interpret=True)
    yf = np.asarray(y, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), yf.sum(1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), (yf ** 2).sum(1), rtol=1e-4)

    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    gbias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    got = group_norm_from_stats(y, stats, scale, gbias, num_groups=4)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": gbias}}, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_hwbc_variant_matches_plain():
    """The layout-preserving (H,W,B,C) kernel must match plain nearest+conv
    and emit correct stats."""
    rng = np.random.default_rng(5)
    b, h, wd, c = 3, 8, 12, 16
    x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    y, stats = upsample_nearest_conv3x3_gn(x, w, bias, interpret=True)
    ref = _plain(x, w, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    yf = np.asarray(y, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), yf.sum(1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), (yf ** 2).sum(1), rtol=1e-4)


def test_phase_kernels_cover_all_taps():
    # each 3x3 tap contributes to exactly one group per phase: summing the
    # four phase kernels over (a, b) recovers 4x the 3x3 kernel sum
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    k22 = phase_kernels(w)
    total = jnp.sum(k22, axis=(0, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(total), np.asarray(4 * jnp.sum(w, axis=(0, 1))),
                               rtol=1e-5)


def test_upsample_module_plain_path_on_cpu():
    # on non-TPU backends the module always takes the XLA path; params layout
    # is the plain nn.Conv child either way
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    up = Upsample(16)
    variables = up.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]["conv"]) == {"kernel", "bias"}
    out = up.apply(variables, x)
    cp = variables["params"]["conv"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_plain(x, cp["kernel"], cp["bias"])), atol=1e-5
    )


def test_hwbc_variant_with_fused_add():
    rng = np.random.default_rng(6)
    b, h, wd, c = 2, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    y, stats = upsample_nearest_conv3x3_gn(x, w, bias, add=a, interpret=True)
    ref = _plain(x + a, w, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)
    yf = np.asarray(y, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(stats[:, 0]), yf.sum(1), rtol=1e-4)
