"""Gradient parity for the differentiable fused resample kernels.

The custom VJP's backward is the phase-algebra adjoint
(ops/upsample_conv.py:_upsample_bwd_math); these tests check it against
jax.grad of the plain nearest-up + 3x3-conv + stats reference, including
the GN-stats cotangent path (stats feed group_norm_from_stats in the
consuming resblock, so their gradient must flow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.upsample_conv import (
    upsample_nearest_conv3x3_gn_add_vjp,
    upsample_nearest_conv3x3_gn_vjp,
)


def _ref(x, w, bias, add=None):
    xin = x if add is None else x + add
    up = jnp.repeat(jnp.repeat(xin, 2, axis=1), 2, axis=2)
    y = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    yf = y.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))], axis=1
    )
    return y, stats


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


@pytest.mark.parametrize("with_add", [False, True])
def test_fused_upsample_grads_match_xla(with_add):
    b, h, w_, c, o = 2, 8, 8, 8, 8
    x = _rand((b, h, w_, c), 0)
    add = _rand((b, h, w_, c), 1) if with_add else None
    w = _rand((3, 3, c, o), 2) * 0.2
    bias = _rand((o,), 3) * 0.1
    ry = _rand((b, 2 * h, 2 * w_, o), 4)
    rs = _rand((b, 2, o), 5) * 0.01

    def scal(fn):
        def f(*args):
            y, stats = fn(*args)
            return jnp.sum(y.astype(jnp.float32) * ry) + jnp.sum(stats * rs)
        return f

    if with_add:
        fused = lambda x, a, w, bb: upsample_nearest_conv3x3_gn_add_vjp(x, a, w, bb)
        args = (x, add, w, bias)
        ref = lambda x, a, w, bb: _ref(x, w, bb, add=a)
    else:
        fused = lambda x, w, bb: upsample_nearest_conv3x3_gn_vjp(x, w, bb)
        args = (x, w, bias)
        ref = lambda x, w, bb: _ref(x, w, bb)

    # forward parity
    y_f, s_f = fused(*args)
    y_r, s_r = ref(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), atol=2e-3, rtol=2e-4)

    g_f = jax.grad(scal(fused), argnums=tuple(range(len(args))))(*args)
    g_r = jax.grad(scal(ref), argnums=tuple(range(len(args))))(*args)
    for a, b_, name in zip(g_f, g_r, ["x", "add", "w", "bias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_upsample_grads_under_jit_and_remat():
    b, h, w_, c, o = 2, 4, 4, 8, 8
    x = _rand((b, h, w_, c), 0)
    w = _rand((3, 3, c, o), 1) * 0.2
    bias = _rand((o,), 2) * 0.1

    @jax.jit
    def loss(x, w, bias):
        f = jax.checkpoint(
            lambda *a: upsample_nearest_conv3x3_gn_vjp(*a)[0]
        )
        return jnp.sum(f(x, w, bias) ** 2)

    g = jax.grad(loss)(x, w, bias)
    assert np.isfinite(np.asarray(g)).all()


from vqvae_from_gaussian_vae_tpu.ops.downsample_conv import (
    downsample_conv3x3_gn_add_vjp,
    downsample_conv3x3_gn_vjp,
)


def _ref_down(x, w, bias, add=None):
    xin = x if add is None else x + add
    xp = jnp.pad(xin, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    yf = y.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))], axis=1
    )
    return y, stats


@pytest.mark.parametrize("with_add", [False, True])
def test_fused_downsample_grads_match_xla(with_add):
    b, h, w_, c, o = 2, 8, 8, 8, 8
    x = _rand((b, h, w_, c), 10)
    add = _rand((b, h, w_, c), 11) if with_add else None
    w = _rand((3, 3, c, o), 12) * 0.2
    bias = _rand((o,), 13) * 0.1
    ry = _rand((b, h // 2, w_ // 2, o), 14)
    rs = _rand((b, 2, o), 15) * 0.01

    def scal(fn):
        def f(*args):
            y, stats = fn(*args)
            return jnp.sum(y.astype(jnp.float32) * ry) + jnp.sum(stats * rs)
        return f

    if with_add:
        fused = lambda x, a, w, bb: downsample_conv3x3_gn_add_vjp(x, a, w, bb)
        args = (x, add, w, bias)
        ref = lambda x, a, w, bb: _ref_down(x, w, bb, add=a)
    else:
        fused = lambda x, w, bb: downsample_conv3x3_gn_vjp(x, w, bb)
        args = (x, w, bias)
        ref = lambda x, w, bb: _ref_down(x, w, bb)

    y_f, s_f = fused(*args)
    y_r, s_r = ref(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), atol=2e-3, rtol=2e-4)

    g_f = jax.grad(scal(fused), argnums=tuple(range(len(args))))(*args)
    g_r = jax.grad(scal(ref), argnums=tuple(range(len(args))))(*args)
    for a, b_, name in zip(g_f, g_r, ["x", "add", "w", "bias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_pallas_bwd_matches_conv_bwd_multiband():
    """Direct parity between the Pallas dgrad/wgrad kernels and the
    conv-form adjoint on shapes with multiple row bands (exercises the
    band halos and the wgrad's cross-band accumulation)."""
    from vqvae_from_gaussian_vae_tpu.ops import upsample_conv as U

    b, h, w_, c, o = 2, 16, 16, 8, 8
    x = _rand((b, h, w_, c), 20)
    w = _rand((3, 3, c, o), 21) * 0.2
    bias = _rand((o,), 22) * 0.1
    y, stats = U.upsample_nearest_conv3x3_gn(x, w, bias, interpret=True)
    gy = _rand((b, 2 * h, 2 * w_, o), 23)
    gstats = _rand((b, 2, o), 24) * 0.01

    dx_c, dw_c, db_c = U._upsample_bwd_conv(x, w, y, gy, gstats)
    # small block to force several bands through the accumulating kernels
    f32 = jnp.float32
    g = U._total_cotangent(y, gy, gstats)
    gt = jnp.transpose(g.astype(x.dtype), (1, 2, 0, 3))
    xt = jnp.transpose(x, (1, 2, 0, 3))
    k22, k22_vjp = jax.vjp(U.phase_kernels, w.astype(f32))
    k22t = jnp.swapaxes(k22, -1, -2).astype(x.dtype)
    dxt = U._upsample_dgrad(gt, k22t, c, 4, True)
    dx_p = jnp.transpose(dxt, (2, 0, 1, 3))
    dk22 = U._upsample_wgrad(xt, gt, 4, True)
    (dw_p,) = k22_vjp(dk22)

    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_c),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_c),
                               atol=2e-3, rtol=2e-4)


def test_pallas_down_bwd_matches_conv_bwd_multiband():
    from vqvae_from_gaussian_vae_tpu.ops import downsample_conv as D

    b, h, w_, c, o = 2, 16, 16, 8, 8
    x = _rand((b, h, w_, c), 30)
    w = _rand((3, 3, c, o), 31) * 0.2
    bias = _rand((o,), 32) * 0.1
    y, stats = D.downsample_conv3x3_gn(x, w, bias, interpret=True)
    gy = _rand((b, h // 2, w_ // 2, o), 33)
    gstats = _rand((b, 2, o), 34) * 0.01

    dx_c, dw_c, db_c = D._downsample_bwd_conv(x, w, y, gy, gstats)

    f32 = jnp.float32
    g = gy.astype(f32) + gstats[:, 0][:, None, None, :].astype(f32) \
        + 2.0 * y.astype(f32) * gstats[:, 1][:, None, None, :].astype(f32)
    gt = jnp.transpose(g.astype(x.dtype), (1, 2, 0, 3))
    xt = jnp.transpose(x, (1, 2, 0, 3))
    wt = jnp.swapaxes(w, -1, -2)
    dxt = D._downsample_dgrad(gt, wt, c, 2, True)   # several bands
    dx_p = jnp.transpose(dxt, (2, 0, 1, 3))
    dw_p = D._downsample_wgrad(xt, gt, 2, True)

    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_c),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_c),
                               atol=2e-3, rtol=2e-4)


def test_conv3x3_wgrad_matches_xla():
    from vqvae_from_gaussian_vae_tpu.ops.conv3x3_train import conv3x3_same_wg

    b, h, w_, c, o = 2, 16, 16, 8, 8
    x = _rand((b, h, w_, c), 40)
    w = _rand((3, 3, c, o), 41) * 0.2
    bias = _rand((o,), 42) * 0.1
    ry = _rand((b, h, w_, o), 43)

    def ref(x, w, bias):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        return jnp.sum(y * ry)

    def fused(x, w, bias):
        return jnp.sum(conv3x3_same_wg(x, w, bias) * ry)

    np.testing.assert_allclose(float(fused(x, w, bias)), float(ref(x, w, bias)),
                               rtol=1e-5)
    g_f = jax.grad(fused, argnums=(0, 1, 2))(x, w, bias)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(x, w, bias)
    for a, b_, name in zip(g_f, g_r, ["x", "w", "bias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4,
                                   err_msg=f"grad mismatch for {name}")


def test_conv3x3_wgrad_shards_over_batch():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vqvae_from_gaussian_vae_tpu.ops.conv3x3_train import conv3x3_same_wg

    mesh = Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))
    n = mesh.shape["data"]
    x = _rand((n, 8, 8, 8), 50)
    w = _rand((3, 3, 8, 8), 51) * 0.2
    bias = _rand((8,), 52) * 0.1
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def loss(x, w, bias):
        return jnp.sum(conv3x3_same_wg(x, w, bias) ** 2)

    g_sharded = jax.grad(loss, argnums=(0, 1, 2))(xs, w, bias)
    g_single = jax.grad(loss, argnums=(0, 1, 2))(x, w, bias)
    for a, r in zip(g_sharded, g_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-4, rtol=3e-4)
