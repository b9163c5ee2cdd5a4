"""Fused Pallas LayerNorm for the ViT backbones.

XLA lowers each nn.LayerNorm at the bsqvit shape ((8, 1024, 768) bf16) to a
convert+reduce (mean), a multiply+reduce (variance) and a normalize pass —
~0.24 ms per norm, ~30 ms per GAN train pair across the ~100 norm ops
(trace: the `convert_reduce_fusion`/`multiply_reduce_fusion` buckets track
the 48 per-phase LNs almost 1:1).  This kernel does the whole norm in one
VMEM-resident pass (~0.06 ms of HBM traffic at that shape), and the
backward recomputes the row statistics in-kernel instead of saving
residuals, so the only extra HBM traffic of training is re-reading x.

Used by models/vit.py's FusedLayerNorm wrapper (parameter-compatible with
flax nn.LayerNorm: scale/bias over the last axis); non-TPU backends run in
interpret mode only under tests — the wrapper falls back to nn.LayerNorm
off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_r(r: int, c: int, itemsize: int) -> int:
    # keep x/y/dy/dx tiles (f32 working set ~4 buffers) within ~6 MiB VMEM
    budget = 6 * 1024 * 1024
    for br in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if r % br == 0 and 4 * br * c * 4 <= budget:
            return br
    return 1


def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    y_ref[...] = (xc * rstd * g + b).astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    step = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    wdy = dy * g
    c1 = jnp.mean(wdy, axis=1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=1, keepdims=True)
    dx_ref[...] = ((wdy - c1 - xhat * c2) * rstd).astype(dx_ref.dtype)
    pg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    pb = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(step == 0)
    def _init():
        dg_ref[...] = pg
        db_ref[...] = pb

    @pl.when(step != 0)
    def _acc():
        dg_ref[...] += pg
        db_ref[...] += pb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """y = (x - mean) * rsqrt(var + eps) * scale + bias over the last axis.

    x: (..., C) with C a multiple of 128; scale/bias: (C,).
    """
    return _ln_fwd(x, scale, bias, eps, interpret)[0]


def _ln_fwd_impl(x, scale, bias, eps, interpret):
    shape = x.shape
    c = shape[-1]
    r = 1
    for d in shape[:-1]:
        r *= d
    x2 = x.reshape(r, c)
    br = _pick_block_r(r, c, jnp.dtype(x.dtype).itemsize)
    g2 = scale.reshape(1, c)
    b2 = bias.reshape(1, c)
    y = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x2, g2, b2)
    return y.reshape(shape)


def _ln_fwd(x, scale, bias, eps, interpret):
    return _ln_fwd_impl(x, scale, bias, eps, interpret), (x, scale)


def _ln_bwd(eps, interpret, res, dy):
    x, scale = res
    shape = x.shape
    c = shape[-1]
    r = 1
    for d in shape[:-1]:
        r *= d
    x2 = x.reshape(r, c)
    dy2 = dy.reshape(r, c)
    g2 = scale.reshape(1, c)
    br = _pick_block_r(r, c, jnp.dtype(x.dtype).itemsize)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((br, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, g2, dy2)
    return (dx.reshape(shape), dg.reshape(scale.shape).astype(scale.dtype),
            db.reshape(scale.shape).astype(scale.dtype))


layer_norm.defvjp(_ln_fwd, _ln_bwd)


# --------------------------------------------------------------------------
# Residual-add + LayerNorm:  s = x + delta;  y = LN(s)  in one pass.
#
# The pre-LN transformer's residual adds are standalone 25 MB elementwise
# passes once LN leaves XLA's fusion domain (trace: `add_add_fusion`,
# ~0.54 ms x 2/layer).  Folding the add into the LN kernel's read removes
# them; the summed stream `s` is returned because it is the next residual
# input (and serves as the backward's only saved tensor — stats are
# recomputed from it in-kernel).
# --------------------------------------------------------------------------


def _ln_add_fwd_kernel(x_ref, d_ref, g_ref, b_ref, s_ref, y_ref, *, eps):
    s = x_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32)
    s_ref[...] = s.astype(s_ref.dtype)
    mu = jnp.mean(s, axis=1, keepdims=True)
    xc = s - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    y_ref[...] = (xc * rstd * g + b).astype(y_ref.dtype)


def _ln_add_bwd_kernel(s_ref, g_ref, dy_ref, ds_in_ref, dx_ref, dg_ref,
                       db_ref, *, eps):
    step = pl.program_id(0)
    s = s_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(s, axis=1, keepdims=True)
    xc = s - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    wdy = dy * g
    c1 = jnp.mean(wdy, axis=1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=1, keepdims=True)
    dx = (wdy - c1 - xhat * c2) * rstd + ds_in_ref[...].astype(jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    pg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    pb = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(step == 0)
    def _init():
        dg_ref[...] = pg
        db_ref[...] = pb

    @pl.when(step != 0)
    def _acc():
        dg_ref[...] += pg
        db_ref[...] += pb


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def layer_norm_add(x, delta, scale, bias, eps: float = 1e-5,
                   interpret: bool = False):
    """(s, y) = (x + delta, LayerNorm(x + delta)) in one fused pass."""
    return _ln_add_fwd(x, delta, scale, bias, eps, interpret)[0]


def _ln_add_fwd(x, delta, scale, bias, eps, interpret):
    shape = x.shape
    c = shape[-1]
    r = 1
    for d in shape[:-1]:
        r *= d
    x2 = x.reshape(r, c)
    d2 = delta.reshape(r, c)
    g2 = scale.reshape(1, c)
    b2 = bias.reshape(1, c)
    br = _pick_block_r(r, c, jnp.dtype(x.dtype).itemsize)
    s, y = pl.pallas_call(
        functools.partial(_ln_add_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((br, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((r, c), x.dtype),
        ],
        interpret=interpret,
    )(x2, d2, g2, b2)
    s = s.reshape(shape)
    y = y.reshape(shape)
    return (s, y), (s, scale)


def _ln_add_bwd(eps, interpret, res, cots):
    s, scale = res
    ds_in, dy = cots
    shape = s.shape
    c = shape[-1]
    r = 1
    for d in shape[:-1]:
        r *= d
    s2 = s.reshape(r, c)
    dy2 = dy.reshape(r, c)
    dsin2 = ds_in.reshape(r, c)
    g2 = scale.reshape(1, c)
    br = _pick_block_r(r, c, jnp.dtype(s.dtype).itemsize)
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_add_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((br, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), s.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s2, g2, dy2, dsin2)
    dx = dx.reshape(shape)
    return (dx, dx,
            dg.reshape(scale.shape).astype(scale.dtype),
            db.reshape(scale.shape).astype(scale.dtype))


layer_norm_add.defvjp(_ln_add_fwd, _ln_add_bwd)
