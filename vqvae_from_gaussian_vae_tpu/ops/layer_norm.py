"""Fused Pallas LayerNorm for the ViT backbones.

XLA lowers each nn.LayerNorm at the bsqvit shape ((8, 1024, 768) bf16) to a
convert+reduce (mean), a multiply+reduce (variance) and a normalize pass —
~0.24 ms per norm, ~30 ms per GAN train pair across the ~100 norm ops
(trace: the `convert_reduce_fusion`/`multiply_reduce_fusion` buckets track
the 48 per-phase LNs almost 1:1).  This kernel does the whole norm in one
VMEM-resident pass (~0.06 ms of HBM traffic at that shape), and the
backward recomputes the row statistics in-kernel instead of saving
residuals, so the only extra HBM traffic of training is re-reading x.

`layer_norm_add` fuses the pre-LN transformer's residual add into the
norm's read: (s, y) = (x + delta, LN(x + delta)); the summed stream `s` is
both the next residual input and the backward's only saved tensor.

All four entry points (fwd/bwd, with/without add) carry
`custom_partitioning` annotations: rows (the flattened batch*sequence dim)
shard over the mesh, scale/bias stay replicated, and the backward's
parameter grads psum over the row axis — same scheme as the resample
kernels (ops/downsample_conv.py).

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
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_from_gaussian_vae_tpu.ops.partition import batch_axis_of


def _pick_block_r(r: int, c: int) -> int:
    # keep the ~4-buffer working set within ~6 MiB VMEM; the kernels
    # compute in f32 regardless of IO dtype, so the bound is f32-sized
    budget = 6 * 1024 * 1024
    for br in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if r % br == 0 and 4 * br * c * 4 <= budget:
            return br
    return 1


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


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


def _ln_add_fwd_kernel(x_ref, d_ref, g_ref, b_ref, s_ref, y_ref, *, eps):
    s_out = (x_ref[...].astype(jnp.float32)
             + d_ref[...].astype(jnp.float32)).astype(s_ref.dtype)
    s_ref[...] = s_out
    # statistics from the ROUNDED stream: the backward recomputes them
    # from the saved s, and the unfused path norms the already-rounded sum
    # — both must see the same values
    s = s_out.astype(jnp.float32)
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


# --------------------------------------------------------------------------
# 2-D pallas_call impls (operate on (rows, C); rows = flattened batch dims)
# --------------------------------------------------------------------------


def _row_spec(br, c):
    return pl.BlockSpec((br, c), lambda i: (i, 0))


def _rep_spec(c):
    return pl.BlockSpec((1, c), lambda i: (0, 0))


def _ln_fwd_2d(x2, g2, b2, eps, interpret):
    r, c = x2.shape
    br = _pick_block_r(r, c)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[_row_spec(br, c), _rep_spec(c), _rep_spec(c)],
        out_specs=_row_spec(br, c),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=interpret,
    )(x2, g2, b2)


def _ln_bwd_2d(x2, g2, dy2, eps, interpret):
    r, c = x2.shape
    br = _pick_block_r(r, c)
    return pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[_row_spec(br, c), _rep_spec(c), _row_spec(br, c)],
        out_specs=[_row_spec(br, c), _rep_spec(c), _rep_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2, g2, dy2)


def _ln_add_fwd_2d(x2, d2, g2, b2, eps, interpret):
    r, c = x2.shape
    br = _pick_block_r(r, c)
    return pl.pallas_call(
        functools.partial(_ln_add_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[_row_spec(br, c), _row_spec(br, c), _rep_spec(c),
                  _rep_spec(c)],
        out_specs=[_row_spec(br, c), _row_spec(br, c)],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x2.dtype),
            jax.ShapeDtypeStruct((r, c), x2.dtype),
        ],
        interpret=interpret,
    )(x2, d2, g2, b2)


def _ln_add_bwd_2d(s2, g2, dy2, dsin2, eps, interpret):
    r, c = s2.shape
    br = _pick_block_r(r, c)
    return pl.pallas_call(
        functools.partial(_ln_add_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[_row_spec(br, c), _rep_spec(c), _row_spec(br, c),
                  _row_spec(br, c)],
        out_specs=[_row_spec(br, c), _rep_spec(c), _rep_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), s2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s2, g2, dy2, dsin2)


# --------------------------------------------------------------------------
# GSPMD partitioning: rows shard over the mesh, scale/bias replicate, the
# backward's parameter grads psum over the row axis (same scheme as the
# resample kernels' wgrad).
# --------------------------------------------------------------------------


def _make_ln_cp(impl, op_kinds, out_kinds):
    """One custom_partitioning builder for all four LN entry points.

    `op_kinds` / `out_kinds` mark each operand/output as "row" (a
    row-sharded (rows, C) array), "rep" (a replicated (1, C) param), or —
    outputs only — "reduced" (a (1, C) per-shard partial the lowered
    function psums over the row axis: the backward's parameter grads).
    The trailing (eps, interpret) args are static.
    """
    n = len(op_kinds)
    cp = custom_partitioning(impl, static_argnums=(n, n + 1))

    def shardings(mesh, r_ax, kinds):
        row = NamedSharding(mesh, P(r_ax, None))
        rep = NamedSharding(mesh, P())
        return tuple(row if k == "row" else rep for k in kinds)

    def infer(*args):
        mesh, arg_infos = args[-3], args[-2]
        r_ax = batch_axis_of(arg_infos[0], 0)
        out = shardings(mesh, r_ax, out_kinds)
        return out if len(out) > 1 else out[0]

    def partition(*args):
        mesh, arg_infos = args[-3], args[-2]
        eps, interpret = args[0], args[1]
        r_ax = batch_axis_of(arg_infos[0], 0)

        def lower(*arrs):
            res = impl(*arrs, eps, interpret)
            if r_ax is None or not isinstance(res, (tuple, list)):
                return res
            return tuple(
                jax.lax.psum(o, r_ax) if k == "reduced" else o
                for o, k in zip(res, out_kinds))

        out_sh = shardings(mesh, r_ax, out_kinds)
        return (mesh, lower, out_sh if len(out_sh) > 1 else out_sh[0],
                shardings(mesh, r_ax, op_kinds))

    counter = iter(range(32))

    def dims(kinds):
        return tuple(("r", "c") if k == "row" else (f"u{next(counter)}", "c")
                     for k in kinds)

    op_dims = dims(op_kinds)
    out_dims = dims(out_kinds)
    units = tuple(d[0] for d in op_dims + out_dims if d[0] != "r")
    rule = SdyShardingRule(op_dims, out_dims,
                           need_replication_factors=("c",) + units)
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


_LN_FWD_CP = _make_ln_cp(_ln_fwd_2d, ("row", "rep", "rep"), ("row",))
_LN_BWD_CP = _make_ln_cp(_ln_bwd_2d, ("row", "rep", "row"),
                         ("row", "reduced", "reduced"))
_LN_ADD_FWD_CP = _make_ln_cp(_ln_add_fwd_2d, ("row", "row", "rep", "rep"),
                             ("row", "row"))
_LN_ADD_BWD_CP = _make_ln_cp(_ln_add_bwd_2d, ("row", "rep", "row", "row"),
                             ("row", "reduced", "reduced"))


# --------------------------------------------------------------------------
# public custom-VJP entry points (arbitrary leading dims)
# --------------------------------------------------------------------------


def _flat(x):
    c = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    return x.reshape(r, c), c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm(x, scale, bias, eps: float = 1e-5, interpret: bool = False):
    """y = (x - mean) * rsqrt(var + eps) * scale + bias over the last axis.

    x: (..., C) with C a multiple of 128; scale/bias: (C,).
    """
    return _ln_fwd(x, scale, bias, eps, interpret)[0]


def _ln_fwd(x, scale, bias, eps, interpret):
    x2, c = _flat(x)
    y = _LN_FWD_CP(x2, scale.reshape(1, c), bias.reshape(1, c), eps,
                   interpret)
    return y.reshape(x.shape), (x, scale)


def _ln_bwd(eps, interpret, res, dy):
    x, scale = res
    x2, c = _flat(x)
    dy2, _ = _flat(dy)
    dx, dg, db = _LN_BWD_CP(x2, scale.reshape(1, c), dy2, eps, interpret)
    return (dx.reshape(x.shape), dg.reshape(scale.shape).astype(scale.dtype),
            db.reshape(scale.shape).astype(scale.dtype))


layer_norm.defvjp(_ln_fwd, _ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def layer_norm_add(x, delta, scale, bias, eps: float = 1e-5,
                   interpret: bool = False):
    """(s, y) = (x + delta, LayerNorm(x + delta)) in one fused pass."""
    return _ln_add_fwd(x, delta, scale, bias, eps, interpret)[0]


def _ln_add_fwd(x, delta, scale, bias, eps, interpret):
    x2, c = _flat(x)
    d2, _ = _flat(delta)
    s, y = _LN_ADD_FWD_CP(x2, d2, scale.reshape(1, c), bias.reshape(1, c),
                          eps, interpret)
    s = s.reshape(x.shape)
    return (s, y.reshape(x.shape)), (s, scale)


def _ln_add_bwd(eps, interpret, res, cots):
    s, scale = res
    ds_in, dy = cots
    s2, c = _flat(s)
    dy2, _ = _flat(dy)
    dsin2, _ = _flat(ds_in)
    dx, dg, db = _LN_ADD_BWD_CP(s2, scale.reshape(1, c), dy2, dsin2, eps,
                                interpret)
    dx = dx.reshape(s.shape)
    return (dx, dx,
            dg.reshape(scale.shape).astype(scale.dtype),
            db.reshape(scale.shape).astype(scale.dtype))


layer_norm_add.defvjp(_ln_add_fwd, _ln_add_bwd)
