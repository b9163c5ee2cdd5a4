"""Training-path custom VJP for plain 3x3 same-pad convs: Pallas wgrad.

Per-op traces of the GAN train step (scripts/trace_top_ops.py) show XLA's
3x3-conv weight gradients running at ~32% MXU on the decoder's big
activations (10 ms each for the 256^2 x(256->128) and 128^2 x(512->256)
resblock convs at bs=16).  The weight gradient is 9 dense (C, rows) x
(rows, O) matmuls over shifted input tiles; this kernel computes them in
VMEM with the cotangent read once, accumulating a (9, C, O) f32 output
across sequential row-band grid steps — the same reduction pattern as the
resample wgrad kernels (ops/upsample_conv.py).

`conv3x3_same_wg(x, kernel, bias)` is the drop-in op: forward is XLA's
conv (inlined, so the conv+GN-stats fusion the decoder relies on is
untouched); backward keeps XLA's dgrad (dense and fine per the traces) and
routes only the wgrad through the Pallas kernel.  models/unet.py
ResnetBlock uses it on the bf16 TPU training path.
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
from vqvae_from_gaussian_vae_tpu.ops.partition import batch_axis_of


def _conv_same(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _wgrad_kernel(n_bands: int, block_h: int,
                  top_ref, ctr_ref, bot_ref, gctr_ref, out_ref):
    k = pl.program_id(0)
    bh = block_h
    wd = ctr_ref.shape[1]
    bsz = ctr_ref.shape[2]
    c = ctr_ref.shape[3]
    o = gctr_ref.shape[3]

    xb = jnp.concatenate([top_ref[:], ctr_ref[:], bot_ref[:]], axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1, 1), 0)
    valid = ~((rows == 0) & (k == 0))
    valid &= ~((rows == bh + 1) & (k == n_bands - 1))
    xb = jnp.where(valid, xb, jnp.zeros_like(xb))
    xp = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (0, 0)))

    g = gctr_ref[:].reshape(bh * wd * bsz, o)
    parts = []
    for r in (0, 1, 2):
        for s in (0, 1, 2):
            tile = xp[r:r + bh, s:s + wd]
            parts.append(jax.lax.dot_general(
                tile.reshape(bh * wd * bsz, c), g,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    upd = jnp.stack(parts, axis=0)  # (9, C, O)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = upd

    @pl.when(k > 0)
    def _acc():
        out_ref[:] = out_ref[:] + upd


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def _conv3x3_wgrad(xt, gt, block_h: int, interpret: bool):
    """xt (H, W, B, C), gt (H, W, B, O) hwbc -> dw (3, 3, C, O) f32."""
    h, wd, bsz, c = xt.shape
    o = gt.shape[3]
    assert h % block_h == 0
    n_bands = h // block_h

    def top_map(k):
        return (jnp.maximum(k * block_h - 1, 0), 0, 0, 0)

    def ctr_map(k):
        return (k, 0, 0, 0)

    def bot_map(k):
        return (jnp.minimum((k + 1) * block_h, h - 1), 0, 0, 0)

    res = pl.pallas_call(
        functools.partial(_wgrad_kernel, n_bands, block_h),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((1, wd, bsz, c), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, wd, bsz, c), ctr_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wd, bsz, c), bot_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, wd, bsz, o), ctr_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, c, o), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * 9 * c * o,
            bytes_accessed=bsz * h * wd * (c + o) * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, xt, xt, gt)
    return res.reshape(3, 3, c, o)


def _make_wgrad_cp():
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(xt, gt, block_h, interpret):
        return _conv3x3_wgrad(xt, gt, block_h, interpret)

    cp = custom_partitioning(impl, static_argnums=(2, 3))

    def infer(*args):
        mesh = args[-3]
        return NamedSharding(mesh, P())

    def partition(*args):
        mesh, arg_infos = args[-3], args[-2]
        block_h, interpret = args[0], args[1]
        b_ax = batch_axis_of(arg_infos[0], 2)
        x_sh = NamedSharding(mesh, P(None, None, b_ax, None))
        rep = NamedSharding(mesh, P())

        def lower(xt, gt):
            part = impl(xt, gt, block_h, interpret)
            if b_ax is not None:
                part = jax.lax.psum(part, b_ax)
            return part

        return mesh, lower, rep, (x_sh, x_sh)

    rule = SdyShardingRule(
        (("h", "w", "b", "c"), ("h", "w", "b", "o")),
        (("kh", "kw", "c", "o"),),
        reduction_factors=("b",),
        need_replication_factors=("h", "w", "c", "o", "kh", "kw"))
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


_WGRAD_CP = _make_wgrad_cp()


def _pick_block_h(h, wd, bsz, c, o, itemsize, block_h=8):
    def vmem(bh):
        return (
            2 * bh * wd * bsz * c * itemsize   # x ctr (dbl)
            + 2 * bh * wd * bsz * o * itemsize  # g ctr (dbl)
            + (bh + 2) * (wd + 2) * bsz * c * itemsize  # padded band
            + 2 * 9 * c * o * 4                # out + update
        )
    while block_h > 1 and (vmem(block_h) > 48 * 2**20 or h % block_h):
        block_h //= 2
    while h % block_h:
        block_h //= 2
    return block_h


@jax.custom_vjp
def conv3x3_same_wg(x, w, bias):
    """3x3 same-pad conv whose backward uses the Pallas wgrad kernel
    (forward and dgrad stay XLA)."""
    return _conv_same(x, w) + bias


def _fwd(x, w, bias):
    # the hwbc transpose is a bitcast in the {3,0,2,1} conv-layout regime;
    # saving xt avoids keeping a second-layout copy of x for the backward
    return _conv_same(x, w) + bias, (jnp.transpose(x, (1, 2, 0, 3)), w)


def _bwd(res, g):
    xt, w = res
    f32 = jnp.float32
    h, wd, bsz, c = xt.shape
    (dx,) = jax.linear_transpose(
        lambda t: _conv_same(t, w),
        jax.ShapeDtypeStruct((bsz, h, wd, c), xt.dtype))(g)
    gt = jnp.transpose(g, (1, 2, 0, 3))
    interpret = jax.default_backend() != "tpu"
    bh = _pick_block_h(h, wd, bsz, c, gt.shape[3],
                       jnp.dtype(xt.dtype).itemsize)
    dw = _WGRAD_CP(xt, gt, bh, interpret)
    dbias = jnp.sum(g.astype(f32), axis=(0, 1, 2))
    return (dx, dw.astype(w.dtype), dbias.astype(f32))


conv3x3_same_wg.defvjp(_fwd, _bwd)
