"""Fused GroupNorm+swish+3x3-conv Pallas kernel.

XLA cannot fuse elementwise producers into convolution operands, so each
ResnetBlock conv pair costs three full-resolution HBM passes (read for GN
stats, read+write for normalize/swish, read for the conv) plus the conv
write.  At the decoder's full-resolution levels this traffic - not FLOPs -
bounds throughput (docs/architecture.md).

This kernel folds the normalize+swish into the conv's input stream: the GN
statistics reduce to a per-(sample, channel) affine (scale, shift) computed
in one cheap XLA pass, and the kernel DMAs row-band halo blocks of the RAW
input from HBM, applies ``swish(x*scale+shift)`` in VMEM, and accumulates
the 3x3 conv as nine (rows*W, C) x (C, O) MXU matmuls.  Net effect: 2 of 5
full-res passes per conv disappear.

Halos: width is value-padded inside VMEM; height halos are two conditional
1-row DMAs so borders never read out of bounds.

Measured verdict (v5e, bs=16 flagship e2e, same tunnel state): 124 img/s
fused vs 183 img/s XLA - the hand-scheduled halo DMA + nine sequential
small-M matmuls lose to XLA's conv pipelining despite the saved passes, so
the ResnetBlock flag (models/unet.py fused_gn_conv) stays OFF by default.
Kept as a correct, CI-tested base for a revisit with double-buffered row
bands and wider accumulation tiles.

Inference-path only (no custom VJP); training uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_affine(x, gamma, beta, num_groups: int = 32, eps: float = 1e-6):
    """Per-(sample, channel) GN affine: returns (scale, shift) float32 of
    shape (B, C) such that GN(x)*gamma+beta == x*scale + shift."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))                     # (B, G)
    var = jnp.mean(xf * xf, axis=(1, 3)) - mean * mean   # (B, G)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)   # (B, C), group-major
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=1)
    scale = gamma[None, :] * rstd_c
    shift = beta[None, :] - mean_c * scale
    return scale, shift


def _kernel(h_total: int, block_h: int, x_ref, scale_ref, shift_ref, w_ref, b_ref,
            out_ref, xs, sems):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    bh = block_h
    wdim = out_ref.shape[2]  # out block is (1, block_h, W, O)

    # Row-band DMAs: scratch xs is (bh+2, W, C) holding raw input rows;
    # destination offsets touch only the untiled leading dim (Mosaic rejects
    # sublane-unaligned DMA slices, so the width halo is value-padded later).
    center = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(hi * bh, bh)], xs.at[pl.ds(1, bh)], sems.at[0]
    )
    center.start()

    @pl.when(hi > 0)
    def _():
        pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(hi * bh - 1, 1)], xs.at[pl.ds(0, 1)], sems.at[1]
        ).start()

    @pl.when(hi < n_h - 1)
    def _():
        pltpu.make_async_copy(
            x_ref.at[bi, pl.ds((hi + 1) * bh, 1)], xs.at[pl.ds(bh + 1, 1)], sems.at[2]
        ).start()

    center.wait()

    @pl.when(hi > 0)
    def _():
        pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(hi * bh - 1, 1)], xs.at[pl.ds(0, 1)], sems.at[1]
        ).wait()

    @pl.when(hi < n_h - 1)
    def _():
        pltpu.make_async_copy(
            x_ref.at[bi, pl.ds((hi + 1) * bh, 1)], xs.at[pl.ds(bh + 1, 1)], sems.at[2]
        ).wait()

    scale = scale_ref[bi][None, None, :]
    shift = shift_ref[bi][None, None, :]
    xn = xs[:].astype(jnp.float32) * scale + shift
    xn = (xn * jax.nn.sigmoid(xn)).astype(w_ref.dtype)  # swish
    # conv zero-padding applies AFTER gn+swish: zero the border rows when at
    # the image edges (interior halo rows carry real neighbour data)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, wdim, 1), 0)
    valid = ~((rows == 0) & (hi == 0))
    valid &= ~((rows == bh + 1) & (hi == n_h - 1))
    xn = jnp.where(valid, xn, jnp.zeros_like(xn))
    # width halo as a value-level pad (stays in VMEM)
    xn = jnp.pad(xn, ((0, 0), (1, 1), (0, 0)))

    c = xn.shape[-1]
    o = out_ref.shape[-1]
    acc = jnp.zeros((bh * wdim, o), jnp.float32)
    for a in range(3):
        for bcol in range(3):
            tile = xn[a : a + bh, bcol : bcol + wdim, :].reshape(bh * wdim, c)
            acc = acc + jnp.dot(tile, w_ref[a, bcol], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    out_ref[0] = acc.reshape(bh, wdim, o).astype(out_ref.dtype)


def fused_gn_swish_conv(x, gamma, beta, w, bias, num_groups: int = 32,
                        block_h: int = 32, interpret=None) -> jax.Array:
    """See _fused_gn_swish_conv; interpret=None auto-selects interpret mode
    off-TPU so the fused flag works everywhere (CI runs on CPU).  block_h is
    shrunk automatically until the kernel's live VMEM fits the ~16MB core
    budget (raw block bf16 + fp32 normalized copies + fp32 accumulator)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    o = w.shape[-1]

    def vmem_bytes(bh):
        block = (bh + 2) * wd * c
        return (
            block * x.dtype.itemsize      # raw scratch
            + 2 * block * 4               # normalized fp32 + padded copy
            + bh * wd * o * 4             # accumulator
            + bh * wd * o * x.dtype.itemsize  # out block
            + 9 * c * o * x.dtype.itemsize    # weights
        )

    while block_h > 8 and (vmem_bytes(block_h) > 12 * 2**20 or h % block_h):
        block_h //= 2
    return _fused_gn_swish_conv(x, gamma, beta, w, bias, num_groups, block_h, interpret)


@functools.partial(jax.jit, static_argnames=("num_groups", "block_h", "interpret"))
def _fused_gn_swish_conv(
    x: jax.Array,       # (B, H, W, C)
    gamma: jax.Array,   # (C,) GroupNorm scale
    beta: jax.Array,    # (C,) GroupNorm bias
    w: jax.Array,       # (3, 3, C, O) conv kernel (HWIO)
    bias: jax.Array,    # (O,)
    num_groups: int = 32,
    block_h: int = 32,
    interpret: bool = False,
) -> jax.Array:
    b, h, wd, c = x.shape
    o = w.shape[-1]
    assert h % block_h == 0, (h, block_h)
    scale, shift = gn_affine(x, gamma, beta, num_groups)
    dtype = x.dtype

    out = pl.pallas_call(
        functools.partial(_kernel, h, block_h),
        grid=(b, h // block_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM; halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (B, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (B, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w (3,3,C,O)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (O,)
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, wd, o), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, o), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h + 2, wd, c), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wd * 9 * c * o,
            bytes_accessed=(b * h * wd * (c + o)) * x.dtype.itemsize,
            transcendentals=b * h * wd * c,
        ),
        interpret=interpret,
    )(x, scale.astype(jnp.float32), shift.astype(jnp.float32), w.astype(dtype), bias)
    return out
