"""Fused GroupNorm+swish+3x3-conv (+residual-add) Pallas TPU kernel, v2.

XLA cannot fuse elementwise producers into convolution operands on TPU, so
each ResnetBlock conv pair costs a GN-stats read, a normalize read+write,
and the conv read+write of the full-resolution activation
(`/root/reference/pit/modules/unet.py:100-157` is the torch original; the
XLA lowering of our NHWC port has the same pass structure).  Measured on
v5e (bs=16, bf16): the bare 3x3 conv at 256x256x128 runs at only ~103 TF/s
and the GN+swish pass adds ~2 ms per batch - together ~60% of peak.

This kernel streams row bands of the raw input and does everything in one
HBM pass: normalize (the GN statistics reduce to a per-(sample, channel)
affine computed in one cheap XLA reduction), swish, a column-im2col
(K = 3C) so the 3x3 conv becomes three large MXU matmuls per band, bias,
and the ResnetBlock residual add.

v1 of this kernel lost end-to-end (124 vs 183 img/s) because its manual
halo DMAs were start->wait serialized and its nine small per-tap matmuls
were VPU-relayout-bound.  v2 fixes both structurally:

  * every input is a *blocked* BlockSpec - the center band, two 1-row halo
    bands (index-mapped with clamping), and the optional residual - so the
    Pallas grid machinery double-buffers all fetches and the output
    write-back automatically; there is no hand-rolled DMA at all;
  * the column taps fold into the contraction dimension (one shifted-copy
    im2col to (rows, 3C)), leaving 3 matmuls of shape
    (block_h*W, 3C) x (3C, O) per band - MXU-shaped, fp32 accumulation.

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
    scale = gamma[None, :].astype(jnp.float32) * rstd_c
    shift = beta[None, :].astype(jnp.float32) - mean_c * scale
    return scale, shift


def _kernel(n_bands: int, block_h: int, has_residual: bool, *refs):
    if has_residual:
        (scale_ref, shift_ref, w3_ref, bias_ref, top_ref, ctr_ref, bot_ref,
         res_ref, out_ref, xc_ref) = refs
    else:
        (scale_ref, shift_ref, w3_ref, bias_ref, top_ref, ctr_ref, bot_ref,
         out_ref, xc_ref) = refs
    k = pl.program_id(0)
    bi = k // n_bands
    hi = k % n_bands
    bh = block_h
    wdim = out_ref.shape[2]
    o = out_ref.shape[3]
    c3 = w3_ref.shape[1]

    xb = jnp.concatenate([top_ref[0], ctr_ref[0], bot_ref[0]], axis=0)  # (bh+2, W, C)
    scale = scale_ref[bi][None, None, :]
    shift = shift_ref[bi][None, None, :]
    xn = xb.astype(jnp.float32) * scale + shift
    xn = xn * jax.nn.sigmoid(xn)  # swish
    # conv zero-padding applies AFTER gn+swish: zero the halo rows at the
    # image edges (the clamped index map made them duplicates of edge rows)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    valid = ~((rows == 0) & (hi == 0))
    valid &= ~((rows == bh + 1) & (hi == n_bands - 1))
    xn = jnp.where(valid, xn, 0.0).astype(xb.dtype)
    # column im2col: width halo as value pad, 3 shifted copies assembled in a
    # VMEM scratch (stores normalize the sublane offsets; a lane-concat of
    # offset slices is unsupported by Mosaic)
    xp = jnp.pad(xn, ((0, 0), (1, 1), (0, 0)))
    c = c3 // 3
    for kcol in range(3):
        xc_ref[:, :, kcol * c:(kcol + 1) * c] = xp[:, kcol:kcol + wdim]

    acc = jnp.zeros((bh * wdim, o), jnp.float32)
    for a in range(3):
        tile = xc_ref[a:a + bh].reshape(bh * wdim, c3)
        acc = acc + jnp.dot(tile, w3_ref[a], preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0].astype(jnp.float32)[None, :]
    if has_residual:
        acc = acc + res_ref[0].reshape(bh * wdim, o).astype(jnp.float32)
    out_ref[0] = acc.reshape(bh, wdim, o).astype(out_ref.dtype)


def fused_gn_swish_conv(x, gamma, beta, w, bias, num_groups: int = 32,
                        block_h: int = 32, interpret=None, residual=None):
    """GN(num_groups)+swish+3x3 same-pad conv (+residual add) in one pass.

    interpret=None auto-selects interpreter mode off-TPU so the fused flag
    works everywhere (CI runs on CPU).  block_h shrinks until the band fits
    the VMEM budget and divides H.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wd, c = x.shape
    o = w.shape[-1]
    itemsize = x.dtype.itemsize

    def vmem_bytes(bh):
        band = (bh + 2) * wd
        return (
            2 * bh * wd * c * itemsize        # center (double-buffered)
            + 4 * wd * c * itemsize           # halo rows
            + band * c * 4                    # fp32 normalized temp
            + band * 3 * c * itemsize         # im2col
            + bh * wd * o * 4                 # accumulator
            + 2 * bh * wd * o * itemsize      # out (double-buffered)
            + (2 * bh * wd * o * itemsize if residual is not None else 0)
            + 3 * 3 * c * o * itemsize        # weights
        )

    while block_h > 8 and (vmem_bytes(block_h) > 11 * 2**20 or h % block_h):
        block_h //= 2
    while h % block_h:
        block_h //= 2
    assert block_h >= 1, (h, block_h)
    return _fused_gn_swish_conv(
        x, gamma, beta, w, bias, residual, num_groups, block_h, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("num_groups", "block_h", "interpret")
)
def _fused_gn_swish_conv(
    x: jax.Array,       # (B, H, W, C)
    gamma: jax.Array,   # (C,) GroupNorm scale
    beta: jax.Array,    # (C,) GroupNorm bias
    w: jax.Array,       # (3, 3, C, O) conv kernel (HWIO)
    bias: jax.Array,    # (O,)
    residual,           # optional (B, H, W, O) added to the conv output
    num_groups: int = 32,
    block_h: int = 32,
    interpret: bool = False,
) -> jax.Array:
    b, h, wd, c = x.shape
    o = w.shape[-1]
    assert h % block_h == 0, (h, block_h)
    n_bands = h // block_h
    scale, shift = gn_affine(x, gamma, beta, num_groups)
    dtype = x.dtype
    w3 = w.astype(dtype).reshape(3, 3 * c, o)

    # block index maps (1-D grid k = bi * n_bands + hi); halo rows clamp at
    # the image edges and get zero-masked in-kernel
    def ctr_map(k):
        return (k // n_bands, k % n_bands, 0, 0)

    def top_map(k):
        hi = k % n_bands
        return (k // n_bands, jnp.maximum(hi * block_h - 1, 0), 0, 0)

    def bot_map(k):
        hi = k % n_bands
        return (k // n_bands, jnp.minimum((hi + 1) * block_h, h - 1), 0, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (B, C)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # shift (B, C)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w3 (3, 3C, O)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, O)
        pl.BlockSpec((1, 1, wd, c), top_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_h, wd, c), ctr_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wd, c), bot_map, memory_space=pltpu.VMEM),
    ]
    args = [scale, shift, w3, bias.reshape(1, o), x, x, x]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, block_h, wd, o), ctr_map, memory_space=pltpu.VMEM))
        args.append(residual)

    out = pl.pallas_call(
        functools.partial(_kernel, n_bands, block_h, residual is not None),
        grid=(b * n_bands,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_h, wd, o), ctr_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, o), dtype),
        scratch_shapes=[pltpu.VMEM((block_h + 2, wd, 3 * c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wd * 9 * c * o,
            bytes_accessed=b * h * wd * (c + 2 * o) * itemsize_of(dtype),
            transcendentals=b * h * wd * c,
        ),
        interpret=interpret,
    )(*args)
    return out


def itemsize_of(dtype) -> int:
    return jnp.dtype(dtype).itemsize
