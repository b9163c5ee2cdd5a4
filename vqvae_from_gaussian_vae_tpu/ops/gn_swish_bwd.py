"""Fused GroupNorm(32)+swish BACKWARD for the UNet training path (the
round-4 verdict's "GN-dgrad spike", measured in vivo either way).

Forward stays plain XLA (GN statistics keep riding the producer conv's
epilogue and normalize+swish keep fusing into the consumer conv — the
round-2 lesson that naive Pallas forward insertions regress).  Only the
backward routes through ONE two-phase Pallas kernel.

What XLA does for this backward (optimized HLO, sd3unet ae step): a
stats fusion reads the conv-dgrad cotangent dy and the saved x, applies
the swish backward, and MATERIALISES the intermediate dh_gn
(`convert_reduce_fusion` multi-output: per-(b,c) sums + a full
bf16[B,H,W,C] array) that the apply fusion then re-reads along with x to
produce dx — 6 full traversals of the activation per site (2+1 stats,
2+1 apply).  XLA cannot do better structurally: the apply needs global
per-(b,g) means of dh_gn, so dh_gn is either materialised or recomputed,
and TPU fusions cannot span the reduction.

This kernel picks the RECOMPUTE branch and makes it cheap: a 2-phase
grid (B, 2, H-bands) reads x and dy twice each entirely in VMEM bands —
phase 0 accumulates the per-channel sums (whose group-weighted
combinations are the GN-backward constants, plus dgamma/dbeta), phase 1
recomputes dh_gn in VMEM and writes dx — 5 traversals, no intermediate.
Group sums ride two tiny one-hot matmuls (C,G)/(G,C) so no lane-dim
reshapes are needed.

Gated by GVQ_GN_BWD=1 in models/unet.py (experiment; ship/remove by the
bench_train measurement, docs/kernels.md round 5).  Reference math:
`/root/reference/pit/modules/unet.py:49-57,100-157` (GroupNorm(32,
eps=1e-6) + x*sigmoid(x)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_swish_ref(x, scale, bias, num_groups, eps):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3))
    var = jnp.mean(xf * xf, axis=(1, 3)) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=1)
    xhat = (x.astype(jnp.float32) - mean_c[:, None, None, :]) \
        * rstd_c[:, None, None, :]
    hpre = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = hpre * jax.nn.sigmoid(hpre)
    return y.astype(x.dtype), (mean_c, rstd_c)


def _bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, g_ref, b_ref,
                cg_ref, gc_ref, dx_ref, dg_ref, db_ref,
                s1_ref, s2_ref, c1_ref, c2_ref, tg_ref, tb_ref,
                *, n_bands, n_b, inv_n):
    bi = pl.program_id(0)
    phase = pl.program_id(1)
    hi = pl.program_id(2)

    x = x_ref[0].astype(jnp.float32)          # (bh, W, C)
    dy = dy_ref[0].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)    # (1, C)
    mean_c = mean_ref[0]                      # (1, C) this sample
    rstd_c = rstd_ref[0]
    xhat = (x - mean_c[None]) * rstd_c[None]
    hpre = xhat * gamma[None] + b_ref[...].astype(jnp.float32)[None]
    sig = jax.nn.sigmoid(hpre)
    dsw = sig * (1.0 + hpre * (1.0 - sig))    # d swish / d hpre
    dh = dy * dsw                             # cotangent at the GN output

    @pl.when(phase == 0)
    def _stats():
        p1 = jnp.sum(dh * xhat, axis=(0, 1))[None]   # (1, C)
        p2 = jnp.sum(dh, axis=(0, 1))[None]

        @pl.when(hi == 0)
        def _reset():
            s1_ref[...] = p1
            s2_ref[...] = p2

        @pl.when(hi != 0)
        def _acc():
            s1_ref[...] += p1
            s2_ref[...] += p2

    @pl.when((phase == 1) & (hi == 0))
    def _finalize():
        # group-weighted means via one-hot matmuls (no lane reshapes):
        # c2 = mean_g(dh*xhat*gamma) broadcast per channel, c1 likewise
        s1g = s1_ref[...] * g_ref[...].astype(jnp.float32)
        s2g = s2_ref[...] * g_ref[...].astype(jnp.float32)
        c2_ref[...] = jax.lax.dot(
            jax.lax.dot(s1g, cg_ref[...],
                        preferred_element_type=jnp.float32),
            gc_ref[...], preferred_element_type=jnp.float32) * inv_n
        c1_ref[...] = jax.lax.dot(
            jax.lax.dot(s2g, cg_ref[...],
                        preferred_element_type=jnp.float32),
            gc_ref[...], preferred_element_type=jnp.float32) * inv_n
        # dgamma/dbeta accumulate ACROSS samples
        @pl.when(bi == 0)
        def _treset():
            tg_ref[...] = s1_ref[...]
            tb_ref[...] = s2_ref[...]

        @pl.when(bi != 0)
        def _tacc():
            tg_ref[...] += s1_ref[...]
            tb_ref[...] += s2_ref[...]

    @pl.when(phase == 1)
    def _apply():
        dxhat = dh * gamma[None]
        dx = (dxhat - c1_ref[...][None] - xhat * c2_ref[...][None]) \
            * rstd_c[None]
        dx_ref[0] = dx.astype(dx_ref.dtype)

        @pl.when((bi == n_b - 1) & (hi == n_bands - 1))
        def _emit_params():
            dg_ref[...] = tg_ref[...]
            db_ref[...] = tb_ref[...]


def _pick_band(h, w, c, itemsize):
    # ~7 live f32 (bh, W, C) temporaries (xhat/hpre/sig/dsw/dh/dxhat/dx)
    # plus double-buffered bf16 x/dy/dx tiles; the first in-vivo compile
    # OOMed scoped VMEM at 16.83M with the old 2-array model
    budget = 14 * 1024 * 1024
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh == 0 and bh * w * c * (28 + 6 * itemsize) <= budget:
            return bh
    return 1


def _gn_swish_bwd_pallas(x, dy, mean_c, rstd_c, scale, bias, num_groups,
                         interpret):
    b, h, w, c = x.shape
    g = num_groups
    bh = _pick_band(h, w, c, jnp.dtype(x.dtype).itemsize)
    n_bands = h // bh
    inv_n = 1.0 / (h * w * (c // g))
    # one-hot group matrices (C,G) and (G,C) for in-kernel group sums
    cg = np.zeros((c, g), np.float32)
    cg[np.arange(c), np.arange(c) // (c // g)] = 1.0
    cg = jnp.asarray(cg)
    gc = cg.T

    band = pl.BlockSpec((1, bh, w, c), lambda bi, p, hi: (bi, hi, 0, 0))
    # the dx output pins block 0 during phase 0 (p*hi): the stats phase
    # writes nothing, and a map that moved with hi would flush one
    # uninitialised band per step — a whole garbage write traversal
    band_out = pl.BlockSpec((1, bh, w, c), lambda bi, p, hi: (bi, p * hi, 0, 0))
    # (B, 1, C) with a (1, 1, C) block: Mosaic requires the sublane
    # block dim to be 8-divisible OR equal to the array dim (1 here)
    perb = pl.BlockSpec((1, 1, c), lambda bi, p, hi: (bi, 0, 0))
    rep = pl.BlockSpec((1, c), lambda bi, p, hi: (0, 0))
    cg_spec = pl.BlockSpec((c, g), lambda bi, p, hi: (0, 0))
    gc_spec = pl.BlockSpec((g, c), lambda bi, p, hi: (0, 0))

    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, n_bands=n_bands, n_b=b, inv_n=inv_n),
        grid=(b, 2, n_bands),
        in_specs=[band, band, perb, perb, rep, rep, cg_spec, gc_spec],
        out_specs=[band_out, rep, rep],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        name=f"gn_swish_bwd_c{c}_bh{bh}",
        interpret=interpret,
    )(x, dy, mean_c.reshape(b, 1, c), rstd_c.reshape(b, 1, c),
      scale.reshape(1, c), bias.reshape(1, c), cg, gc)
    return dx, dg.reshape(c), db.reshape(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gn_swish(x, scale, bias, num_groups: int = 32, eps: float = 1e-6,
             interpret: bool = False):
    """swish(GroupNorm(x)*scale+bias) with a one-kernel Pallas backward.

    Forward is plain traced XLA (identical numerics to nn.GroupNorm +
    x*sigmoid(x), so the conv-epilogue fusions are untouched)."""
    return _gn_swish_ref(x, scale, bias, num_groups, eps)[0]


def _vjp_fwd(x, scale, bias, num_groups, eps, interpret):
    y, (mean_c, rstd_c) = _gn_swish_ref(x, scale, bias, num_groups, eps)
    return y, (x, scale, bias, mean_c, rstd_c)


def _vjp_bwd(num_groups, eps, interpret, res, dy):
    x, scale, bias, mean_c, rstd_c = res
    dx, dg, db = _gn_swish_bwd_pallas(x, dy, mean_c, rstd_c, scale, bias,
                                      num_groups, interpret)
    return dx, dg.astype(scale.dtype), db.astype(bias.dtype)


gn_swish.defvjp(_vjp_fwd, _vjp_bwd)
