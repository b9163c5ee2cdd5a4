"""Fused stride-2 3x3 downsample conv Pallas TPU kernel (phase matmuls).

The reference encoder downsamples with an asymmetric (0,1)x(0,1) pad and a
stride-2 VALID 3x3 conv (`/root/reference/pit/modules/unet.py:76-97`).
XLA's stride-2 conv runs far off the MXU roofline at the encoder shapes
(per-op trace on v5e, bs=16 bf16: 2.53 ms at 256->128 x128 = 15% MXU,
2.31 ms at 128->64 x256 = 34%).  Here the 9 taps are computed as 9 dense
(rows, C) x (C, O) MXU matmuls over strided phase views of the input band —
FLOP-exact (no 16/9 space-to-depth overhead) and fully dense.

Layout-preserving: the kernel computes on logically-(H, W, B, C) arrays —
XLA's {3,0,2,1} conv activation layout — so the wrapping transposes are
bitcasts and the surrounding conv+GN fusion regime is untouched (same trick
as ops/upsample_conv.py, see that module's docstring).  Like the upsample
kernel it emits per-sample channel (sum, sumsq) of the output so the
consumer GroupNorm needs no extra full-res pass.

Training uses the custom-VJP wrappers below (Pallas phase-algebra
backward with hwbc-resident residuals); GVQ_FUSED_TRAIN=0 opts training
back onto the plain XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_bands: int, block_h: int, with_stats: bool, with_add: bool,
            w_ref, bias_ref, *refs):
    """block_h = OUTPUT rows per program; the center block covers input rows
    [2*k*bh, 2*(k+1)*bh) plus a 1-row bottom halo (zero-masked at the image
    edge — the reference's bottom zero pad).  with_add fuses a residual sum
    of two operands in VMEM (the producing resblock's ``x + h``), saving the
    full-HBM materialisation XLA otherwise emits to feed the custom call."""
    k = pl.program_id(0)
    if with_add:
        ctr_ref, bot_ref, ctr2_ref, bot2_ref, out_ref, *stats_refs = refs
    else:
        ctr_ref, bot_ref, out_ref, *stats_refs = refs
    bh = block_h
    wdim = ctr_ref.shape[1]          # input W
    bsz = ctr_ref.shape[2]
    c = ctr_ref.shape[3]
    o = out_ref.shape[3]
    wo = wdim // 2

    ctr, bot = ctr_ref[:], bot_ref[:]
    if with_add:
        ctr = ctr + ctr2_ref[:]
        bot = bot + bot2_ref[:]
    xb = jnp.concatenate([ctr, bot], axis=0)  # (2bh+1, W, B, C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * bh + 1, 1, 1, 1), 0)
    valid = ~((rows == 2 * bh) & (k == n_bands - 1))  # row H is the zero pad
    xb = jnp.where(valid, xb, jnp.zeros_like(xb))
    # pad to even extents so phases split by reshape (Mosaic has no strided
    # vector slices): (2bh+2, W+2, B, C) -> (bh+1, 2, wo+1, 2, B, C); tap
    # (a, b) is then the unit-stride block [a//2 : a//2+bh, a%2, ...]
    xp = jnp.pad(xb, ((0, 1), (0, 2), (0, 0), (0, 0)))
    xq = xp.reshape(bh + 1, 2, wo + 1, 2, bsz, c)

    bias = bias_ref[0].astype(jnp.float32)[None, :]
    acc = jnp.zeros((bh * wo * bsz, o), jnp.float32)
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            tile = xq[a // 2:a // 2 + bh, a % 2, b // 2:b // 2 + wo, b % 2]
            acc = acc + jnp.dot(
                tile.reshape(bh * wo * bsz, c),
                w_ref[a, b],
                preferred_element_type=jnp.float32,
            )
    y = (acc + bias).reshape(bh, wo, bsz, o).astype(out_ref.dtype)
    out_ref[:] = y
    if with_stats:
        yf = y.astype(jnp.float32)
        s = jnp.sum(yf, axis=(0, 1))
        ss = jnp.sum(yf * yf, axis=(0, 1))
        stats_refs[0][0] = jnp.stack([s, ss], axis=1)  # (B, 2, O)


def _pick_block_h(xt, o, block_h, with_add=False):
    h, wd, bsz, c = xt.shape  # input dims; block_h counts OUTPUT rows
    itemsize = xt.dtype.itemsize
    h_out = h // 2
    nin = 2 if with_add else 1

    def vmem_bytes(bh):
        return bsz * itemsize * (
            nin * 2 * 2 * bh * wd * c        # center(s) (double-buffered)
            + nin * 2 * wd * c               # halo row(s)
            + (2 * bh + 1) * (wd + 1) * c    # padded band
            + bh * (wd // 2) * o * 2         # accumulator (f32)
            + 2 * bh * (wd // 2) * o         # out (double-buffered)
        ) + 9 * c * o * itemsize

    while block_h > 1 and (vmem_bytes(block_h) > 56 * 2**20 or h_out % block_h):
        block_h //= 2
    while h_out % block_h:
        block_h //= 2
    assert block_h >= 1, (h, block_h)
    return block_h


def downsample_conv3x3_gn(x, w, bias, add=None, block_h: int = 8, interpret=None):
    """Asym-pad stride-2 3x3 conv: (B,H,W,C) -> ((B,H/2,W/2,O), (B,2,O) f32
    output stats for the consumer's GroupNorm).  ``add`` fuses ``x + add``
    in VMEM first (the producer resblock's residual sum)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xt = jnp.transpose(x, (1, 2, 0, 3))  # (H, W, B, C): bitcast in {3,0,2,1}
    at = None if add is None else jnp.transpose(add, (1, 2, 0, 3))
    bh = _pick_block_h(xt, w.shape[-1], block_h, add is not None)
    if at is None:
        yt, stats = _DOWN_CP[False](xt, w, bias, bh, interpret)
    else:
        yt, stats = _DOWN_CP[True](xt, at, w, bias, bh, interpret)
    return jnp.transpose(yt, (2, 0, 1, 3)), jnp.sum(stats, axis=0)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret", "with_stats"))
def _downsample_conv(xt, at, w, bias, block_h: int, interpret: bool, with_stats: bool):
    h, wd, bsz, c = xt.shape
    o = w.shape[-1]
    h_out, w_out = h // 2, wd // 2
    assert h_out % block_h == 0, (h, block_h)
    n_bands = h_out // block_h
    dtype = xt.dtype
    with_add = at is not None

    def ctr_map(k):
        return (k, 0, 0, 0)

    def bot_map(k):
        # the input row just below the band, clamped at the image edge
        return (jnp.minimum((k + 1) * 2 * block_h, h - 1), 0, 0, 0)

    out_shapes = [jax.ShapeDtypeStruct((h_out, w_out, bsz, o), dtype)]
    out_specs = [pl.BlockSpec((block_h, w_out, bsz, o), ctr_map,
                              memory_space=pltpu.VMEM)]
    if with_stats:
        out_shapes.append(jax.ShapeDtypeStruct((n_bands, bsz, 2, o), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bsz, 2, o), lambda k: (k, 0, 0, 0),
                                      memory_space=pltpu.VMEM))

    ctr_spec = pl.BlockSpec((2 * block_h, wd, bsz, c), ctr_map,
                            memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec((1, wd, bsz, c), bot_map, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w (3, 3, C, O)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, O)
        ctr_spec, bot_spec,
    ]
    operands = [w.astype(dtype), bias.reshape(1, o).astype(dtype), xt, xt]
    if with_add:
        in_specs += [ctr_spec, bot_spec]
        operands += [at, at]

    res = pl.pallas_call(
        functools.partial(_kernel, n_bands, block_h, with_stats, with_add),
        grid=(n_bands,),
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shapes if with_stats else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h_out * w_out * 9 * c * o,
            bytes_accessed=(1 + with_add) * bsz * h * wd * c * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return res

# --------------------------------------------------------------------------
# training path: custom VJP with phase-algebra backward
# --------------------------------------------------------------------------

def _shifted(y, dr, dc):
    """out[i, j] = y[i+dr, j+dc], zero padded (dr, dc in {-1, 0})."""
    b, h, w, c = y.shape
    yp = jnp.pad(y, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return jax.lax.dynamic_slice(yp, (0, 1 + dr, 1 + dc, 0), (b, h, w, c))


def _downsample_bwd_conv(xin, w, y, gy, gstats):
    """Adjoint via two dense XLA convs (the fast path; the 9-matmul form in
    `_downsample_bwd_math` reads the cotangent 9x and loses to XLA).

    dgrad: the stride-2 adjoint phase-decomposes into a dense 2x2 conv of
    the cotangent with a parities-as-channels kernel K2[t_r, t_s, o,
    (pm,pn,c)] = w[pm+2-2t_r, pn+2-2t_s, c, o] (zero where out of range),
    followed by a depth-to-space interleave — no zero-stuffed hi-res conv.
    wgrad: XLA's native strided-conv weight gradient via linear_transpose
    of the forward conv (no forward recompute — conv is linear in w).
    """
    f32 = jnp.float32
    b, h, wd, c = xin.shape
    o = w.shape[-1]
    yf = y.astype(f32)
    g = gy.astype(f32)
    if gstats is not None:
        gs = gstats.astype(f32)
        g = g + gs[:, 0][:, None, None, :] + 2.0 * yf * gs[:, 1][:, None, None, :]
    wf = w.astype(f32)

    # ---- dx: 2x2 conv over g with parities-as-channels kernel
    k2 = jnp.zeros((2, 2, o, 2, 2, c), f32)
    for tr in (0, 1):
        for ts in (0, 1):
            for pm in (0, 1):
                for pn in (0, 1):
                    r, s = pm + 2 - 2 * tr, pn + 2 - 2 * ts
                    if r <= 2 and s <= 2:
                        k2 = k2.at[tr, ts, :, pm, pn, :].set(wf[r, s].T)
    dx4 = jax.lax.conv_general_dilated(
        g, k2.reshape(2, 2, o, 4 * c), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dx = dx4.reshape(b, h // 2, wd // 2, 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)

    # ---- dw: native strided wgrad via linear transpose
    xf = xin.astype(f32)
    xp = jnp.pad(xf, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def fwd_of_w(wv):
        return jax.lax.conv_general_dilated(
            xp, wv, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    (dw,) = jax.linear_transpose(
        fwd_of_w, jax.ShapeDtypeStruct(w.shape, f32))(g)
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return dx, dw, dbias


def _downsample_bwd_math(xin, w, y, gy, gstats):
    """Adjoint of the asym-pad stride-2 3x3 conv, phase-decomposed
    (reference/fallback; `_downsample_bwd_conv` is the wired fast path).

    dx parity-phase (pm, pn): taps r ≡ pm (mod 2), s ≡ pn contribute
    S((pm-r)/2, (pn-s)/2) @ w[r,s]^T where S shifts ybar — 9 dense aligned
    matmuls (FLOP-exact, like the forward kernel's 9 phase matmuls), then a
    parity interleave.  wgrad is 9 matmuls against the strided input views.
    """
    f32 = jnp.float32
    b, h, wd, c = xin.shape
    ho, wo = h // 2, wd // 2
    o = w.shape[-1]
    yf = y.astype(f32)
    g = gy.astype(f32)
    if gstats is not None:
        gs = gstats.astype(f32)
        g = g + gs[:, 0][:, None, None, :] + 2.0 * yf * gs[:, 1][:, None, None, :]
    wf = w.astype(f32)

    # ---- dx: 4 parity phases, interleaved back to (H, W)
    phases = {}
    for pm in (0, 1):
        for pn in (0, 1):
            acc = jnp.zeros((b, ho, wo, c), f32)
            for r in range(pm, 3, 2):
                for s in range(pn, 3, 2):
                    acc = acc + jnp.einsum(
                        "bijo,co->bijc",
                        _shifted(g, (pm - r) // 2, (pn - s) // 2),
                        wf[r, s])
            phases[(pm, pn)] = acc
    row0 = jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3)
    row1 = jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3)
    dx = jnp.stack([row0, row1], axis=2).reshape(b, h, wd, c)

    # ---- dw: strided input views x[2i+r, 2j+s]
    xf = xin.astype(f32)
    xq = xf.reshape(b, ho, 2, wo, 2, c)

    def view(r, s):
        vr = xq[:, :, r % 2, :, s % 2, :]
        if r == 2:
            vr = jnp.pad(vr, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
        if s == 2:
            vr = jnp.pad(vr, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        return vr

    dw = jnp.stack([
        jnp.stack([jnp.einsum("bijc,bijo->co", view(r, s), g) for s in range(3)])
        for r in range(3)
    ])
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return dx, dw, dbias


@jax.custom_vjp
def downsample_conv3x3_gn_vjp(x, w, bias):
    """Differentiable fused downsample (no residual add): Pallas phase
    kernel forward, phase-algebra adjoint backward."""
    return downsample_conv3x3_gn(x, w, bias)


def _down_vjp_fwd(x, w, bias):
    y, stats = downsample_conv3x3_gn(x, w, bias)
    # hwbc residuals: bitcasts in the {3,0,2,1} regime, so no dual-layout
    # copy of the activations is kept for the backward (see the upsample's
    # _up_vjp_fwd note)
    return (y, stats), (jnp.transpose(x, (1, 2, 0, 3)), w,
                        jnp.transpose(y, (1, 2, 0, 3)))


def _down_bwd_impl_t(xt, w, yt, gy, gstats):
    import os

    if os.environ.get("GVQ_DOWNSAMPLE_BWD", "pallas") == "conv":
        return _downsample_bwd_conv(
            jnp.transpose(xt, (2, 0, 1, 3)), w,
            jnp.transpose(yt, (2, 0, 1, 3)), gy, gstats)
    return _downsample_bwd_pallas_t(xt, w, yt, gy, gstats)


def _downsample_bwd_pallas_t(xt, w, yt, gy, gstats, interpret=None):
    """Pallas backward with hwbc-resident residuals (all elementwise math
    in (H, W, B, C) order; kernel operands need no layout change)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    h, wd, b, c = xt.shape
    o = w.shape[-1]
    gyt = jnp.transpose(gy, (1, 2, 0, 3)).astype(f32)
    if gstats is not None:
        gs = gstats.astype(f32)
        gyt = gyt + gs[:, 0][None, None, :, :]             + 2.0 * yt.astype(f32) * gs[:, 1][None, None, :, :]
    dbias = jnp.sum(gyt, axis=(0, 1, 2))
    gt = gyt.astype(xt.dtype)
    wt = jnp.swapaxes(w, -1, -2).astype(xt.dtype)

    itemsize = jnp.dtype(xt.dtype).itemsize
    bu = _pick_block_u(h // 2, wd // 2, b, c, o, itemsize)
    dxt = _DOWN_DGRAD_CP(gt, wt, c, bu, interpret)
    dx = jnp.transpose(dxt, (2, 0, 1, 3)).astype(f32)
    dw = _DOWN_WGRAD_CP(xt, gt, bu, interpret).astype(f32)
    return dx, dw, dbias


def _down_vjp_bwd(res, cot):
    xt, w, yt = res
    gy, gstats = cot
    dx, dw, dbias = _down_bwd_impl_t(xt, w, yt, gy, gstats)
    return (dx.astype(xt.dtype), dw.astype(w.dtype), dbias.astype(jnp.float32))


downsample_conv3x3_gn_vjp.defvjp(_down_vjp_fwd, _down_vjp_bwd)


@jax.custom_vjp
def downsample_conv3x3_gn_add_vjp(x, add, w, bias):
    """Differentiable fused downsample with the deferred residual add."""
    return downsample_conv3x3_gn(x, w, bias, add=add)


def _down_add_vjp_fwd(x, add, w, bias):
    y, stats = downsample_conv3x3_gn(x, w, bias, add=add)
    return (y, stats), (jnp.transpose(x, (1, 2, 0, 3)),
                        jnp.transpose(add, (1, 2, 0, 3)), w,
                        jnp.transpose(y, (1, 2, 0, 3)))


def _down_add_vjp_bwd(res, cot):
    xt, addt, w, yt = res
    gy, gstats = cot
    xint = (xt.astype(jnp.float32) + addt.astype(jnp.float32)).astype(xt.dtype)
    dx, dw, dbias = _down_bwd_impl_t(xint, w, yt, gy, gstats)
    return (dx.astype(xt.dtype), dx.astype(addt.dtype),
            dw.astype(w.dtype), dbias.astype(jnp.float32))


downsample_conv3x3_gn_add_vjp.defvjp(_down_add_vjp_fwd, _down_add_vjp_bwd)

# --------------------------------------------------------------------------
# GSPMD partitioning: shard the kernel over the batch dim of a mesh
# (same scheme as ops/upsample_conv.py — batch-elementwise in the
# (H, W, B, C) logical layout, spatial factors need replication)
# --------------------------------------------------------------------------

from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from vqvae_from_gaussian_vae_tpu.ops.partition import batch_axis_of


def _make_down_cp(with_add: bool):
    from jax.sharding import NamedSharding, PartitionSpec as P

    if with_add:
        def impl(xt, at, w, bias, block_h, interpret):
            return _downsample_conv(xt, at, w, bias, block_h, interpret, True)
    else:
        def impl(xt, w, bias, block_h, interpret):
            return _downsample_conv(xt, None, w, bias, block_h, interpret, True)

    nops = 4 if with_add else 3
    cp = custom_partitioning(impl, static_argnums=(nops, nops + 1))

    def infer(*args):
        mesh, arg_infos = args[-3], args[-2]
        b_ax = batch_axis_of(arg_infos[0], 2)
        return (NamedSharding(mesh, P(None, None, b_ax, None)),
                NamedSharding(mesh, P(None, b_ax, None, None)))

    def partition(*args):
        mesh, arg_infos = args[-3], args[-2]
        block_h, interpret = args[0], args[1]
        b_ax = batch_axis_of(arg_infos[0], 2)
        x_sh = NamedSharding(mesh, P(None, None, b_ax, None))
        rep = NamedSharding(mesh, P())
        arg_shardings = ((x_sh, x_sh, rep, rep) if with_add
                         else (x_sh, rep, rep))
        out_shardings = (NamedSharding(mesh, P(None, None, b_ax, None)),
                         NamedSharding(mesh, P(None, b_ax, None, None)))

        def lower(*ops):
            return impl(*ops, block_h, interpret)

        return mesh, lower, out_shardings, arg_shardings

    repl = ("h", "w", "c", "kh", "kw", "o", "h2", "w2", "nb", "s")
    if with_add:
        rule = SdyShardingRule(
            (("h", "w", "b", "c"), ("h", "w", "b", "c"),
             ("kh", "kw", "c", "o"), ("o",)),
            (("h2", "w2", "b", "o"), ("nb", "b", "s", "o")),
            need_replication_factors=repl)
    else:
        rule = SdyShardingRule(
            (("h", "w", "b", "c"), ("kh", "kw", "c", "o"), ("o",)),
            (("h2", "w2", "b", "o"), ("nb", "b", "s", "o")),
            need_replication_factors=repl)
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp


_DOWN_CP = {False: _make_down_cp(False), True: _make_down_cp(True)}

# --------------------------------------------------------------------------
# Pallas backward kernels (dgrad / wgrad) — same scheme as the upsample's
# (ops/upsample_conv.py): the minimal phase matmuls in VMEM instead of
# XLA's zero-stuffed/strided conv transposes.
# --------------------------------------------------------------------------

def _dgrad_kernel(n_bands: int, block_u: int, wt_ref, top_ref, ctr_ref, out_ref):
    """dx band kernel.  g blocks: top(1)+ctr(bu) covering g rows
    k*bu-1 .. (k+1)*bu-1; per parity phase (pm, pn) the taps r≡pm, s≡pn
    contribute shifted-g @ w[r,s]^T; phases interleave to (2bu, 2Wg)."""
    k = pl.program_id(0)
    bu = block_u
    wg = ctr_ref.shape[1]
    bsz = ctr_ref.shape[2]
    o = ctr_ref.shape[3]
    c = out_ref.shape[3]

    gb = jnp.concatenate([top_ref[:], ctr_ref[:]], axis=0)  # (bu+1, Wg, B, O)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bu + 1, 1, 1, 1), 0)
    gb = jnp.where((rows == 0) & (k == 0), jnp.zeros_like(gb), gb)
    gp = jnp.pad(gb, ((0, 0), (1, 0), (0, 0), (0, 0)))  # left col halo

    phases = []
    for pm in (0, 1):
        for pn in (0, 1):
            acc = jnp.zeros((bu * wg * bsz, c), jnp.float32)
            for r in range(pm, 3, 2):
                dr = (pm - r) // 2
                for s in range(pn, 3, 2):
                    dc = (pn - s) // 2
                    tile = gp[1 + dr:1 + dr + bu, 1 + dc:1 + dc + wg]
                    acc = acc + jnp.dot(
                        tile.reshape(bu * wg * bsz, o),
                        wt_ref[r, s],
                        preferred_element_type=jnp.float32,
                    )
            phases.append(acc.reshape(bu, wg, bsz, c).astype(out_ref.dtype))
    row0 = jnp.stack([phases[0], phases[1]], axis=2).reshape(bu, 2 * wg, bsz, c)
    row1 = jnp.stack([phases[2], phases[3]], axis=2).reshape(bu, 2 * wg, bsz, c)
    out_ref[:] = jnp.stack([row0, row1], axis=1).reshape(2 * bu, 2 * wg, bsz, c)


@functools.partial(jax.jit, static_argnames=("out_c", "block_u", "interpret"))
def _downsample_dgrad(gt, wt, out_c: int, block_u: int, interpret: bool):
    """gt (H/2, W/2, B, O) hwbc cotangent -> dx (H, W, B, C)."""
    hg, wg, bsz, o = gt.shape
    c = out_c
    assert hg % block_u == 0
    n_bands = hg // block_u

    def top_map(k):
        return (jnp.maximum(k * block_u - 1, 0), 0, 0, 0)

    def ctr_map(k):
        return (k, 0, 0, 0)

    res = pl.pallas_call(
        functools.partial(_dgrad_kernel, n_bands, block_u),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wt (3, 3, O, C)
            pl.BlockSpec((1, wg, bsz, o), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, wg, bsz, o), ctr_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * block_u, 2 * wg, bsz, c), ctr_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * hg, 2 * wg, bsz, c), gt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hg * wg * 9 * c * o,
            bytes_accessed=bsz * hg * wg * (o + 4 * c) * jnp.dtype(gt.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(wt, gt, gt)
    return res


def _wgrad_kernel(n_bands: int, block_u: int,
                  ctr_ref, bot_ref, gctr_ref, out_ref):
    """dw reduction: the forward kernel's strided x tiles against the
    cotangent band, 9 (C, rows)x(rows, O) matmuls accumulated into the
    (9, C, O) f32 output across sequential grid steps."""
    k = pl.program_id(0)
    bu = block_u
    wdim = ctr_ref.shape[1]
    bsz = ctr_ref.shape[2]
    c = ctr_ref.shape[3]
    o = gctr_ref.shape[3]
    wo = wdim // 2

    xb = jnp.concatenate([ctr_ref[:], bot_ref[:]], axis=0)  # (2bu+1, W, B, C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * bu + 1, 1, 1, 1), 0)
    xb = jnp.where((rows == 2 * bu) & (k == n_bands - 1),
                   jnp.zeros_like(xb), xb)
    xp = jnp.pad(xb, ((0, 1), (0, 2), (0, 0), (0, 0)))
    xq = xp.reshape(bu + 1, 2, wo + 1, 2, bsz, c)

    g = gctr_ref[:].reshape(bu * wo * bsz, o)
    parts = []
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            tile = xq[a // 2:a // 2 + bu, a % 2, b // 2:b // 2 + wo, b % 2]
            parts.append(jax.lax.dot_general(
                tile.reshape(bu * wo * bsz, c), g,
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


@functools.partial(jax.jit, static_argnames=("block_u", "interpret"))
def _downsample_wgrad(xt, gt, block_u: int, interpret: bool):
    """xt (H, W, B, C), gt (H/2, W/2, B, O) -> dw (3, 3, C, O) f32."""
    h, wdim, bsz, c = xt.shape
    o = gt.shape[3]
    hg = h // 2
    assert hg % block_u == 0
    n_bands = hg // block_u

    def ctr_map(k):
        return (k, 0, 0, 0)

    def bot_map(k):
        return (jnp.minimum((k + 1) * 2 * block_u, h - 1), 0, 0, 0)

    res = pl.pallas_call(
        functools.partial(_wgrad_kernel, n_bands, block_u),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((2 * block_u, wdim, bsz, c), ctr_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wdim, bsz, c), bot_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_u, wdim // 2, bsz, o), ctr_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, c, o), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hg * (wdim // 2) * 9 * c * o,
            bytes_accessed=bsz * h * wdim * c * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, xt, gt)
    return res.reshape(3, 3, c, o)


def _pick_block_u(hg, wg, bsz, c, o, itemsize, block_u=8):
    def vmem(bu):
        return (
            2 * bu * wg * bsz * o * itemsize        # g ctr (dbl)
            + 2 * 2 * bu * wg * bsz * c * itemsize  # dx out / x ctr (dbl)
            + bu * wg * bsz * c * 4                 # acc
            + (9 + 9) * c * o * 4                   # kernels + out
        )
    while block_u > 1 and (vmem(block_u) > 56 * 2**20 or hg % block_u):
        block_u //= 2
    while hg % block_u:
        block_u //= 2
    return block_u



# cp annotations for the backward kernels (same scheme as the upsample's:
# dgrad batch-passthrough; wgrad reduces over batch -> psum in the lowering)

def _make_down_dgrad_cp():
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(gt, wt, out_c, block_u, interpret):
        return _downsample_dgrad(gt, wt, out_c, block_u, interpret)

    cp = custom_partitioning(impl, static_argnums=(2, 3, 4))

    def infer(*args):
        mesh, arg_infos = args[-3], args[-2]
        b_ax = batch_axis_of(arg_infos[0], 2)
        return NamedSharding(mesh, P(None, None, b_ax, None))

    def partition(*args):
        mesh, arg_infos = args[-3], args[-2]
        out_c, block_u, interpret = args[0], args[1], args[2]
        b_ax = batch_axis_of(arg_infos[0], 2)
        g_sh = NamedSharding(mesh, P(None, None, b_ax, None))
        rep = NamedSharding(mesh, P())

        def lower(gt, wt):
            return impl(gt, wt, out_c, block_u, interpret)

        return mesh, lower, g_sh, (g_sh, rep)

    rule = SdyShardingRule(
        (("hg", "wg", "b", "o"), ("kh", "kw", "o", "c")),
        (("h", "w", "b", "c"),),
        need_replication_factors=("hg", "wg", "o", "kh", "kw", "c", "h", "w"))
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


def _make_down_wgrad_cp():
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(xt, gt, block_u, interpret):
        return _downsample_wgrad(xt, gt, block_u, interpret)

    cp = custom_partitioning(impl, static_argnums=(2, 3))

    def infer(*args):
        mesh = args[-3]
        return NamedSharding(mesh, P())

    def partition(*args):
        mesh, arg_infos = args[-3], args[-2]
        block_u, interpret = args[0], args[1]
        b_ax = batch_axis_of(arg_infos[0], 2)
        x_sh = NamedSharding(mesh, P(None, None, b_ax, None))
        rep = NamedSharding(mesh, P())

        def lower(xt, gt):
            part = impl(xt, gt, block_u, interpret)
            if b_ax is not None:
                part = jax.lax.psum(part, b_ax)
            return part

        return mesh, lower, rep, (x_sh, x_sh)

    rule = SdyShardingRule(
        (("h", "w", "b", "c"), ("hg", "wg", "b", "o")),
        (("kh", "kw", "c", "o"),),
        reduction_factors=("b",),
        need_replication_factors=("h", "w", "c", "hg", "wg", "o", "kh", "kw"))
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


_DOWN_DGRAD_CP = _make_down_dgrad_cp()
_DOWN_WGRAD_CP = _make_down_wgrad_cp()
