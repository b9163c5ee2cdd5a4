"""Layout-native TPU flash attention for the ViT backbones.

Takes q/k/v in packed ``(B, L, H*D)`` — the layout the QKV projection
already produces — instead of the conventional ``(B, H, L, D)``.  The
reference attention (vit.py:86 via nn.MultiheadAttention) and the stock
Pallas kernel both want head-major tensors, which costs four
(B, L, C) <-> (B, H, L, D) layout copies per transformer layer; at the
bsqvit operating shape (16x1024x12x64 bf16) each copy is a 25 MB HBM
round-trip that XLA cannot fuse away (measured: 72 copies x 0.13 ms =
9.4 ms of a 65 ms e2e forward).  Here every DMA is a dense row-major
tile of the packed array: the grid blocks the channel axis into
128-lane-aligned head groups and the per-head split is a static lane
slice inside the kernel.

The kernels exploit the tokenizer regime (L <= a few thousand, D a
multiple of 8): one head group's k/v rows fit VMEM whole, so the
forward computes an exact single-pass softmax (no online-softmax
accumulation, no l/m residuals) and the backward is ONE kernel producing
dq/dk/dv together, recomputing the softmax in-VMEM (cheaper than the HBM
traffic for residual l/m/di tensors).  Scope: unmasked, non-causal
self-attention — masked/video paths route through the einsum branch in
models/vit.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import (
    SdyShardingRule,
    custom_partitioning,
)
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_from_gaussian_vae_tpu.ops.partition import batch_axis_of

__all__ = ["flash_attention_blc", "flash_attention_qkv",
           "flash_blc_supported", "sdpa_token_major"]

_TRANS_B = (((1,), (1,)), ((), ()))  # contract dim1 of both: x @ y^T
_TRANS_A = (((0,), (0,)), ((), ()))  # contract dim0 of both: x^T @ y


def _aligned_groups(num_heads: int, head_dim: int) -> list:
    """Legal head-group sizes: the group's lane width must be a 128
    multiple, or the group must span the whole channel axis (a block
    equal to the array dim, which Pallas always accepts)."""
    groups = [g for g in range(1, num_heads + 1)
              if num_heads % g == 0 and (g * head_dim) % 128 == 0]
    return groups or [num_heads]


def _fwd_tiling(l: int, num_heads: int, head_dim: int, esize: int):
    """Joint (head group, block_q) search under a VMEM budget:
    double-buffered k/v + q/o tiles plus the fp32 score tiles (x3: the
    pipelined head loop keeps two probability tiles live) must stay
    under the 16 MB scoped limit with headroom for the compiler's own
    temporaries.  Prefer the widest group (one tensor core — grid
    granularity buys nothing, bulk amortizes overhead: hpb 2 -> 12
    measured 0.80 -> 0.75 ms at the bsqvit shape), then the largest
    block_q; at the bsqvit bf16 shape this picks hpb=12/bq=256, the
    fastest swept config (0.65 ms).  Returns (hpb, block_q) or None."""
    for g in reversed(_aligned_groups(num_heads, head_dim)):
        for bq in (1024, 512, 256, 128):
            if l % bq:
                continue
            est = (4 * l * g * head_dim * esize) \
                + (4 * bq * g * head_dim * esize) + (3 * bq * l * 4)
            if est <= 13 * 1024 * 1024:
                return g, bq
    return None


def flash_blc_supported(l: int, num_heads: int, head_dim: int, dtype) -> bool:
    """True when the forward kernel has a legal tiling for this shape:
    L a 128 multiple, D a multiple of 8, and one head group's k/v rows
    + a (block_q, L) fp32 score tile fitting VMEM.  Model code gates on
    this instead of hand-copied magic bounds (the einsum fallback serves
    everything else)."""
    if l % 128 or l == 0 or head_dim % 8:
        return False
    return _fwd_tiling(l, num_heads, head_dim,
                       jnp.dtype(dtype).itemsize) is not None


def sdpa_token_major(q, k, v, sm_scale: float = None):
    """softmax(q k^T * sm_scale) v over token-major (B, L, H, D) inputs,
    returning (B, L, H*D).

    The shared front door for every unmasked self-attention in the model
    zoo (flux MMDiT, hdit, the UNet's single-head AttnBlock): on TPU with
    bf16 values and a legal tiling it routes through the packed flash
    kernel — (B, L, H, D) reshapes freely to the kernel's (B, L, H*D),
    so no head-major transpose and no HBM (B, H, L, L) score tensor —
    and otherwise falls back to an einsum SDPA with fp32 softmax (also
    the exact-parity path for fp32 models).  GVQ_DISABLE_FUSED_KERNELS=1
    forces the fallback; GVQ_FLASH_INTERPRET=1 runs the kernel in
    interpret mode off-TPU for parity tests.
    """
    import os

    b, l, h, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    env = os.environ
    force_interp = (env.get("GVQ_FLASH_INTERPRET", "") == "1"
                    and jax.default_backend() != "tpu")
    if (
        v.dtype == jnp.bfloat16
        and (jax.default_backend() == "tpu" or force_interp)
        and flash_blc_supported(l, h, d, v.dtype)
        and env.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
    ):
        return flash_attention_blc(
            q.astype(v.dtype).reshape(b, l, h * d),
            k.astype(v.dtype).reshape(b, l, h * d),
            v.reshape(b, l, h * d), sm_scale, h, force_interp)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sm_scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(b, l, h * d)


def _pow2(x: float) -> bool:
    import math

    return x > 0 and math.log2(x).is_integer()


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, z_ref=None, *, sm_scale, heads):
    q = q_ref[0]  # (block_q, heads * D)
    k = k_ref[0]  # (L, heads * D)
    v = v_ref[0]
    d = q.shape[-1] // heads
    # fp32 operands are the exact-parity path: force full-precision MXU
    # passes (the default truncates fp32 dots to one bf16 pass — caught by
    # the on-TPU parity run).  bf16 operands must pin DEFAULT explicitly:
    # a global jax_default_matmul_precision=highest (the on-chip suite
    # mode) would otherwise reach into the kernel and ask Mosaic for an
    # fp32-contract tpu.matmul on bf16 tiles, which it rejects ("Bad lhs
    # type") — a bf16 dot is a single MXU pass at every precision anyway.
    prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    # power-of-two scales (every D = 4^k head) fold into the bf16 q tile
    # EXACTLY (pure exponent shift) — a (bq, D) multiply instead of the
    # (bq, L) fp32 score multiply, 16x less VPU traffic at D=64/L=1024
    q_fold = _pow2(sm_scale)
    # when D is not a 128 multiple the AV matmul's output lanes are
    # partially idle anyway — pad v with a ones block up to the next
    # 128 boundary so the softmax row-sum rides the SAME matmul for
    # free and the VPU sum pass disappears (measured 858 -> 810 us/layer
    # at the bsqvit shape; sum accumulates the bf16 p in fp32 on the MXU)
    pad = (-d) % 128

    def _probs(h):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl] * q.dtype.type(sm_scale) if q_fold else q[:, sl]
        s = lax.dot_general(qh, k[:, sl], _TRANS_B,
                            preferred_element_type=jnp.float32,
                            precision=prec)
        if not q_fold:
            s *= sm_scale
        m = jnp.max(s, axis=1)[:, None]
        p = jnp.exp(s - m)
        # normalization DEFERRED to the (bq, D) output: the (bq, L) divide
        # was the largest exposed VPU op in the head pipeline
        if pad:
            return p.astype(v.dtype), m
        return p.astype(v.dtype), (m, (1.0 / jnp.sum(p, axis=1))[:, None])

    ones = jnp.ones((k.shape[0], pad), v.dtype) if pad else None

    def _emit(h, p, aux):
        sl = slice(h * d, (h + 1) * d)
        if pad:
            m = aux
            vh = jnp.concatenate([v[:, sl], ones], axis=1)
            o = lax.dot(p, vh, preferred_element_type=jnp.float32,
                        precision=prec)
            inv_sum = 1.0 / o[:, d:d + 1]
            o = o[:, :d]
        else:
            m, inv_sum = aux
            o = lax.dot(p, v[:, sl], preferred_element_type=jnp.float32,
                        precision=prec)
        o_ref[0, :, sl] = (o * inv_sum).astype(o_ref.dtype)
        if z_ref is not None:
            # log-normalizer residual for the backward: z = m + ln(sum) =
            # m - ln(inv_sum); the bwd recomputes p = exp(s - z) with NO
            # max/sum reduce passes (s - z <= 0, so exp cannot overflow)
            z_ref[0, :, h:h + 1] = m - jnp.log(inv_sum)

    # software-pipeline the head loop: issue head h+1's QK^T/softmax
    # before head h's AV matmul so the VPU softmax overlaps MXU work
    # (measured at the bsqvit shape: 0.82 -> 0.65 ms, 32% -> 40% of peak).
    # Depth 1 is the decided depth: the round-4 variant lab measured a
    # 2-deep pipeline SLOWER (the extra live (bq, L) tile costs more
    # scheduling slack than the wider VPU window buys) and a no-softmax
    # control within noise of this kernel — the VPU work is already
    # hidden (scripts/exp_flash_variants.py, docs/kernels.md round 4).
    prev = _probs(0)
    for h in range(1, heads):
        cur = _probs(h)
        _emit(h - 1, *prev)
        prev = cur
    _emit(heads - 1, *prev)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, z_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                *, sm_scale, heads, num_q_blocks, num_groups, fwd_hpb,
                pipe_depth=2):
    q_idx = pl.program_id(2)
    g_idx = 0 if num_groups == 1 else pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, dk_scratch.dtype)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, dv_scratch.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    z = z_ref[0]  # (block_q, >=heads) fp32 log-normalizers from the fwd
    d = q.shape[-1] // heads
    # fp32 = exact-parity path: full-precision MXU passes; bf16 pins
    # DEFAULT so a global highest-precision override cannot inject an
    # fp32-contract matmul Mosaic rejects on bf16 tiles (see _fwd_kernel)
    prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
            else lax.Precision.DEFAULT)

    q_fold = _pow2(sm_scale)

    def _probs_ds(h):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        if q_fold:
            qh = qh * qh.dtype.type(sm_scale)
        s = lax.dot_general(qh, kh, _TRANS_B,
                            preferred_element_type=jnp.float32,
                            precision=prec)
        if not q_fold:
            s *= sm_scale
        # normalized probabilities straight from the fwd's log-normalizer:
        # no max reduce, no sum reduce — two fewer VPU passes over the
        # (bq, L) tile per head than the recompute-from-scratch form.
        # z lanes follow the FWD's head grouping (128 lanes per fwd group);
        # the bwd's own grouping may differ, so map through fwd_hpb.
        def _lane(gi):
            hg = gi * heads + h
            return (hg // fwd_hpb) * 128 + hg % fwd_hpb

        if num_groups == 1:
            zcol = z[:, _lane(0):_lane(0) + 1]
        else:
            # Mosaic has no dynamic value slice; num_groups is tiny, so
            # select among the static candidate lanes on the grid index
            zcol = z[:, _lane(0):_lane(0) + 1]
            for gi in range(1, num_groups):
                zcol = jnp.where(g_idx == gi,
                                 z[:, _lane(gi):_lane(gi) + 1], zcol)
        p = jnp.exp(s - zcol)
        dp = lax.dot_general(doh, vh, _TRANS_B,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        di = jnp.sum(doh.astype(jnp.float32) * o[:, sl].astype(jnp.float32),
                     axis=1)[:, None]
        ds = p * (dp - di) * sm_scale
        return p.astype(doh.dtype), ds.astype(qh.dtype)

    def _emit(h, pb, dsb):
        # x^T @ y via dimension numbers: the MXU takes the transposed
        # operand natively; an explicit .T materialises a VPU shuffle
        # (measured 4% slower end-to-end)
        sl = slice(h * d, (h + 1) * d)
        dv_scratch[:, sl] += lax.dot_general(
            pb, do[:, sl], _TRANS_A, preferred_element_type=jnp.float32,
            precision=prec)
        dk_scratch[:, sl] += lax.dot_general(
            dsb, q[:, sl], _TRANS_A, preferred_element_type=jnp.float32,
            precision=prec)
        dq_ref[0, :, sl] = lax.dot(
            dsb, k[:, sl], preferred_element_type=jnp.float32, precision=prec
        ).astype(dq_ref.dtype)

    # software-pipelined like the forward: head h+1's softmax/ds (VPU)
    # overlaps head h's three gradient matmuls (MXU); measured 1.71 ->
    # 1.61 ms at the bsqvit shape.  pipe_depth=2 spaces the dependence
    # two heads apart (VPU of h hides under FIVE matmuls instead of
    # three) at the cost of one extra live (bq, L) p/ds pair in VMEM —
    # the decided default: bsqvit GAN ae step 199.9 -> 197.1 ms at
    # bs=16 bf16 (pair 118.4 -> 120.2 img/s, round 4; the FORWARD's
    # 2-deep variant measured slower and was deleted).
    import collections

    depth = max(1, min(pipe_depth, heads - 1))
    buf = collections.deque((h, _probs_ds(h)) for h in range(depth))
    for h in range(depth, heads):
        cur = (h, _probs_ds(h))
        eh, pd = buf.popleft()
        _emit(eh, *pd)
        buf.append(cur)
    for eh, pd in buf:
        _emit(eh, *pd)

    @pl.when(q_idx == num_q_blocks - 1)
    def _flush():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _fwd_impl(q, k, v, sm_scale, num_heads, interpret, with_residual,
              packed=False):
    # packed=True: q is k is v is the QKV projection's (B, L, 3*C) output
    # (the caller passes the SAME array three times); the k/v/q channel
    # offsets live entirely in the index maps, so the jnp.split the
    # unpacked API needs — an unfusable 3x(B, L, C) HBM round trip per
    # layer, 24 x 91 us at the bsqvit e2e shape — never materialises.
    b, l, c = q.shape
    if packed:
        c //= 3
    d = c // num_heads
    tiling = _fwd_tiling(l, num_heads, d, jnp.dtype(q.dtype).itemsize)
    if tiling is None:
        raise ValueError(
            f"flash_attention_blc: no (head group, block_q) fits VMEM for "
            f"L={l}, C={c}, dtype={q.dtype}; use the einsum path")
    hpb, block_q = tiling
    cg = hpb * d
    n_groups = num_heads // hpb
    grid = (b, n_groups, l // block_q)
    koff = n_groups if packed else 0
    voff = 2 * n_groups if packed else 0

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def k_map(bi, gi, qi):
        del qi
        return (bi, 0, koff + gi)

    def v_map(bi, gi, qi):
        del qi
        return (bi, 0, voff + gi)

    out_shape = jax.ShapeDtypeStruct((b, l, c), q.dtype)
    out_specs = pl.BlockSpec((1, block_q, cg), q_map)
    if with_residual:
        # per-(row, head) log-normalizer z = m + ln(sum): lane = head
        # within its fwd group, 128 lanes per group (the bwd maps a
        # global head index back through hpb — see _bwd_call)
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, l, 128 * n_groups), jnp.float32)]
        out_specs = [out_specs, pl.BlockSpec((1, block_q, 128), q_map)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, heads=hpb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, cg), q_map),
                pl.BlockSpec((1, l, cg), k_map),
                pl.BlockSpec((1, l, cg), v_map),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_fwd_h{hpb}_bq{block_q}",
        interpret=interpret,
    )(q, k, v)


def _fwd_call(q, k, v, sm_scale, num_heads, interpret):
    return _fwd_impl(q, k, v, sm_scale, num_heads, interpret, False)


def _fwd_res_call(q, k, v, sm_scale, num_heads, interpret):
    return _fwd_impl(q, k, v, sm_scale, num_heads, interpret, True)


def _packed_groups_aligned(num_heads: int, head_dim: int) -> bool:
    """Packed mode needs every head-group block to be 128-lane aligned:
    the 'block equals the whole array dim' escape that legalises the
    hpb=H fallback for separate (B, L, C) arrays does not exist inside a
    (B, L, 3C) array (Mosaic rejects the non-multiple block — caught by
    the on-TPU test run; interpret mode does not enforce it)."""
    return any((g * head_dim) % 128 == 0
               for g in range(1, num_heads + 1) if num_heads % g == 0)


def _fwd_call_packed(qkv, sm_scale, num_heads, interpret):
    if not _packed_groups_aligned(num_heads, qkv.shape[-1] // 3 // num_heads):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _fwd_impl(q, k, v, sm_scale, num_heads, interpret, False)
    return _fwd_impl(qkv, qkv, qkv, sm_scale, num_heads, interpret, False,
                     packed=True)


def _fwd_res_call_packed(qkv, sm_scale, num_heads, interpret):
    if not _packed_groups_aligned(num_heads, qkv.shape[-1] // 3 // num_heads):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _fwd_impl(q, k, v, sm_scale, num_heads, interpret, True)
    return _fwd_impl(qkv, qkv, qkv, sm_scale, num_heads, interpret, True,
                     packed=True)


def _fwd_hpb(l, num_heads, d, esize):
    tiling = _fwd_tiling(l, num_heads, d, esize)
    return tiling[0] if tiling else num_heads


def _einsum_ref(q, k, v, sm_scale, num_heads):
    b, l, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, l, num_heads, d)
    kh = k.reshape(b, l, num_heads, d)
    vh = v.reshape(b, l, num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, l, c)


def _einsum_bwd(q, k, v, do, sm_scale, num_heads):
    _, vjp = jax.vjp(
        lambda q, k, v: _einsum_ref(q, k, v, sm_scale, num_heads), q, k, v)
    return vjp(do)


def _bwd_call(q, k, v, o, z, do, sm_scale, num_heads, interpret):
    return _bwd_impl(q, k, v, o, z, do, sm_scale, num_heads, interpret,
                     False)


def _bwd_call_packed(qkv, o, z, do, sm_scale, num_heads, interpret):
    if not _packed_groups_aligned(num_heads, qkv.shape[-1] // 3 // num_heads):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _bwd_impl(q, k, v, o, z, do, sm_scale, num_heads, interpret,
                         False)
    return _bwd_impl(qkv, qkv, qkv, o, z, do, sm_scale, num_heads, interpret,
                     True)


def _bwd_impl(q, k, v, o, z, do, sm_scale, num_heads, interpret, packed):
    # packed=True: q is k is v is the (B, L, 3*C) QKV array (see _fwd_impl)
    b, l, c = q.shape
    if packed:
        c //= 3
    d = c // num_heads
    esize = jnp.dtype(q.dtype).itemsize
    fwd_hpb = _fwd_hpb(l, num_heads, d, esize)
    z_width = z.shape[-1]
    # Joint VMEM search for the pipelined backward: fp32 dk/dv
    # accumulators + ~5 live fp32 (block_q, L) score/gradient tiles +
    # the 2-deep pipeline's extra live (bq, L) p/ds pair +
    # double-buffered k/v input tiles.
    pipe_depth = 2
    hpb, block_q = None, None
    # block_q=256 first, then widest group: the round-4 in-vivo arbitration
    # (bench_train at the bsqvit shape) measured (4, 256) at ae 196.2 ms vs
    # (6, 128) at 197.1 and (6, 256, depth-1) at 199.9 — 256-row tiles
    # amortize grid overhead, and the 2-deep pipeline beats a wider head
    # group when VMEM forces the choice (scripts/exp_flash_bwd_variants.py;
    # re-pin tilings there — the old GVQ_FLASH_BWD_TILE env pin is retired)
    for bq in (256, 512, 128, 64):
        if l % bq:
            continue
        for g in reversed(_aligned_groups(num_heads, d)):
            # the 2-deep pipeline (gated on heads >= 3) keeps ~6 live fp32
            # (bq, L) score/gradient tiles; the depth-1 loop a group g < 3
            # actually runs keeps only ~5
            live_tiles = 6 if g >= 3 else 5
            est = (2 * l * g * d * 4) + (live_tiles * bq * l * 4) \
                + (4 * l * g * d * esize)
            if est <= 11_500_000:
                hpb, block_q = g, bq
                break
        if hpb:
            break
    if hpb is None:
        # shapes whose whole-L k/v rows can't share VMEM with the score
        # tiles (very long sequences): fall back to the XLA einsum VJP —
        # numerically the same gradient, just without the kernel
        if packed:
            q, k, v = jnp.split(q, 3, axis=-1)
        return _einsum_bwd(q, k, v, do, sm_scale, num_heads)
    cg = hpb * d
    nq = l // block_q
    grid = (b, num_heads // hpb, nq)
    n_groups = num_heads // hpb
    koff = n_groups if packed else 0
    voff = 2 * n_groups if packed else 0

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        del qi
        return (bi, 0, gi)

    q_spec = pl.BlockSpec((1, block_q, cg), q_map)
    kv_spec = pl.BlockSpec((1, l, cg), kv_map)
    qin_spec = pl.BlockSpec((1, block_q, cg),
                            lambda bi, gi, qi: (bi, qi, gi))
    kin_spec = pl.BlockSpec((1, l, cg),
                            lambda bi, gi, qi: (bi, 0, koff + gi))
    vin_spec = pl.BlockSpec((1, l, cg),
                            lambda bi, gi, qi: (bi, 0, voff + gi))
    z_spec = pl.BlockSpec((1, block_q, z_width),
                          lambda bi, gi, qi: (bi, qi, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, heads=hpb,
                          num_q_blocks=nq, num_groups=num_heads // hpb,
                          fwd_hpb=fwd_hpb, pipe_depth=pipe_depth),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[qin_spec, kin_spec, vin_spec, q_spec, z_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            scratch_shapes=[
                pltpu.VMEM((l, cg), jnp.float32),
                pltpu.VMEM((l, cg), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, l, c), q.dtype),
            jax.ShapeDtypeStruct((b, l, c), k.dtype),
            jax.ShapeDtypeStruct((b, l, c), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_bwd_h{hpb}_bq{block_q}"
             + (f"_p{pipe_depth}" if pipe_depth > 1 else ""),
        interpret=interpret,
    )(q, k, v, o, z, do)
    return dq, dk, dv


# --------------------------------------------------------------------------
# GSPMD partitioning: attention is independent per batch element, so both
# pallas_calls shard over dim 0 of every operand/output with no
# collectives; a bare pallas_call would otherwise be *replicated* on a
# mesh (every chip computing the global batch — see ops/layer_norm.py).
# --------------------------------------------------------------------------


def _make_batch_cp(impl, n_arrays, n_out=1, z_args=(), z_outs=(),
                   c3_args=()):
    cp = custom_partitioning(
        impl, static_argnums=(n_arrays, n_arrays + 1, n_arrays + 2))

    def _shardings(mesh, b_ax, n):
        s = NamedSharding(mesh, P(b_ax, None, None))
        return (s,) * n

    def infer(sm_scale, num_heads, interpret, mesh, arg_infos, result_infos):
        del sm_scale, num_heads, interpret
        b_ax = batch_axis_of(arg_infos[0], 0)
        n_out = len(result_infos) if isinstance(result_infos, (tuple, list)) else 1
        out = _shardings(mesh, b_ax, n_out)
        return out if n_out > 1 else out[0]

    def partition(sm_scale, num_heads, interpret, mesh, arg_infos,
                  result_infos):
        b_ax = batch_axis_of(arg_infos[0], 0)

        def lower(*arrs):
            return impl(*arrs, sm_scale, num_heads, interpret)

        n_out = len(result_infos) if isinstance(result_infos, (tuple, list)) else 1
        out_sh = _shardings(mesh, b_ax, n_out)
        return (mesh, lower, out_sh if n_out > 1 else out_sh[0],
                _shardings(mesh, b_ax, n_arrays))

    # the z residual's lane width (128 * fwd groups) and the packed QKV's
    # 3*C channel axis differ from c, so each carries its own Shardy
    # factor — same batch/seq factors, replicated tail like everything else
    def _feat(i, in_z, in_c3):
        return "z" if i in in_z else ("c3" if i in in_c3 else "c")

    dims = tuple(("b", "l", _feat(i, z_args, c3_args))
                 for i in range(n_arrays))
    out_dims = tuple(("b", "l", _feat(i, z_outs, ()))
                     for i in range(n_out))
    # Shardy wants special factors listed in first-appearance order
    seen = list(dict.fromkeys(f for d in dims + out_dims for f in d))
    need_rep = tuple(f for f in seen if f != "b")
    rule = SdyShardingRule(dims, out_dims,
                           need_replication_factors=need_rep)
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


_FWD_CP = _make_batch_cp(_fwd_call, 3)
_FWD_RES_CP = _make_batch_cp(_fwd_res_call, 3, n_out=2, z_outs=(1,))
_BWD_CP = _make_batch_cp(_bwd_call, 6, n_out=3, z_args=(4,))
_FWD_P_CP = _make_batch_cp(_fwd_call_packed, 1, c3_args=(0,))
_FWD_RES_P_CP = _make_batch_cp(_fwd_res_call_packed, 1, n_out=2,
                               z_outs=(1,), c3_args=(0,))
_BWD_P_CP = _make_batch_cp(_bwd_call_packed, 4, n_out=3, z_args=(2,),
                           c3_args=(0,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_blc(q, k, v, sm_scale: float, num_heads: int,
                        interpret: bool = False):
    """Multi-head softmax(q @ k^T * sm_scale) @ v on packed (B, L, H*D).

    One head group's k/v rows must fit VMEM (L * 128 lanes * 2 bytes
    each, plus a (block_q, L) fp32 score tile), which holds comfortably
    for the tokenizer shapes (L <= 4096).  L must be a multiple of 128
    and D a multiple of 8.
    """
    return _FWD_CP(q, k, v, sm_scale, num_heads, interpret)


def _vjp_fwd(q, k, v, sm_scale, num_heads, interpret):
    # the training forward also emits the per-(row, head) log-normalizer
    # z = m + ln(sum) so the backward can rebuild normalized probabilities
    # without max/sum reduce passes; HBM cost is (B, L, 128*groups) fp32
    # per layer — two VPU passes per (head, q-block) bought for ~8 MB
    o, zres = _FWD_RES_CP(q, k, v, sm_scale, num_heads, interpret)
    return o, (q, k, v, o, zres)


def _vjp_bwd(sm_scale, num_heads, interpret, res, do):
    q, k, v, o, zres = res
    return _BWD_CP(q, k, v, o, zres, do, sm_scale, num_heads, interpret)


flash_attention_blc.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def flash_attention_qkv(qkv, sm_scale: float, num_heads: int,
                        interpret: bool = False):
    """Flash attention straight off the packed QKV projection output.

    ``qkv`` is the ``(B, L, 3*H*D)`` array a packed in_proj produces
    (q | k | v along the channel axis, torch nn.MultiheadAttention
    layout, reference vit.py:86).  Equivalent to splitting and calling
    :func:`flash_attention_blc`, but the q/k/v channel offsets live in
    the kernel's BlockSpec index maps, so the ``jnp.split`` — an
    unfusable 3x(B, L, C) HBM round trip per layer that XLA keeps as a
    standalone copy fusion, measured 24 x 91 us = 2.2 ms of the 51 ms
    bsqvit e2e step — never materialises.  Same shape rules as
    flash_attention_blc (L % 128 == 0, D % 8 == 0, one head group's k/v
    rows fit VMEM).
    """
    return _FWD_P_CP(qkv, sm_scale, num_heads, interpret)


def _vjp_fwd_qkv(qkv, sm_scale, num_heads, interpret):
    o, zres = _FWD_RES_P_CP(qkv, sm_scale, num_heads, interpret)
    return o, (qkv, o, zres)


def _vjp_bwd_qkv(sm_scale, num_heads, interpret, res, do):
    qkv, o, zres = res
    dq, dk, dv = _BWD_P_CP(qkv, o, zres, do, sm_scale, num_heads, interpret)
    # the packed projection's AD needs one (B, L, 3C) cotangent; XLA fuses
    # this concat into the dq/dk/dv consumers' epilogues where possible
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


flash_attention_qkv.defvjp(_vjp_fwd_qkv, _vjp_bwd_qkv)
