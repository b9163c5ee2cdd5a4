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
           "flash_attention_qkvi", "qkv_interleave_groups",
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


def _fwd_kernel(*refs, sm_scale, heads, parts=1, with_z):
    # refs: parts q blocks, parts k blocks, parts v blocks, o, [z].
    # parts=1 is the standard/packed layout (one (block_q|L, heads*D)
    # block per operand); parts=m is the group-interleaved layout, where
    # the fwd head group spans m interleave blocks per operand and the
    # per-head slice selects the right part (static arithmetic).
    qs = [r[0] for r in refs[:parts]]
    ks = [r[0] for r in refs[parts:2 * parts]]
    vs = [r[0] for r in refs[2 * parts:3 * parts]]
    o_ref = refs[3 * parts]
    z_ref = refs[3 * parts + 1] if with_z else None
    cgi = qs[0].shape[-1]
    d = cgi * parts // heads

    def _part(lst, h):
        j, off = divmod(h * d, cgi)
        return lst[j][:, off:off + d]

    q, k, v = qs[0], ks[0], vs[0]  # dtype carriers
    # fp32 operands are the exact-parity path: force full-precision MXU
    # passes (the default truncates fp32 dots to one bf16 pass — caught by
    # the on-TPU parity run; bf16 operands keep the fast single pass)
    prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
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
        qh = _part(qs, h)
        if q_fold:
            qh = qh * qh.dtype.type(sm_scale)
        s = lax.dot_general(qh, _part(ks, h), _TRANS_B,
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
            vh = jnp.concatenate([_part(vs, h), ones], axis=1)
            o = lax.dot(p, vh, preferred_element_type=jnp.float32,
                        precision=prec)
            inv_sum = 1.0 / o[:, d:d + 1]
            o = o[:, :d]
        else:
            m, inv_sum = aux
            o = lax.dot(p, _part(vs, h), preferred_element_type=jnp.float32,
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
                *refs, sm_scale, heads, num_q_blocks, num_groups, fwd_hpb,
                pipe_depth=2, single_out=False, block_q=0):
    # single_out=False: refs = (dq_ref, dk_ref, dv_ref, dk_s, dv_s) — the
    # torch-layout path (three outputs; the packed VJP concatenates them).
    # single_out=True: refs = (dout_ref, dk_s, dv_s) with dout a resident
    # (1, L, 3*heads*D) interleaved block [dq|dk|dv] for this head group —
    # dq rows land per q-block via a dynamic row slice, dk/dv flush at the
    # last q-block, and the (B, L, 3C) gradient needs NO concat.
    if single_out:
        dout_ref, dk_scratch, dv_scratch = refs
        dq_ref = dk_ref = dv_ref = None
    else:
        dq_ref, dk_ref, dv_ref, dk_scratch, dv_scratch = refs
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
    # fp32 = exact-parity path: full-precision MXU passes (see _fwd_kernel)
    prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)

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
        dq = lax.dot(
            dsb, k[:, sl], preferred_element_type=jnp.float32, precision=prec)
        if single_out:
            dout_ref[0, pl.dslice(q_idx * block_q, block_q), sl] = \
                dq.astype(dout_ref.dtype)
        else:
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)

    # software-pipelined like the forward: head h+1's softmax/ds (VPU)
    # overlaps head h's three gradient matmuls (MXU); measured 1.71 ->
    # 1.61 ms at the bsqvit shape.  pipe_depth=2 spaces the dependence
    # two heads apart (VPU of h hides under FIVE matmuls instead of
    # three) at the cost of one extra live (bq, L) p/ds pair in VMEM —
    # the decided default: bsqvit GAN ae step 199.9 -> 197.1 ms at
    # bs=16 bf16 (pair 118.4 -> 120.2 img/s, round 4; the FORWARD's
    # 2-deep variant measured slower and was deleted).
    if pipe_depth >= 2 and heads >= 3:
        s0, s1 = _probs_ds(0), _probs_ds(1)
        for h in range(2, heads):
            cur = _probs_ds(h)
            _emit(h - 2, *s0)
            s0, s1 = s1, cur
        _emit(heads - 2, *s0)
        _emit(heads - 1, *s1)
    else:
        prev = _probs_ds(0)
        for h in range(1, heads):
            cur = _probs_ds(h)
            _emit(h - 1, *prev)
            prev = cur
        _emit(heads - 1, *prev)

    @pl.when(q_idx == num_q_blocks - 1)
    def _flush():
        if single_out:
            cg = heads * d
            dout_ref[0, :, cg:2 * cg] = \
                dk_scratch[...].astype(dout_ref.dtype)
            dout_ref[0, :, 2 * cg:3 * cg] = \
                dv_scratch[...].astype(dout_ref.dtype)
        else:
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
        functools.partial(_fwd_kernel, sm_scale=sm_scale, heads=hpb,
                          with_z=with_residual),
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


def _fwd_impl_inter(qkv, sm_scale, num_heads, interpret, with_residual,
                    gi_heads):
    """Forward over the group-interleaved (B, L, 3C) layout
    ([q_g0|k_g0|v_g0|q_g1|...] at gi_heads*D channel granularity, see
    qkv_interleave_groups).  Same tiling and kernel math as the packed
    forward — the fwd head group just spans m = hpb/gi_heads interleave
    blocks, read through m per-part index maps; DMA bytes are unchanged."""
    b, l, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    tiling = _fwd_tiling(l, num_heads, d, jnp.dtype(qkv.dtype).itemsize)
    if tiling is None:
        raise ValueError("flash qkvi: no fwd tiling; gate on "
                         "qkv_interleave_groups before calling")
    hpb, block_q = tiling
    if hpb % gi_heads:
        raise ValueError("flash qkvi: bwd group must divide fwd group")
    m = hpb // gi_heads
    cgi = gi_heads * d
    n_groups = num_heads // hpb
    grid = (b, n_groups, l // block_q)

    def part_map(kind, j):
        def f(bi, gi, qi):
            blk = 3 * (gi * m + j) + kind
            return (bi, qi if kind == 0 else 0, blk)
        return f

    in_specs = (
        [pl.BlockSpec((1, block_q, cgi), part_map(0, j)) for j in range(m)]
        + [pl.BlockSpec((1, l, cgi), part_map(1, j)) for j in range(m)]
        + [pl.BlockSpec((1, l, cgi), part_map(2, j)) for j in range(m)]
    )

    def o_map(bi, gi, qi):
        return (bi, qi, gi)

    out_shape = jax.ShapeDtypeStruct((b, l, c), qkv.dtype)
    out_specs = pl.BlockSpec((1, block_q, hpb * d), o_map)
    if with_residual:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, l, 128 * n_groups), jnp.float32)]
        out_specs = [out_specs, pl.BlockSpec((1, block_q, 128), o_map)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, heads=hpb,
                          parts=m, with_z=with_residual),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_fwd_i_h{hpb}_bq{block_q}_m{m}",
        interpret=interpret,
    )(*([qkv] * (3 * m)))


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


def _bwd_tiling(l: int, num_heads: int, d: int, esize: int):
    """Joint VMEM search for the pipelined backward: fp32 dk/dv
    accumulators + ~5 live fp32 (block_q, L) score/gradient tiles +
    the 2-deep pipeline's extra live (bq, L) p/ds pair +
    double-buffered k/v input tiles.

    block_q=256 first, then widest group: the round-4 in-vivo arbitration
    (bench_train at the bsqvit shape) measured (4, 256) at ae 196.2 ms vs
    (6, 128) at 197.1 and (6, 256, depth-1) at 199.9 — 256-row tiles
    amortize grid overhead, and the 2-deep pipeline beats a wider head
    group when VMEM forces the choice (scripts/exp_flash_bwd_variants.py;
    re-pin tilings there — the old GVQ_FLASH_BWD_TILE env pin is retired).
    Returns (hpb, block_q) or None."""
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
                return g, bq
    return None


def qkv_interleave_groups(l: int, num_heads: int, head_dim: int,
                          dtype) -> int:
    """Interleave granularity (in heads) of the concat-free packed path,
    or 0 when unsupported.

    The training backward emits dq/dk/dv; with the torch q|k|v channel
    layout they are three Pallas outputs whose (B, L, 3C) concatenation —
    needed by the projection's AD — costs ~0.1 ms/layer of pure HBM copy
    (round-5 trace: 2.48 ms/step of `dynamic-update-slice` fusions at the
    bsqvit shape).  Interleaving the projection's output channels at the
    BACKWARD's head-group granularity g ([q_g0|k_g0|v_g0|q_g1|...]) makes
    each bwd grid step's dq/dk/dv adjacent, so ONE (1, L, 3*g*D) output
    block covers them and the gradient is written directly in the layout
    the projection AD consumes.  The forward reads the same array through
    per-part index maps (its wider head group spans m = fwd_hpb/g parts),
    keeping the measured-fastest fwd tiling and the 128-lane z residual.

    Requirements: a legal fwd tiling, a legal bwd tiling, and the bwd
    group dividing the fwd group.
    """
    if not flash_blc_supported(l, num_heads, head_dim, dtype):
        return 0
    esize = jnp.dtype(dtype).itemsize
    bwd = _bwd_tiling(l, num_heads, head_dim, esize)
    if bwd is None:
        return 0
    fwd_hpb = _fwd_hpb(l, num_heads, head_dim, esize)
    if fwd_hpb % bwd[0]:
        return 0
    return bwd[0]


def _bwd_impl(q, k, v, o, z, do, sm_scale, num_heads, interpret, packed):
    # packed=True: q is k is v is the (B, L, 3*C) QKV array (see _fwd_impl)
    b, l, c = q.shape
    if packed:
        c //= 3
    d = c // num_heads
    esize = jnp.dtype(q.dtype).itemsize
    fwd_hpb = _fwd_hpb(l, num_heads, d, esize)
    z_width = z.shape[-1]
    pipe_depth = 2
    tiling = _bwd_tiling(l, num_heads, d, esize)
    hpb, block_q = tiling if tiling else (None, None)
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


def _bwd_impl_inter(qkv, o, z, do, sm_scale, num_heads, interpret, gi_heads):
    """Backward over the group-interleaved layout: the head-group grid
    step writes dq|dk|dv into ONE resident (1, L, 3*g*D) block of the
    (B, L, 3C) gradient — dq rows land per q-block (the out index map is
    constant in the q dimension, so the block stays in VMEM), dk/dv flush
    from the fp32 accumulators at the last q-block.  The projection's AD
    consumes this array directly: the concat of the torch-layout path
    (2.48 ms/step at the bsqvit shape, round-5 trace) never exists."""
    b, l, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    esize = jnp.dtype(qkv.dtype).itemsize
    fwd_hpb = _fwd_hpb(l, num_heads, d, esize)
    z_width = z.shape[-1]
    pipe_depth = 2
    tiling = _bwd_tiling(l, num_heads, d, esize)
    if tiling is None or tiling[0] != gi_heads:
        raise ValueError("flash qkvi bwd: tiling/granularity mismatch; "
                         "gate on qkv_interleave_groups before calling")
    hpb, block_q = tiling
    cg = hpb * d
    nq = l // block_q
    n_groups = num_heads // hpb
    grid = (b, n_groups, nq)

    qin_spec = pl.BlockSpec((1, block_q, cg),
                            lambda bi, gi, qi: (bi, qi, 3 * gi))
    kin_spec = pl.BlockSpec((1, l, cg),
                            lambda bi, gi, qi: (bi, 0, 3 * gi + 1))
    vin_spec = pl.BlockSpec((1, l, cg),
                            lambda bi, gi, qi: (bi, 0, 3 * gi + 2))
    # o/do stay in the normal (B, L, C) head-major layout
    od_spec = pl.BlockSpec((1, block_q, cg), lambda bi, gi, qi: (bi, qi, gi))
    z_spec = pl.BlockSpec((1, block_q, z_width),
                          lambda bi, gi, qi: (bi, qi, 0))
    out_spec = pl.BlockSpec((1, l, 3 * cg), lambda bi, gi, qi: (bi, 0, gi))

    (dqkv,) = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, heads=hpb,
                          num_q_blocks=nq, num_groups=n_groups,
                          fwd_hpb=fwd_hpb, pipe_depth=pipe_depth,
                          single_out=True, block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[qin_spec, kin_spec, vin_spec, od_spec, z_spec,
                      od_spec],
            out_specs=[out_spec],
            scratch_shapes=[
                pltpu.VMEM((l, cg), jnp.float32),
                pltpu.VMEM((l, cg), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, l, c3), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_bwd_i_h{hpb}_bq{block_q}"
             + (f"_p{pipe_depth}" if pipe_depth > 1 else ""),
        interpret=interpret,
    )(qkv, qkv, qkv, o, z, do)
    return dqkv


# --------------------------------------------------------------------------
# GSPMD partitioning: attention is independent per batch element, so both
# pallas_calls shard over dim 0 of every operand/output with no
# collectives; a bare pallas_call would otherwise be *replicated* on a
# mesh (every chip computing the global batch — see ops/layer_norm.py).
# --------------------------------------------------------------------------


def _make_batch_cp(impl, n_arrays, n_out=1, z_args=(), z_outs=(),
                   c3_args=(), c3_outs=(), n_static=3):
    cp = custom_partitioning(
        impl, static_argnums=tuple(range(n_arrays, n_arrays + n_static)))

    def _shardings(mesh, b_ax, n):
        s = NamedSharding(mesh, P(b_ax, None, None))
        return (s,) * n

    def infer(*args):
        mesh, arg_infos, result_infos = args[n_static:n_static + 3]
        b_ax = batch_axis_of(arg_infos[0], 0)
        n_res = len(result_infos) if isinstance(result_infos, (tuple, list)) else 1
        out = _shardings(mesh, b_ax, n_res)
        return out if n_res > 1 else out[0]

    def partition(*args):
        statics = args[:n_static]
        mesh, arg_infos, result_infos = args[n_static:n_static + 3]
        b_ax = batch_axis_of(arg_infos[0], 0)

        def lower(*arrs):
            return impl(*arrs, *statics)

        n_res = len(result_infos) if isinstance(result_infos, (tuple, list)) else 1
        out_sh = _shardings(mesh, b_ax, n_res)
        return (mesh, lower, out_sh if n_res > 1 else out_sh[0],
                _shardings(mesh, b_ax, n_arrays))

    # the z residual's lane width (128 * fwd groups) and the packed QKV's
    # 3*C channel axis differ from c, so each carries its own Shardy
    # factor — same batch/seq factors, replicated tail like everything else
    def _feat(i, in_z, in_c3):
        return "z" if i in in_z else ("c3" if i in in_c3 else "c")

    dims = tuple(("b", "l", _feat(i, z_args, c3_args))
                 for i in range(n_arrays))
    out_dims = tuple(("b", "l", _feat(i, z_outs, c3_outs))
                     for i in range(n_out))
    # Shardy wants special factors listed in first-appearance order
    seen = list(dict.fromkeys(f for d in dims + out_dims for f in d))
    need_rep = tuple(f for f in seen if f != "b")
    rule = SdyShardingRule(dims, out_dims,
                           need_replication_factors=need_rep)
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


def _fwd_call_i(qkv, sm_scale, num_heads, gi_heads, interpret):
    return _fwd_impl_inter(qkv, sm_scale, num_heads, interpret, False,
                           gi_heads)


def _fwd_res_call_i(qkv, sm_scale, num_heads, gi_heads, interpret):
    return _fwd_impl_inter(qkv, sm_scale, num_heads, interpret, True,
                           gi_heads)


def _bwd_call_i(qkv, o, z, do, sm_scale, num_heads, gi_heads, interpret):
    return _bwd_impl_inter(qkv, o, z, do, sm_scale, num_heads, interpret,
                           gi_heads)


_FWD_CP = _make_batch_cp(_fwd_call, 3)
_FWD_RES_CP = _make_batch_cp(_fwd_res_call, 3, n_out=2, z_outs=(1,))
_BWD_CP = _make_batch_cp(_bwd_call, 6, n_out=3, z_args=(4,))
_FWD_P_CP = _make_batch_cp(_fwd_call_packed, 1, c3_args=(0,))
_FWD_RES_P_CP = _make_batch_cp(_fwd_res_call_packed, 1, n_out=2,
                               z_outs=(1,), c3_args=(0,))
_BWD_P_CP = _make_batch_cp(_bwd_call_packed, 4, n_out=3, z_args=(2,),
                           c3_args=(0,))
_FWD_I_CP = _make_batch_cp(_fwd_call_i, 1, c3_args=(0,), n_static=4)
_FWD_RES_I_CP = _make_batch_cp(_fwd_res_call_i, 1, n_out=2, z_outs=(1,),
                               c3_args=(0,), n_static=4)
_BWD_I_CP = _make_batch_cp(_bwd_call_i, 4, n_out=1, z_args=(2,),
                           c3_args=(0,), c3_outs=(0,), n_static=4)


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
    # the packed projection's AD needs one (B, L, 3C) cotangent; XLA
    # lowers this concat to dynamic-update-slice fusions (measured
    # 2.48 ms/step at the bsqvit shape) — the interleaved entry below
    # (flash_attention_qkvi) eliminates it; this path serves the
    # torch-layout API and shapes the interleave cannot support
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


flash_attention_qkv.defvjp(_vjp_fwd_qkv, _vjp_bwd_qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def flash_attention_qkvi(qkv, sm_scale: float, num_heads: int,
                         gi_heads: int, interpret: bool = False):
    """Flash attention over a GROUP-INTERLEAVED packed QKV projection.

    ``qkv`` is (B, L, 3C) laid out as [q_g0|k_g0|v_g0|q_g1|k_g1|v_g1|...]
    at ``gi_heads * D`` channel granularity — the layout produced by a
    projection whose weight columns were permuted with
    :func:`interleave_qkv_weight` (models/vit.py does this at trace time;
    weights stay torch-layout in checkpoints).  ``gi_heads`` must be the
    value returned by :func:`qkv_interleave_groups` for this shape.

    Identical math to :func:`flash_attention_qkv`; the difference is the
    training backward, which writes dq/dk/dv for each head group into one
    adjacent block of the (B, L, 3C) gradient — the concat the torch
    layout forces (three Pallas outputs -> dynamic-update-slice fusions,
    2.48 ms/step at the bsqvit operating point) never materialises.
    """
    return _FWD_I_CP(qkv, sm_scale, num_heads, gi_heads, interpret)


def _vjp_fwd_qkvi(qkv, sm_scale, num_heads, gi_heads, interpret):
    o, zres = _FWD_RES_I_CP(qkv, sm_scale, num_heads, gi_heads, interpret)
    return o, (qkv, o, zres)


def _vjp_bwd_qkvi(sm_scale, num_heads, gi_heads, interpret, res, do):
    qkv, o, zres = res
    return (_BWD_I_CP(qkv, o, zres, do, sm_scale, num_heads, gi_heads,
                      interpret),)


flash_attention_qkvi.defvjp(_vjp_fwd_qkvi, _vjp_bwd_qkvi)


def interleave_qkv_weight(kernel, bias, num_heads: int, head_dim: int,
                          gi_heads: int):
    """Permute a torch-layout packed projection (kernel (C_in, 3C), bias
    (3C,); columns q|k|v) into the group-interleaved layout
    :func:`flash_attention_qkvi` consumes.  Applied at trace time on the
    WEIGHTS (a few MB), so checkpoints/converters keep the reference
    layout (`/root/reference/pit/modules/vit.py:86` nn.MultiheadAttention
    in_proj) and the (B, L, 3C) activation is born interleaved."""
    c = num_heads * head_dim
    cgi = gi_heads * head_dim
    nb = c // cgi
    k3 = kernel.reshape(kernel.shape[0], 3, nb, cgi)
    kernel_i = jnp.swapaxes(k3, 1, 2).reshape(kernel.shape[0], 3 * c)
    b3 = bias.reshape(3, nb, cgi)
    bias_i = jnp.swapaxes(b3, 0, 1).reshape(3 * c)
    return kernel_i, bias_i
