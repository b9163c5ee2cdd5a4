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

__all__ = ["flash_attention_blc"]

_TRANS_B = (((1,), (1,)), ((), ()))  # contract dim1 of both: x @ y^T
_TRANS_A = (((0,), (0,)), ((), ()))  # contract dim0 of both: x^T @ y


def _heads_per_block(num_heads: int, head_dim: int, seq_len: int = 0,
                     widest: bool = False) -> int:
    """Head-group size: lane width must be a 128 multiple (or the whole
    channel axis, which Pallas always accepts).

    The forward wants the WIDEST group that keeps a k/v tile under ~2 MB —
    the TPU has one tensor core, so grid granularity buys nothing and
    bulkier invocations amortize fixed overhead (measured at the bsqvit
    shape: hpb 2 -> 12 is 0.80 -> 0.75 ms).  The backward holds dk/dv
    fp32 accumulators plus four (block_q, L) fp32 tiles, so it keeps the
    narrowest group.
    """
    aligned = [g for g in range(1, num_heads + 1)
               if num_heads % g == 0 and (g * head_dim) % 128 == 0]
    if not aligned:
        return num_heads
    if not widest:
        return aligned[0]
    fitting = [g for g in aligned if g * head_dim * seq_len * 2 <= 2 * 1024 * 1024]
    return fitting[-1] if fitting else aligned[0]


def _pick_block_q(seq_len: int, budget_bytes: int) -> int:
    # bound the (block_q, L) fp32 score/probability tiles
    for bq in (1024, 512, 256, 128):
        if bq * seq_len * 4 <= budget_bytes and seq_len % bq == 0:
            return bq
    return 128


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, heads):
    q = q_ref[0]  # (block_q, heads * D)
    k = k_ref[0]  # (L, heads * D)
    v = v_ref[0]
    d = q.shape[-1] // heads

    def _probs(h):
        sl = slice(h * d, (h + 1) * d)
        s = lax.dot_general(q[:, sl], k[:, sl], _TRANS_B,
                            preferred_element_type=jnp.float32)
        s *= sm_scale
        m = jnp.max(s, axis=1)[:, None]
        p = jnp.exp(s - m)
        return (p / jnp.sum(p, axis=1)[:, None]).astype(v.dtype)

    def _emit(h, p):
        sl = slice(h * d, (h + 1) * d)
        o_ref[0, :, sl] = lax.dot(
            p, v[:, sl], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    # software-pipeline the head loop: issue head h+1's QK^T/softmax
    # before head h's AV matmul so the VPU softmax overlaps MXU work
    # (measured at the bsqvit shape: 0.82 -> 0.65 ms, 32% -> 40% of peak)
    prev = _probs(0)
    for h in range(1, heads):
        cur = _probs(h)
        _emit(h - 1, prev)
        prev = cur
    _emit(heads - 1, prev)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                *, sm_scale, heads, num_q_blocks):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, dk_scratch.dtype)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, dv_scratch.dtype)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    d = q.shape[-1] // heads

    def _probs_ds(h):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        s = lax.dot_general(qh, kh, _TRANS_B,
                            preferred_element_type=jnp.float32)
        s *= sm_scale
        m = jnp.max(s, axis=1)[:, None]
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1)[:, None]
        dp = lax.dot_general(doh, vh, _TRANS_B,
                             preferred_element_type=jnp.float32)
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
            pb, do[:, sl], _TRANS_A, preferred_element_type=jnp.float32)
        dk_scratch[:, sl] += lax.dot_general(
            dsb, q[:, sl], _TRANS_A, preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = lax.dot(
            dsb, k[:, sl], preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)

    # software-pipelined like the forward: head h+1's softmax/ds (VPU)
    # overlaps head h's three gradient matmuls (MXU); measured 1.71 ->
    # 1.61 ms at the bsqvit shape
    prev = _probs_ds(0)
    for h in range(1, heads):
        cur = _probs_ds(h)
        _emit(h - 1, *prev)
        prev = cur
    _emit(heads - 1, *prev)

    @pl.when(q_idx == num_q_blocks - 1)
    def _flush():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _fwd_call(q, k, v, sm_scale, num_heads, interpret):
    b, l, c = q.shape
    d = c // num_heads
    hpb = _heads_per_block(num_heads, d, l, widest=True)
    cg = hpb * d
    # joint VMEM budget: double-buffered k/v + q/o tiles plus the fp32
    # score tiles (x3: the pipelined head loop keeps two probability
    # tiles live) must stay under the 16 MB scoped limit with headroom
    # for the compiler's own temporaries.  At the bsqvit shape this
    # picks bq=256, which also measures fastest (two heads' tiles
    # coexist in cache-friendly sizes).
    block_q = 128
    for bq in (1024, 512, 256):
        est = (4 * l * cg * 2) + (4 * bq * cg * 2) + (3 * bq * l * 4)
        if l % bq == 0 and est <= 13 * 1024 * 1024:
            block_q = bq
            break
    grid = (b, num_heads // hpb, l // block_q)

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        del qi
        return (bi, 0, gi)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, heads=hpb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, cg), q_map),
                pl.BlockSpec((1, l, cg), kv_map),
                pl.BlockSpec((1, l, cg), kv_map),
            ],
            out_specs=pl.BlockSpec((1, block_q, cg), q_map),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_fwd_h{hpb}_bq{block_q}",
        interpret=interpret,
    )(q, k, v)


def _bwd_call(q, k, v, o, do, sm_scale, num_heads, interpret):
    b, l, c = q.shape
    d = c // num_heads
    # joint VMEM budget for the pipelined backward: fp32 dk/dv
    # accumulators (2*L*cg*4) + ~5 live fp32 (block_q, L) tiles +
    # double-buffered in/out tiles.  hpb=4/bq=256 measured fastest at the
    # bsqvit shape (1.71 -> 1.61 ms) and the formula picks exactly that.
    hpb, block_q = None, None
    aligned = [g for g in range(1, num_heads + 1)
               if num_heads % g == 0 and (g * d) % 128 == 0] or [num_heads]
    for g in reversed(aligned):
        for bq in (512, 256, 128):
            if l % bq:
                continue
            # dominant VMEM terms: the fp32 dk/dv accumulators plus ~5
            # live fp32 (block_q, L) score/gradient tiles
            est = (2 * l * g * d * 4) + (5 * bq * l * 4)
            if est <= 8 * 1024 * 1024:
                hpb, block_q = g, bq
                break
        if hpb:
            break
    if hpb is None:
        hpb, block_q = aligned[0], 128
    cg = hpb * d
    nq = l // block_q
    grid = (b, num_heads // hpb, nq)

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        del qi
        return (bi, 0, gi)

    q_spec = pl.BlockSpec((1, block_q, cg), q_map)
    kv_spec = pl.BlockSpec((1, l, cg), kv_map)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, heads=hpb,
                          num_q_blocks=nq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            scratch_shapes=[
                pltpu.VMEM((l, cg), jnp.float32),
                pltpu.VMEM((l, cg), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        name=f"flash_blc_bwd_h{hpb}_bq{block_q}",
        interpret=interpret,
    )(q, k, v, o, do)
    return dq, dk, dv


# --------------------------------------------------------------------------
# GSPMD partitioning: attention is independent per batch element, so both
# pallas_calls shard over dim 0 of every operand/output with no
# collectives; a bare pallas_call would otherwise be *replicated* on a
# mesh (every chip computing the global batch — see ops/layer_norm.py).
# --------------------------------------------------------------------------


def _make_batch_cp(impl, n_arrays):
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

    dims = (("b", "l", "c"),) * n_arrays
    n_out = 1 if n_arrays == 3 else 3
    rule = SdyShardingRule(dims, (("b", "l", "c"),) * n_out,
                           need_replication_factors=("l", "c"))
    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


_FWD_CP = _make_batch_cp(_fwd_call, 3)
_BWD_CP = _make_batch_cp(_bwd_call, 5)


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
    o = _FWD_CP(q, k, v, sm_scale, num_heads, interpret)
    return o, (q, k, v, o)


def _vjp_bwd(sm_scale, num_heads, interpret, res, do):
    q, k, v, o = res
    return _BWD_CP(q, k, v, o, do, sm_scale, num_heads, interpret)


flash_attention_blc.defvjp(_vjp_fwd, _vjp_bwd)
