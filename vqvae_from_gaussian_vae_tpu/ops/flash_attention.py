"""TPU flash attention with a memory-lean backward for the ViT backbones.

The stock `jax.experimental.pallas.ops.tpu.flash_attention` VJP broadcasts
the dq pass's `di` residual (row-sums of o*do) out to
``(B, H, Q, block_k_major)`` fp32 **before** the kernel launch
(flash_attention.py:1316) even though the dq kernel's BlockSpec only ever
reads a ``MIN_BLOCK_SIZE``-wide tile of it (``di_spec``).  With the
MXU-efficient ``block_k_major=1024`` at the bsqvit training shape
(B=8, H=12, L=1024) that materialises a 402 MB HBM tensor per layer —
0.61 ms each, ~14.6 ms per ae train step — and shrinking ``block_k_major``
to dodge it makes the dq kernel itself 2.5x slower (measured 11 -> 27.5 ms
per step).  Here the VJP is rebound with a dq wrapper that broadcasts
``di`` (and ``l``/``m``) to ``MIN_BLOCK_SIZE`` only, so large k blocks and
a small residual coexist.  Forward/dkv kernels and the dq kernel body are
reused from the upstream module unchanged.

Scope: the unmasked, non-causal, no-segment, no-bias case the image
tokenizers use (models/vit.py routes masked calls through the einsum path).

STATUS: retained as the head-major (B, H, L, D) variant for external
callers and shapes outside ops/flash_blc.py's whole-L-in-VMEM regime
(L > ~4 k).  The production ViT path (models/vit.py) now uses the
layout-native packed kernel in ops/flash_blc.py, which eliminates the
(B, L, C) <-> (B, H, L, D) copies entirely — see docs/kernels.md
round 2d.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.flash_attention import (
    DEFAULT_MASK_VALUE,
    MIN_BLOCK_SIZE,
    BlockSizes,
    _flash_attention_bwd_dkv,
    _flash_attention_dq_kernel,
    _flash_attention_impl,
    _verify_block,
)

__all__ = ["flash_attention", "BlockSizes"]


def _prec_guard(dtype):
    """Pin DEFAULT matmul precision around bf16 kernel launches.

    The upstream kernel bodies issue dots at the ambient default
    precision; under a global jax_default_matmul_precision=highest (the
    on-chip suite mode, tests/conftest.py) that asks Mosaic for an
    fp32-contract tpu.matmul on bf16 tiles, which it rejects ("Bad lhs
    type").  A bf16 dot is one MXU pass at every precision, so this is
    semantically free; fp32 inputs keep the ambient setting.
    """
    if dtype == jnp.float32:
        return contextlib.nullcontext()
    return jax.default_matmul_precision("default")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, sm_scale: float, block_sizes: BlockSizes):
    """o = softmax(q @ k^T * sm_scale) @ v via the Pallas TPU kernel."""
    with _prec_guard(q.dtype):
        return _flash_attention_impl(
            q, k, v, None, None, False, False, sm_scale,
            block_sizes.block_b, block_sizes.block_q,
            block_sizes.block_k_major, block_sizes.block_k, False,
        )


def _fwd(q, k, v, sm_scale, block_sizes):
    with _prec_guard(q.dtype):
        o, l, m = _flash_attention_impl(
            q, k, v, None, None, True, False, sm_scale,
            block_sizes.block_b, block_sizes.block_q,
            block_sizes.block_k_major, block_sizes.block_k, False,
        )
    return o, (q, k, v, o, l, m)


def _bwd(sm_scale, block_sizes, res, do):
    q, k, v, o, l, m = res
    if not block_sizes.has_backward_blocks:
        raise ValueError(
            "Program is being differentiated, but not all backward blocks "
            "are specified in BlockSizes"
        )
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)

    with _prec_guard(q.dtype):
        dk, dv = _flash_attention_bwd_dkv(
            q, k, v, None, None, l, m, do, di,
            block_q_major=block_sizes.block_q_major_dkv,
            block_k_major=block_sizes.block_k_major_dkv,
            block_k=block_sizes.block_k_dkv,
            block_q=block_sizes.block_q_dkv,
            sm_scale=sm_scale, causal=False,
            mask_value=DEFAULT_MASK_VALUE, debug=False,
        )
        dq = _bwd_dq_lean(
            q, k, v, l, m, do, di,
            block_q_major=block_sizes.block_q_dq,
            block_k_major=block_sizes.block_k_major_dq,
            block_k=block_sizes.block_k_dq,
            sm_scale=sm_scale,
        )
    return dq, dk, dv


flash_attention.defvjp(_fwd, _bwd)


def _bwd_dq_lean(q, k, v, l, m, do, di, *, block_q_major, block_k_major,
                 block_k, sm_scale):
    """The upstream `_flash_attention_bwd_dq` wrapper (non-causal, no
    ab/segments) with one change: `di`, like `l`/`m`, is broadcast to
    MIN_BLOCK_SIZE lanes — the width `di_spec` actually reads — instead of
    `block_k_major` (the in-kernel consumer tiles it up itself,
    flash_attention.py:911)."""
    batch_size, num_heads, q_seq_len, head_dim = q.shape
    kv_seq_len = k.shape[2]
    # same divisibility contract as the upstream wrapper: a non-dividing
    # block would silently truncate the grid and leave dq rows garbage
    _verify_block("block_q_dq", "q_seq_len", block_q_major, q_seq_len)
    _verify_block("block_k_major_dq", "kv_seq_len", block_k_major, kv_seq_len)
    _verify_block("block_k_dq", "block_k", block_k, kv_seq_len)

    m = jnp.broadcast_to(m[..., None], (*m.shape, MIN_BLOCK_SIZE))
    l = jnp.broadcast_to(l[..., None], (*l.shape, MIN_BLOCK_SIZE))
    di = jnp.broadcast_to(di[..., None], (*di.shape, MIN_BLOCK_SIZE))

    grid = (
        batch_size,
        num_heads,
        q_seq_len // block_q_major,
        kv_seq_len // block_k_major,
    )

    def qo_index_map(batch_index, head_index, q_seq_index, _):
        return (batch_index, head_index, q_seq_index, 0)

    def kv_index_map(batch_index, head_index, q_seq_index, kv_seq_index):
        del q_seq_index
        return (batch_index, head_index, kv_seq_index, 0)

    qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map)
    kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_index_map)
    lm_spec = pl.BlockSpec((1, 1, block_q_major, MIN_BLOCK_SIZE), qo_index_map)
    di_spec = pl.BlockSpec((1, 1, block_q_major, MIN_BLOCK_SIZE), qo_index_map)

    in_specs = [
        qo_spec,       # q
        kv_spec,       # k
        kv_spec,       # v
        None,          # ab
        None,          # q_segment_ids
        None,          # kv_segment_ids
        lm_spec,       # l
        lm_spec,       # m
        qo_spec,       # do
        di_spec,       # di
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        None,          # ds (ab grad)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map),
        None,
    ]
    scratch_shapes = [pltpu.VMEM((block_q_major, head_dim), jnp.float32)]

    kernel = functools.partial(
        _flash_attention_dq_kernel,
        sm_scale=sm_scale,
        causal=False,
        mask_value=DEFAULT_MASK_VALUE,
        block_k=block_k,
        kv_seq_len=kv_seq_len,
    )
    name_scope = (
        f"flash_mha_bwd_dq_lean_{block_q_major=}_{block_k_major=}_{block_k=}"
    )
    with jax.named_scope(name_scope):
        dq, _ = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                )
            ),
        )(q, k, v, None, None, None, l, m, do, di)
    return dq
