"""Pallas TPU kernel: fused score-matmul + running argmax for the GQ search.

Replaces the reference's gq_cuda extension (`/root/reference/gq_cuda_extension/
gq_cuda/csrc/cuda/gq_cuda.cu:12-40`).  The CUDA kernel materialises the full
(rows, 65536) score matrix in HBM and argmaxes it with a second pass
(`gaussian.py:128-132`); here the scores live only in VMEM a (BLOCK_R,
BLOCK_N) tile at a time and each grid step folds its tile into a running
(best value, best index) per row, so HBM traffic is O(R + N), not O(R*N).

Operands come pre-factored from :func:`..gq_search.score_operands`:
    S = A @ B,  A: (R, 2G) row statistics,  B: (2G, N) codebook features.
The matmul hits the MXU; max/argmax run on the VPU over the same VMEM tile.

Tie-breaking matches torch.argmax (first maximum): the code-block grid axis
is iterated in ascending order, jnp.argmax takes the first max inside a
block, and the cross-block merge uses strict ``>``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_total: int, block_n: int, a_ref, b_ref, val_ref, idx_ref):
    j = pl.program_id(1)

    s = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    # mask padded codebook columns (when N is not a multiple of block_n)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_n
    s = jnp.where(col < n_total, s, -jnp.inf)

    local_arg = jnp.argmax(s, axis=1)  # first max within the tile
    local_val = jnp.max(s, axis=1)
    local_idx = local_arg.astype(jnp.int32) + j * block_n

    @pl.when(j == 0)
    def _():
        val_ref[:, 0] = local_val
        idx_ref[:, 0] = local_idx

    @pl.when(j > 0)
    def _():
        better = local_val > val_ref[:, 0]  # strict: earlier block wins ties
        val_ref[:, 0] = jnp.where(better, local_val, val_ref[:, 0])
        idx_ref[:, 0] = jnp.where(better, local_idx, idx_ref[:, 0])


@functools.partial(
    jax.jit, static_argnames=("block_r", "block_n", "interpret")
)
def gq_argmax_pallas(
    a: jax.Array,
    b: jax.Array,
    block_r: int = 512,
    block_n: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    # defaults from a v5e sweep at the production shape (16384 x 65536 x
    # group 16): (512, 8192) = 3.1 ms vs 4.4 ms at (256, 2048); see
    # scripts/tune_gq_kernel.py
    """argmax_n (A @ B)[r, n] -> (R,) int32, without materialising A @ B.

    a: (R, K) float32, b: (K, N) float32.  K is small (2*group, e.g. 32).
    """
    r, k = a.shape
    n = b.shape[1]
    block_r = min(block_r, max(8, ((r + 7) // 8) * 8))
    block_n = min(block_n, max(128, ((n + 127) // 128) * 128))
    r_pad = ((r + block_r - 1) // block_r) * block_r
    n_pad = ((n + block_n - 1) // block_n) * block_n
    if r_pad != r:
        a = jnp.pad(a, ((0, r_pad - r), (0, 0)))
    if n_pad != n:
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))

    grid = (r_pad // block_r, n_pad // block_n)
    val, idx = pl.pallas_call(
        functools.partial(_kernel, n, block_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * k * n_pad,
            bytes_accessed=(r_pad * k + k * n_pad + 2 * r_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
    del val
    return idx[:r, 0]
