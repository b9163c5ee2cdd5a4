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


def _kernel(n_total: int, block_n: int, sub_n: int, masked: bool,
            a_ref, b_ref, val_ref, idx_ref):
    j = pl.program_id(1)
    a = a_ref[:]
    nsub = block_n // sub_n

    def _dot(p):
        return jnp.dot(a, b_ref[:, p * sub_n:(p + 1) * sub_n],
                       preferred_element_type=jnp.float32)

    def _local(p, s):
        if masked:
            # padded codebook columns (N not a multiple of block_n) must
            # never win; skipped entirely on exact grids — the per-element
            # compare+select costs as much as the max reduce itself
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + j * block_n + p * sub_n)
            s = jnp.where(col < n_total, s, -jnp.inf)
        local_arg = jnp.argmax(s, axis=1)  # first max within the tile
        local_val = jnp.max(s, axis=1)
        return local_val, local_arg.astype(jnp.int32) + j * block_n + p * sub_n

    # software-pipeline the sub-tiles: issue sub-tile p+1's MXU dot before
    # sub-tile p's VPU max/argmax, keeping the per-subtile results in
    # registers (no val_ref round-trips inside the loop) and merging once
    # per grid step
    locs = []
    prev = _dot(0)
    for p in range(1, nsub):
        cur = _dot(p)
        locs.append(_local(p - 1, prev))
        prev = cur
    locs.append(_local(nsub - 1, prev))
    local_val, local_idx = locs[0]
    for v2, i2 in locs[1:]:
        better = v2 > local_val  # strict: earlier sub-tile wins ties
        local_val = jnp.where(better, v2, local_val)
        local_idx = jnp.where(better, i2, local_idx)

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
    jax.jit, static_argnames=("block_r", "block_n", "sub_n", "interpret")
)
def gq_argmax_pallas(
    a: jax.Array,
    b: jax.Array,
    block_r: int = 512,
    block_n: int = 8192,
    sub_n: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    # (block_r, block_n, sub_n) from v5e sweeps at the production shape
    # (16384 x 65536 x group 16): round-4 re-sweep measured sub_n=4096
    # ~7% faster than 2048 (3.18 vs 3.43 ms incl. dispatch) — see
    # scripts/tune_gq_kernel.py
    """argmax_n (A @ B)[r, n] -> (R,) int32, without materialising A @ B.

    a: (R, K) float32, b: (K, N) float32.  K is small (2*group, e.g. 32).
    """
    r, k = a.shape
    n = b.shape[1]
    block_r = min(block_r, max(8, ((r + 7) // 8) * 8))
    block_n = min(block_n, max(128, ((n + 127) // 128) * 128))
    sub_n = min(sub_n, block_n)
    if block_n % sub_n:
        sub_n = block_n
    r_pad = ((r + block_r - 1) // block_r) * block_r
    n_pad = ((n + block_n - 1) // block_n) * block_n
    if r_pad != r:
        a = jnp.pad(a, ((0, r_pad - r), (0, 0)))
    if n_pad != n:
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))

    grid = (r_pad // block_r, n_pad // block_n)
    val, idx = pl.pallas_call(
        functools.partial(_kernel, n, block_n, sub_n, n_pad != n),
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
