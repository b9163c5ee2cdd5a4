"""Nearest-prior-sample search: the GQ tokenizer's core op.

For each latent row r with posterior N(mu_r, diag(std_r^2)) and each codebook
entry c_n, the reference scores

    score[r, n] = sum_d log N(c_nd; mu_rd, std_rd) - beta * sum_d log N(c_nd; 0, 1)

and picks argmax_n (torch backend `/root/reference/pit/quantization/
gaussian.py:134-150`; CUDA kernel `gq_cuda_extension/.../gq_cuda.cu:12-40`).

TPU-first reformulation (this file): dropping per-row constants and scaling
by 2 leaves the argmax unchanged and turns the whole score matrix into ONE
matmul that maps straight onto the MXU:

    2*score[r,n] + const_r = 2*sum_d c_nd * (mu_rd/var_rd)
                             + sum_d c_nd^2 * (beta - 1/var_rd)

i.e.  S = A @ B  with  A = [2*mu*ivar, beta - ivar]  (R, 2G)
                       B = [C; C^2]                  (2G, N)

The CUDA reference materialises the full (R, 65536) score matrix in HBM and
argmaxes it with a second kernel (`gaussian.py:128-132`).  Here the argmax is
fused: both the Pallas kernel and the XLA fallback keep only a running
(best_value, best_index) per row, so nothing R x N ever touches HBM.

Tie-breaking matches torch.argmax (first maximum): code blocks are visited in
ascending order, jnp.argmax picks the first max within a block, and the
cross-block merge uses a strict ``>``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def score_operands(mu: jax.Array, std: jax.Array, codebook: jax.Array, beta: float):
    """Build the (A, B) matmul operands described in the module docstring.

    mu, std: (R, G) float32.  codebook: (N, G) float32.
    Returns A (R, 2G) float32, B (2G, N) float32.
    """
    mu = mu.astype(jnp.float32)
    std = std.astype(jnp.float32)
    c = codebook.astype(jnp.float32)
    ivar = 1.0 / (std * std)
    a = jnp.concatenate([2.0 * mu * ivar, jnp.float32(beta) - ivar], axis=-1)
    b = jnp.concatenate([c, c * c], axis=-1).T
    return a, b


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_r", "block_n"))
def _search_xla(a: jax.Array, b: jax.Array, block_r: int, block_n: int) -> jax.Array:
    """Blocked argmax of A @ B without materialising the score matrix.

    Outer lax.map over row blocks, inner lax.scan over code blocks carrying
    the running (best value, best index).
    """
    r, k = a.shape
    n = b.shape[1]
    r_pad = _round_up(r, block_r)
    n_pad = _round_up(n, block_n)
    a = jnp.pad(a, ((0, r_pad - r), (0, 0)))
    # Padded codes must never win: B columns of zero give score 0 which can
    # beat real negative scores, so mask them to -inf post-matmul instead.
    b = jnp.pad(b, ((0, 0), (0, n_pad - n)))
    b_blocks = b.reshape(k, n_pad // block_n, block_n).transpose(1, 0, 2)
    col_valid = (jnp.arange(n_pad) < n).reshape(n_pad // block_n, block_n)

    def row_block(a_blk):
        def step(carry, xs):
            best_val, best_idx = carry
            b_blk, valid, base = xs
            s = jnp.dot(a_blk, b_blk, preferred_element_type=jnp.float32)
            s = jnp.where(valid[None, :], s, -jnp.inf)
            blk_arg = jnp.argmax(s, axis=1)
            blk_val = jnp.take_along_axis(s, blk_arg[:, None], axis=1)[:, 0]
            better = blk_val > best_val
            best_val = jnp.where(better, blk_val, best_val)
            best_idx = jnp.where(better, base + blk_arg.astype(jnp.int32), best_idx)
            return (best_val, best_idx), None

        init = (
            jnp.full((block_r,), -jnp.inf, jnp.float32),
            jnp.zeros((block_r,), jnp.int32),
        )
        bases = (jnp.arange(n_pad // block_n) * block_n).astype(jnp.int32)
        (best_val, best_idx), _ = jax.lax.scan(step, init, (b_blocks, col_valid, bases))
        return best_idx

    a_rows = a.reshape(r_pad // block_r, block_r, k)
    idx = jax.lax.map(row_block, a_rows).reshape(r_pad)
    return idx[:r]


def gq_search(
    mu: jax.Array,
    std: jax.Array,
    codebook: jax.Array,
    beta: float = 1.0,
    backend: str = "auto",
    block_r: int = 1024,
    block_n: int = 4096,
) -> jax.Array:
    """Return (R,) int32 indices of the best codebook entry per row.

    backend: "pallas" (TPU fused kernel), "xla" (blocked scan), or "auto"
    (pallas on TPU, xla elsewhere).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    a, b = score_operands(mu, std, codebook, beta)
    if backend == "pallas":
        from vqvae_from_gaussian_vae_tpu.ops.gq_pallas import gq_argmax_pallas

        return gq_argmax_pallas(a, b)
    if backend == "xla":
        r = a.shape[0]
        return _search_xla(a, b, min(block_r, _round_up(r, 8)), block_n)
    raise ValueError(f"unknown gq_search backend {backend!r}")


def gq_scores_reference(
    mu: np.ndarray, std: np.ndarray, codebook: np.ndarray, beta: float = 1.0
) -> np.ndarray:
    """Unreduced (R, N) log-density-ratio scores, the literal formula of the
    reference torch backend (`gaussian.py:142-147`).  Test oracle only."""
    mu = mu[:, None, :].astype(np.float64)
    std = std[:, None, :].astype(np.float64)
    c = codebook[None, :, :].astype(np.float64)
    log_q = -0.5 * ((c - mu) / std) ** 2 - np.log(std) - 0.5 * np.log(2 * np.pi)
    log_p = -0.5 * c**2 - 0.5 * np.log(2 * np.pi)
    return (log_q - beta * log_p).sum(axis=2)
