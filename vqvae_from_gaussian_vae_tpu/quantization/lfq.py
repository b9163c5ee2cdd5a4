"""Lookup-Free Quantization baseline (`/root/reference/pit/quantization/lfq.py`,
from Open-MAGVIT2).

Sign quantization to {-1,+1} with big-endian bit packing, an entropy auxiliary
loss (sample-entropy minimisation + batch-entropy maximisation at temperature
0.01), a commit loss, and straight-through gradients.

Deviation: the reference's dequant hardcodes ``15 - i`` bit order
(`lfq.py:221`), correct only when the total bit width is 16; we use the
generic ``c - 1 - i`` (identical for the shipped configs).
"""

from __future__ import annotations

from math import log2
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.quantization.common import ALL_FORMATS, from_tokens, to_tokens


def lfq_entropy_loss(
    logits,
    temperature: float = 0.01,
    sample_minimization_weight: float = 1.0,
    batch_maximization_weight: float = 1.0,
    eps: float = 1e-5,
):
    """(`lfq.py:56-76`) - returns (sample_entropy, codebook_entropy, loss)."""
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    log_probs = jax.nn.log_softmax(logits / temperature + eps, axis=-1)
    avg_probs = jnp.mean(probs.reshape(-1, probs.shape[-1]), axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + eps))
    sample_entropy = jnp.mean(-jnp.sum(probs * log_probs, axis=-1))
    loss = sample_minimization_weight * sample_entropy - batch_maximization_weight * avg_entropy
    return sample_entropy, avg_entropy, loss


def _full_codebook(codebook_dim: int) -> np.ndarray:
    """All 2^d sign patterns, big-endian bits -> {-1,+1} (`lfq.py:108-111`)."""
    codes = np.arange(2**codebook_dim)
    bits = (codes[:, None] & (2 ** np.arange(codebook_dim))) != 0
    return (bits * 2.0 - 1.0).astype(np.float32)


class LFQQuantizer(nn.Module):
    format: str
    codebook_size: int
    num_codebooks: int = 1
    sample_minimization_weight: float = 1.0
    batch_maximization_weight: float = 1.0

    def setup(self):
        assert self.format in ALL_FORMATS
        self.codebook_dim = int(log2(self.codebook_size))
        self._codebook_np = _full_codebook(self.codebook_dim)

    def __call__(self, z, train: bool = False, duals=None) -> Tuple[jnp.ndarray, dict]:
        zt, hw = to_tokens(z, self.format)
        b, l, c = zt.shape
        x = zt.reshape(b, l, self.num_codebooks, c // self.num_codebooks)

        quantized = jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)
        qflat = quantized.reshape(b, l, c)
        bits = ((qflat + 1.0) / 2.0).astype(jnp.int32)
        # big-endian pack over the full channel dim (lfq.py:154-158)
        indices = jnp.zeros((b, l, 1), jnp.int32)
        for i in range(c):
            indices = indices * 2 + bits[:, :, i : i + 1]

        zero = jnp.float32(0.0)
        if train:
            cb = jnp.asarray(self._codebook_np)
            logits = 2.0 * jnp.einsum("blcd,jd->blcj", x, cb)
            per_sample_entropy, codebook_entropy, entropy_aux_loss = lfq_entropy_loss(
                logits,
                sample_minimization_weight=self.sample_minimization_weight,
                batch_maximization_weight=self.batch_maximization_weight,
            )
            commit_loss = jnp.mean((x - jax.lax.stop_gradient(quantized)) ** 2)
        else:
            per_sample_entropy = codebook_entropy = entropy_aux_loss = commit_loss = zero

        quantized = x + jax.lax.stop_gradient(quantized - x)  # STE
        quantized = quantized.reshape(b, l, c)

        quantized = from_tokens(quantized, self.format, hw)
        if hw is not None:
            indices = indices.reshape(b, hw[0], hw[1], 1)
        info = {
            "indices": indices,
            "entropy_aux_loss": entropy_aux_loss,
            "per_sample_entropy": jax.lax.stop_gradient(per_sample_entropy),
            "codebook_entropy": jax.lax.stop_gradient(codebook_entropy),
            "commit_loss": commit_loss,
        }
        return quantized, info

    def dequant(self, indices):
        if self.format in ("bchw", "bhwc"):
            b, h, w, ng = indices.shape
            hw, l = (h, w), h * w
            flat = indices.reshape(b, l, ng)
        else:
            b, l, ng = indices.shape
            hw, flat = None, indices
        c = self.num_codebooks * self.codebook_dim
        rem = flat
        cols = [None] * c
        for i in range(c):
            cols[c - 1 - i] = (rem % 2).astype(jnp.float32)
            rem = rem // 2
        quantized = jnp.stack(cols, axis=-1)  # (b, l, ng, c)
        quantized = quantized * 2.0 - 1.0
        if hw is not None:
            # (b, l, ng, c) -> channel = ng_idx * c + bit, the reference's
            # "b (h w) c n -> b (c n) h w" flattening (lfq.py:226), NHWC here
            return quantized.reshape(b, hw[0], hw[1], ng * c)
        return quantized.reshape(b, l, ng * c)
