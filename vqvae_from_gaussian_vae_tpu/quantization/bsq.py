"""Binary Spherical Quantization baseline (`/root/reference/pit/quantization/bsq.py`).

L2-normalise tokens, sign-quantize to {-1,+1}/sqrt(embed_dim), pack bits into
one index per token, and (in training) apply a per-bit sigmoid entropy loss.

The reference implementation hardcodes 16-bit loops (`bsq.py:97,146`), valid
only for its shipped (codebook_size=2, num_codebooks=16) config; this version
is generic over embed_dim = log2(codebook_size) * num_codebooks.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.quantization.common import from_tokens, to_tokens
from vqvae_from_gaussian_vae_tpu.quantization.lfq import LFQQuantizer


def bsq_entropy_loss(
    x,
    embed_dim: int,
    temperature: float = 0.01,
    sample_minimization_weight: float = 1.0,
    batch_maximization_weight: float = 1.0,
    eps: float = 1e-5,
):
    """Per-bit two-way entropy loss (`bsq.py:14-37`)."""
    probs = jax.nn.sigmoid(-4.0 * x / (embed_dim**0.5) / temperature)
    probs = jnp.stack([probs, 1.0 - probs], axis=-1)
    log_probs = jnp.log(probs + eps)
    # mean over all leading axes, keep the last two (g=d-axis, 2-way)
    avg_probs = probs.reshape(-1, probs.shape[-2], probs.shape[-1]).mean(axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + eps))
    sample_entropy = jnp.mean(-jnp.sum(probs * log_probs, axis=(-2, -1)))
    loss = sample_minimization_weight * sample_entropy - batch_maximization_weight * avg_entropy
    return sample_entropy, avg_entropy, loss


class BSQQuantizer(LFQQuantizer):
    def setup(self):
        super().setup()
        self.embed_dim = self.codebook_dim * self.num_codebooks

    def __call__(self, z, train: bool = False, duals=None) -> Tuple[jnp.ndarray, dict]:
        zt, hw = to_tokens(z, self.format)
        b, l, c = zt.shape

        # L2-normalise over the channel dim (bsq.py:85)
        x = zt / jnp.clip(jnp.linalg.norm(zt, axis=-1, keepdims=True), 1e-12)
        q_scale = 1.0 / (self.embed_dim**0.5)
        x = x.reshape(b, l, self.num_codebooks, c // self.num_codebooks)

        quantized = jnp.where(x > 0, 1.0, -1.0).astype(x.dtype)
        # pack the per-codebook sign bits of each d-position into one index,
        # iterating codebooks most-significant-first (bsq.py:95-99 generalised)
        bits = ((quantized + 1.0) / 2.0).astype(jnp.int32)  # (b, l, nc, d)
        indices = jnp.zeros_like(bits[:, :, 0, :])
        for i in range(self.num_codebooks):
            indices = indices * 2 + bits[:, :, i, :]

        if train:
            per_sample_entropy, codebook_entropy, entropy_aux_loss = bsq_entropy_loss(
                x,
                self.embed_dim,
                sample_minimization_weight=self.sample_minimization_weight,
                batch_maximization_weight=self.batch_maximization_weight,
            )
        else:
            zero = jnp.float32(0.0)
            per_sample_entropy = codebook_entropy = entropy_aux_loss = zero

        quantized = x + jax.lax.stop_gradient(quantized - x)  # STE
        quantized = quantized * q_scale
        quantized = quantized.reshape(b, l, c)

        quantized = from_tokens(quantized, self.format, hw)
        if hw is not None:
            indices = indices.reshape(b, hw[0], hw[1], -1)
        info = {
            "indices": indices,
            "entropy_aux_loss": entropy_aux_loss,
            "per_sample_entropy": jax.lax.stop_gradient(per_sample_entropy),
            "codebook_entropy": jax.lax.stop_gradient(codebook_entropy),
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
        nbits = self.num_codebooks  # bits packed per index (one per codebook)
        rem = flat
        cols = [None] * nbits
        for i in range(nbits):
            cols[nbits - 1 - i] = (rem % 2).astype(jnp.float32)
            rem = rem // 2
        quantized = jnp.stack(cols, axis=-1)  # (b, l, ng, nbits)
        q_scale = 1.0 / (self.embed_dim**0.5)
        quantized = (quantized * 2.0 - 1.0) * q_scale
        # forward channel order is (codebook, d-position) = (bit, ng):
        # channel = bit_idx * ng + ng_idx
        quantized = quantized.transpose(0, 1, 3, 2).reshape(b, l, nbits * ng)
        if hw is not None:
            return quantized.reshape(b, hw[0], hw[1], nbits * ng)
        return quantized
