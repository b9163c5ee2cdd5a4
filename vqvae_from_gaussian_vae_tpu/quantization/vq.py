"""Classic VQ-VAE quantizer baseline (`/root/reference/pit/quantization/vq.py`).

L2-argmin over a learnable codebook with straight-through gradients and the
commit/codebook loss pair.  Faithful details: the channel axis is split as
c -> (dim, codebook_num) row-major, so sub-codebook i consumes the strided
channels {i, codebook_num+i, ...} (`vq.py:53`); the ``legacy`` flag keeps the
reference's swapped beta placement (`vq.py:79-87`).

TPU-first: all sub-codebook distance computations are batched into a single
einsum instead of the reference's python loop - one MXU matmul of shape
(B*H*W, dim) x (dim, n) per codebook, stacked.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.quantization.common import ALL_FORMATS, from_tokens, to_tokens


class VQQuantizer(nn.Module):
    format: str
    n: int
    dim: int
    beta: float = 0.25
    codebook_num: int = 1
    legacy: bool = True

    def setup(self):
        assert self.format in ALL_FORMATS
        # uniform(-1/n, 1/n) init, matching nn.Embedding.uniform_ (vq.py:33-34)
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n, 1.0 / self.n
            ),
            (self.n, self.dim),
        )

    def __call__(self, z, train: bool = False, duals=None) -> Tuple[jnp.ndarray, dict]:
        zt, hw = to_tokens(z, self.format)
        b, l, c = zt.shape
        assert self.dim * self.codebook_num == c
        # (B*L, dim, codebook_num): strided channel split, like torch .view
        zf = zt.reshape(-1, self.dim, self.codebook_num)
        e = self.embedding
        # d[r, n, i] = ||z_ri - e_n||^2, batched over sub-codebooks via one
        # einsum.  HIGHEST precision: the argmin INDEX is the output — at
        # the TPU default (one-bf16-pass fp32 dots) near-ties flip vs the
        # reference's torch fp32 indices (caught by the on-TPU suite run)
        d = (
            jnp.sum(zf**2, axis=1)[:, None, :]
            + jnp.sum(e**2, axis=1)[None, :, None]
            - 2.0 * jnp.einsum("rdi,nd->rni", zf, e,
                               precision=jax.lax.Precision.HIGHEST)
        )
        idx = jnp.argmin(d, axis=1)  # (B*L, codebook_num)
        zq = jnp.take(e, idx, axis=0)  # (B*L, codebook_num, dim)
        zq = zq.transpose(0, 2, 1)  # (B*L, dim, codebook_num)

        zf_img = zf.reshape(zt.shape)
        zq_img = zq.reshape(zt.shape)
        if not self.legacy:
            loss = self.beta * jnp.mean(
                (jax.lax.stop_gradient(zq_img) - zf_img) ** 2
            ) + jnp.mean((zq_img - jax.lax.stop_gradient(zf_img)) ** 2)
        else:
            loss = jnp.mean(
                (jax.lax.stop_gradient(zq_img) - zf_img) ** 2
            ) + self.beta * jnp.mean((zq_img - jax.lax.stop_gradient(zf_img)) ** 2)

        zq_img = zf_img + jax.lax.stop_gradient(zq_img - zf_img)  # STE
        indices = idx.reshape(b, l, self.codebook_num)

        zq_out = from_tokens(zq_img, self.format, hw)
        if hw is not None:
            indices = indices.reshape(b, hw[0], hw[1], self.codebook_num)
        return zq_out, {"indices": indices, "codebook_loss": loss}

    def dequant(self, indices):
        if self.format in ("bchw", "bhwc"):
            b, h, w, cn = indices.shape
            flat = indices.reshape(-1, cn)
            hw = (h, w)
            l = h * w
        else:
            b, l, cn = indices.shape
            flat = indices.reshape(-1, cn)
            hw = None
        zq = jnp.take(self.embedding, flat, axis=0)  # (B*L, cn, dim)
        zq = zq.transpose(0, 2, 1).reshape(b, l, self.dim * self.codebook_num)
        return from_tokens(zq, self.format, hw)
