"""Finite Scalar Quantization baseline (`/root/reference/pit/quantization/fsq.py`,
itself FSQ paper arXiv 2309.15505 appendix A.1).

Per-channel tanh bounding (with the even-level atanh offset shift), round with
straight-through gradients, and mixed-radix index packing across channels.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.quantization.common import (
    ALL_FORMATS,
    from_tokens,
    round_ste,
    to_tokens,
)


class FSQQuantizer(nn.Module):
    levels: Sequence[int]
    format: str

    def setup(self):
        assert self.format in ALL_FORMATS
        self._levels_np = np.asarray(self.levels, dtype=np.int32)
        self.dim = len(self.levels)

    def _quantize(self, zhat, eps: float = 1e-3):
        """tanh-bound + round (fsq.py:29-41)."""
        levels = jnp.asarray(self._levels_np, jnp.float32)
        half_l = (levels - 1.0) * (1.0 + eps) / 2.0
        offset = jnp.where(jnp.asarray(self._levels_np) % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        bounded = jnp.tanh(zhat + shift) * half_l - offset
        half_width = jnp.asarray(self._levels_np // 2, jnp.float32)
        rounded = round_ste(bounded)
        zq = rounded / half_width
        indices = (rounded + half_width).astype(jnp.int32)
        return zq, indices

    def __call__(self, z, train: bool = False, duals=None) -> Tuple[jnp.ndarray, dict]:
        zt, hw = to_tokens(z.astype(jnp.float32), self.format)
        ndim = zt.shape[1] * zt.shape[2] if hw is None else int(np.prod(z.shape[1:]))
        zq, per_level = self._quantize(zt)
        # mixed-radix packing, most-significant level first (fsq.py:57-61)
        indices = jnp.zeros_like(per_level[:, :, 0:1])
        for li in range(self.dim):
            indices = indices * int(self._levels_np[li]) + per_level[:, :, li : li + 1]
        bits = float(np.sum(np.log2(self._levels_np))) * ndim
        zq = from_tokens(zq, self.format, hw)
        if hw is not None:
            b = indices.shape[0]
            indices = indices.reshape(b, hw[0], hw[1], 1)
        return zq, {"indices": indices, "bits": jnp.float32(bits)}

    def dequant(self, indices):
        if self.format in ("bchw", "bhwc"):
            b, h, w, _ = indices.shape
            hw = (h, w)
            flat = indices.reshape(b, h * w, 1)
        else:
            hw, flat = None, indices
        digits = []
        rem = flat
        for li in reversed(range(self.dim)):
            digits.append(rem % int(self._levels_np[li]))
            rem = rem // int(self._levels_np[li])
        per_level = jnp.concatenate(digits[::-1], axis=2).astype(jnp.float32)
        half_width = jnp.asarray(self._levels_np // 2, jnp.float32)
        zq = (per_level - half_width) / half_width
        return from_tokens(zq, self.format, hw)

    def generate(self, rng, shape):
        """Sample uniform codes and decode them (fsq.py:91-103).

        shape follows the native layout: (B,H,W,C) for image formats,
        (B,L,C) for blc.
        """
        import jax

        if self.format in ("bchw", "bhwc"):
            bl = (shape[0], shape[1] * shape[2], 1)
        else:
            bl = (shape[0], shape[1], 1)
        parts = []
        for li, level in enumerate(self._levels_np):
            rng, sub = jax.random.split(rng)
            parts.append(jax.random.randint(sub, bl, 0, int(level)))
        per_level = jnp.concatenate(parts, axis=2)
        indices = jnp.zeros_like(per_level[:, :, 0:1])
        for li in range(self.dim):
            indices = indices * int(self._levels_np[li]) + per_level[:, :, li : li + 1]
        if self.format in ("bchw", "bhwc"):
            indices = indices.reshape(shape[0], shape[1], shape[2], 1)
        return self.dequant(indices)
