"""Shared helpers for the quantizer/regularizer family.

All quantizers share one protocol (mirroring the reference's uniform
`forward(z) -> (zhat, info)` / `dequant(indices)` interface, SURVEY.md L2):

    zhat, info = quantizer.apply(vars, z, train=..., rngs=...)
    zhat       = quantizer.apply(vars, indices, method="dequant")

Layout: this framework is NHWC-native (TPU prefers channel-last).  Config
``format`` tokens keep the reference's spelling for YAML compatibility:
"bchw" (and the native alias "bhwc") mean a spatial image tensor laid out
(B, H, W, C); "blc" means tokens (B, L, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGE_FORMATS = ("bchw", "bhwc")
TOKEN_FORMATS = ("blc",)
ALL_FORMATS = IMAGE_FORMATS + TOKEN_FORMATS


def to_tokens(z: jnp.ndarray, fmt: str):
    """(B,H,W,C)->(B,L,C) for image formats; identity for blc.

    Returns (tokens, hw) where hw is (H, W) or None.
    """
    if fmt in IMAGE_FORMATS:
        b, h, w, c = z.shape
        return z.reshape(b, h * w, c), (h, w)
    if fmt in TOKEN_FORMATS:
        return z, None
    raise ValueError(f"unknown format {fmt!r}")


def from_tokens(z: jnp.ndarray, fmt: str, hw):
    if fmt in IMAGE_FORMATS:
        b, l, c = z.shape
        h, w = hw
        return z.reshape(b, h, w, c)
    return z


def round_ste(z: jnp.ndarray) -> jnp.ndarray:
    """Round with straight-through gradient (`/root/reference/pit/
    quantization/fsq.py:6-8`)."""
    return z + jax.lax.stop_gradient(jnp.round(z) - z)
