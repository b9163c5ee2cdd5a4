"""PSNR on the 255 scale (`/root/reference/pit/evaluations/psnr.py`)."""

from __future__ import annotations

import jax.numpy as jnp


def get_psnr(x_input, x_recon, zero_mean: bool = False, is_video: bool = False):
    """Per-sample PSNR.  zero_mean: inputs are in [-1, 1] (`psnr.py:17-27`).

    NHWC here (the reference is NCHW); reduction axes are all but batch.
    """
    if zero_mean:
        a = (x_input + 1.0) * 127.5
        b = (x_recon + 1.0) * 127.5
    else:
        a = x_input * 255.0
        b = x_recon * 255.0
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=axes)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))
