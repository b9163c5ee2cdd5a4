"""SSIM and MS-SSIM in jnp (`/root/reference/pit/evaluations/ssim.py`, which
wraps pytorch_msssim - absent from this image, so the algorithm is
implemented here following Wang et al. 2003/2004 with pytorch_msssim's
conventions: 11-tap Gaussian window (sigma 1.5) applied separably per
channel with VALID padding, K1=0.01, K2=0.03, MS-SSIM over 5 scales with the
standard weights and 2x avg-pool downsampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable per-channel Gaussian filter, VALID padding.  x: NHWC."""
    c = x.shape[-1]
    kh = jnp.tile(kernel.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def _ssim_per_channel(x, y, data_range: float, win_size: int = 11, sigma: float = 1.5):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = jnp.asarray(_gaussian_kernel(win_size, sigma))
    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = _blur(x * x, kernel) - mu_xx
    sigma_yy = _blur(y * y, kernel) - mu_yy
    sigma_xy = _blur(x * y, kernel) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def ssim(x, y, data_range: float = 255.0):
    """Per-sample SSIM, NHWC."""
    return _ssim_per_channel(x.astype(jnp.float32), y.astype(jnp.float32), data_range)[0]


def ms_ssim(x, y, data_range: float = 255.0):
    """Per-sample MS-SSIM, NHWC; needs min(H, W) > 160 for 5 scales."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    values = []
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = _ssim_per_channel(x, y, data_range)
        values.append(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs)
        if i != len(_MSSSIM_WEIGHTS) - 1:
            pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
            if pad_h or pad_w:
                x = x[:, : x.shape[1] - pad_h, : x.shape[2] - pad_w]
                y = y[:, : y.shape[1] - pad_h, : y.shape[2] - pad_w]
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    values = jnp.stack(values, axis=0)  # (scales, B)
    # pytorch_msssim: relu the per-scale terms to avoid negative roots
    values = jnp.maximum(values, 0.0)
    return jnp.prod(values ** weights[:, None], axis=0)


def get_ssim_and_msssim(x_input, x_recon, zero_mean: bool = False, is_video: bool = False):
    """(`ssim.py:30-63`): returns (ssim, ms_ssim) on the 255 scale; MS-SSIM
    is NaN below 256px, like the reference."""
    if zero_mean:
        a = (x_input + 1.0) * 127.5
        b = (x_recon + 1.0) * 127.5
    else:
        a = x_input * 255.0
        b = x_recon * 255.0
    s = ssim(a, b)
    if x_input.shape[1] < 256 or x_input.shape[2] < 256:
        return s, jnp.full_like(s, jnp.nan)
    return s, ms_ssim(a, b)
