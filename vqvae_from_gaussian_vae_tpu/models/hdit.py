"""Hourglass diffusion transformer ("HDiT") - the reference's `poster`
denoiser family (`/root/reference/pit/modules/hdit.py`, the k-diffusion
ImageTransformerDenoiserModelV2: hourglass token pyramid with local attention
at high resolution and global attention at the bottleneck, AxialRoPE,
Fourier time conditioning, AdaLN modulation).

TPU-first re-design rather than a port: local attention is non-overlapping
shifted-window attention expressed as pure reshapes (the reference's NATTEN
neighborhood attention needs gather kernels that map poorly onto the MXU;
shifted windows reach the same receptive field with dense batched matmuls),
token merge/split are linear 2x2 pixel-(un)shuffles, and the whole model is
static-shape jittable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.ops.flash_blc import sdpa_token_major


class FourierFeatures(nn.Module):
    features: int = 256

    @nn.compact
    def __call__(self, t):
        freqs = self.param(
            "freqs", nn.initializers.normal(1.0), (self.features // 2,)
        )
        ang = 2.0 * jnp.pi * t[:, None] * jax.lax.stop_gradient(freqs)[None, :]
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class AdaLN(nn.Module):
    """LayerNorm modulated by the conditioning vector (scale, shift)."""

    @nn.compact
    def __call__(self, x, cond):
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32)(x)
        mod = nn.Dense(2 * x.shape[-1], kernel_init=nn.initializers.zeros,
                       name="mod")(cond)
        scale, shift = jnp.split(mod, 2, axis=-1)
        return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _axial_rope(q, k, grid: Tuple[int, int]):
    """Rotary position embedding applied separately along H and W axes.

    q, k: token-major (B, L, heads, hd) with L = H*W; the first half of
    head dims rotates with the row coordinate, the second half with the
    column coordinate.
    """
    b, l, h, hd = q.shape
    gh, gw = grid
    half = hd // 2
    quarter = half // 2

    def rot(x, pos, dim_start, n):
        # rotate feature pairs [dim_start : dim_start+2n) by pos*theta
        idx = jnp.arange(n)
        theta = 10000.0 ** (-idx / max(n, 1))
        ang = pos[:, None, None] * theta[None, None, :]  # (L, 1, n)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        x1 = x[..., dim_start : dim_start + n]
        x2 = x[..., dim_start + n : dim_start + 2 * n]
        out1 = x1 * cos - x2 * sin
        out2 = x1 * sin + x2 * cos
        # rotation math runs fp32 (cos/sin above); cast back so the
        # scatter into a bf16 x stays same-dtype (fp32->bf16 scatter is a
        # FutureWarning today and an error in future JAX).
        return x.at[..., dim_start : dim_start + n].set(
            out1.astype(x.dtype)
        ).at[..., dim_start + n : dim_start + 2 * n].set(out2.astype(x.dtype))

    rows = jnp.repeat(jnp.arange(gh), gw).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(gw), gh).astype(jnp.float32)
    q = rot(rot(q, rows, 0, quarter), cols, half, quarter)
    k = rot(rot(k, rows, 0, quarter), cols, half, quarter)
    return q, k


class HDiTBlock(nn.Module):
    """AdaLN -> (windowed|global) MHA with AxialRoPE -> AdaLN -> GEGLU MLP."""

    width: int
    heads: int
    window: int = 0  # 0: global attention
    shift: bool = False
    mlp_ratio: float = 3.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond, grid: Tuple[int, int]):
        b, l, c = x.shape
        gh, gw = grid
        h = AdaLN(name="attn_norm")(x, cond)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads

        def heads_split(t):
            # token-major (B, L, heads, hd): a free reshape, and the SDPA
            # below can consume the packed layout directly
            return t.reshape(b, l, self.heads, hd)

        q, k, v = map(heads_split, (q, k, v))
        q, k = _axial_rope(q, k, grid)

        if self.window and self.window < min(gh, gw):
            w = self.window
            s = w // 2 if self.shift else 0

            def to_windows(t):
                t = t.reshape(b, gh, gw, self.heads, hd)
                if s:
                    t = jnp.roll(t, (-s, -s), axis=(1, 2))
                t = t.reshape(b, gh // w, w, gw // w, w, self.heads, hd)
                return t.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    b * (gh // w) * (gw // w), w * w, self.heads, hd
                )

            qw, kw, vw = map(to_windows, (q, k, v))
            ow = sdpa_token_major(qw, kw, vw)  # (b*nw, w*w, c)
            ow = ow.reshape(b, gh // w, gw // w, w, w, c)
            ow = ow.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, c)
            if s:
                ow = jnp.roll(ow, (s, s), axis=(1, 2))
            out = ow.reshape(b, l, c)
        else:
            out = sdpa_token_major(q, k, v)

        x = x + nn.Dense(c, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="attn_out")(out)

        h = AdaLN(name="mlp_norm")(x, cond)
        up = nn.Dense(int(c * self.mlp_ratio) * 2, use_bias=False, dtype=self.dtype,
                      name="mlp_up")(h)
        a, g = jnp.split(up, 2, axis=-1)
        h = a * jax.nn.gelu(g)  # GEGLU
        x = x + nn.Dense(c, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros, name="mlp_down")(h)
        return x


class TokenMerge(nn.Module):
    out_width: int

    @nn.compact
    def __call__(self, x, grid):
        b, l, c = x.shape
        gh, gw = grid
        x = x.reshape(b, gh // 2, 2, gw // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (gh // 2) * (gw // 2), 4 * c)
        return nn.Dense(self.out_width, use_bias=False)(x), (gh // 2, gw // 2)


class TokenSplit(nn.Module):
    out_width: int

    @nn.compact
    def __call__(self, x, grid):
        b, l, c = x.shape
        gh, gw = grid
        x = nn.Dense(4 * self.out_width, use_bias=False)(x)
        x = x.reshape(b, gh, gw, 2, 2, self.out_width).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * 2 * gw * 2, self.out_width), (gh * 2, gw * 2)


class ImageTransformerDenoiserModelV2(nn.Module):
    """Hourglass denoiser: v = f(x_t, t) (`hdit.py:808-917` analog).

    levels: per-level (width, depth, window) from the outside in; the last
    entry is the global-attention bottleneck.
    """

    in_channels: int = 3
    out_channels: int = 3
    patch_size: int = 4
    widths: Sequence[int] = (128, 256)
    depths: Sequence[int] = (2, 4)
    heads: Sequence[int] = (4, 8)
    windows: Sequence[int] = (8, 0)
    mapping_width: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        p = self.patch_size
        b, hh, ww, _ = x.shape
        grid = (hh // p, ww // p)
        x = x.reshape(b, grid[0], p, grid[1], p, x.shape[-1])
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid[0] * grid[1], -1)
        x = nn.Dense(self.widths[0], name="patch_in")(x)

        cond = FourierFeatures(self.mapping_width)(jnp.atleast_1d(t))
        cond = nn.Dense(self.mapping_width, name="mapping_1")(cond)
        cond = nn.gelu(cond)
        cond = nn.Dense(self.mapping_width, name="mapping_2")(cond)
        if cond.shape[0] == 1 and b > 1:
            cond = jnp.tile(cond, (b, 1))

        n_levels = len(self.widths)
        skips = []
        grids = [grid]
        # down path
        for lv in range(n_levels - 1):
            for d in range(self.depths[lv]):
                x = HDiTBlock(self.widths[lv], self.heads[lv], self.windows[lv],
                              shift=bool(d % 2), dtype=self.dtype,
                              name=f"down_{lv}_block_{d}")(x, cond, grids[-1])
            skips.append(x)
            x, g = TokenMerge(self.widths[lv + 1], name=f"merge_{lv}")(x, grids[-1])
            grids.append(g)
        # bottleneck (global attention)
        for d in range(self.depths[-1]):
            x = HDiTBlock(self.widths[-1], self.heads[-1], self.windows[-1],
                          dtype=self.dtype, name=f"mid_block_{d}")(x, cond, grids[-1])
        # up path
        for lv in reversed(range(n_levels - 1)):
            x, g = TokenSplit(self.widths[lv], name=f"split_{lv}")(x, grids[lv + 1])
            gate = self.param(f"skip_gate_{lv}", nn.initializers.ones, (1,))
            x = x + gate * skips[lv]
            for d in range(self.depths[lv]):
                x = HDiTBlock(self.widths[lv], self.heads[lv], self.windows[lv],
                              shift=bool(d % 2), dtype=self.dtype,
                              name=f"up_{lv}_block_{d}")(x, cond, grids[lv])
        x = nn.LayerNorm(dtype=jnp.float32, name="norm_out")(x)
        x = nn.Dense(p * p * self.out_channels, kernel_init=nn.initializers.zeros,
                     name="patch_out")(x)
        x = x.reshape(b, grid[0], grid[1], p, p, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid[0] * p, grid[1] * p,
                                                  self.out_channels)
        return x


def create_hdit_model(
    in_channels: int = 3,
    out_channels: int = 3,
    patch_size: int = 4,
    widths: Sequence[int] = (128, 256),
    depths: Sequence[int] = (2, 4),
    heads: Optional[Sequence[int]] = None,
    windows: Sequence[int] = (8, 0),
    mapping_width: int = 256,
    dtype: Any = jnp.float32,
    **_,
) -> ImageTransformerDenoiserModelV2:
    """(`hdit.py:919` analog) config-friendly factory."""
    heads = heads or tuple(max(1, w // 64) for w in widths)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    return ImageTransformerDenoiserModelV2(
        in_channels=in_channels,
        out_channels=out_channels,
        patch_size=patch_size,
        widths=tuple(widths),
        depths=tuple(depths),
        heads=tuple(heads),
        windows=tuple(windows),
        mapping_width=mapping_width,
        dtype=dtype,
    )
