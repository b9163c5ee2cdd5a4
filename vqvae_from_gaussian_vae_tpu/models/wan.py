"""WAN-style causal-3D VAE backbone (flax), for the Qwen-Image / WAN frozen
wrappers (`/root/reference/pit/models/autoencoder.py:25-59`).

The reference wraps ``diffusers.AutoencoderKLWan`` (the Wan2.1/2.2 video VAE,
also used verbatim by Qwen-Image) and feeds it single images as one-frame
videos (``x[:, :, None]``).  This is a from-scratch flax implementation of
that architecture: causal 3D convs (time padded front-only with zeros),
channel-L2 RMS norms (``F.normalize * sqrt(dim) * gamma``), SiLU, per-frame
single-head spatial attention, WAN resample blocks (spatial stride-2 down /
nearest x2 up with channel halving, plus temporal stride-2 down / channel-
doubling interleave up on the 3D variants), and a diagonal-Gaussian latent.

TPU-first: NTHWC layout, fused-einsum attention, full-clip processing.
Module names mirror the diffusers tree (``down_blocks.3.resample.1.weight``
-> ``down_blocks_3/resample_1/kernel``) so real checkpoints convert
mechanically via ``utils.torch_convert``.

Fidelity notes: for single-frame inputs (the only case the reference
wrappers exercise) this matches diffusers exactly - in its chunked streaming
loop the first frame's temporal resamples are pure cache-warmup no-ops, and
the causal convs see two zero frames of history.  For multi-frame clips
diffusers processes 4-frame chunks through a feature cache (a CUDA memory
workaround); here clips are processed whole with the same causal padding,
which matches the cache semantics for the convs but applies the temporal
down/upsampling uniformly instead of special-casing the first frame.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models.hyvae import DiagonalGaussianDistribution


def CausalConv3d(features: int, kernel: Tuple[int, int, int] = (3, 3, 3),
                 stride: Tuple[int, int, int] = (1, 1, 1), name: str = None,
                 dtype: Any = jnp.float32, time_pad: Optional[int] = None) -> nn.Conv:
    """Conv3d with causal time padding: ``kt - 1`` zero frames in FRONT (the
    diffusers ``WanCausalConv3d`` pads ``2 * (kt // 2)`` front, none back),
    SAME spatial padding."""
    kt, kh, kw = kernel
    tp = (kt - 1) if time_pad is None else time_pad
    pad = [(tp, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)]
    return nn.Conv(features, kernel, strides=stride, padding=pad,
                   dtype=dtype, name=name)


class WanRMSNorm(nn.Module):
    """``F.normalize(x, dim=channel) * sqrt(dim) * gamma (+ bias)`` — the
    WAN flavour of RMS norm (L2 over channels, eps as a 1e-12 clamp)."""

    dim: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        n = x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-12)
        out = n * (self.dim ** 0.5) * gamma
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.dim,))
        return out.astype(x.dtype)


class WanResidualBlock(nn.Module):
    in_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = WanRMSNorm(self.in_dim, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.out_dim, name="conv1", dtype=self.dtype)(h)
        h = WanRMSNorm(self.out_dim, name="norm2")(h)
        h = nn.silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = CausalConv3d(self.out_dim, name="conv2", dtype=self.dtype)(h)
        if self.in_dim != self.out_dim:
            x = CausalConv3d(self.out_dim, (1, 1, 1), name="conv_shortcut",
                             dtype=self.dtype)(x)
        return x + h


class WanAttentionBlock(nn.Module):
    """Per-frame single-head spatial self-attention (1x1-conv qkv/proj)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        identity = x
        y = WanRMSNorm(c, name="norm")(x).reshape(b * t, h, w, c)
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype, name="to_qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
        attn = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b * t, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj")(y)
        return identity + y.reshape(b, t, h, w, c)


class WanResample(nn.Module):
    """'upsample2d' | 'upsample3d' | 'downsample2d' | 'downsample3d'.

    Spatial: down = asym (0,1) pad + stride-2 3x3 (keeps channels); up =
    nearest x2 + 3x3 to ``dim // 2``.  Temporal (3d modes, skipped for
    single-frame inputs exactly as diffusers' first-chunk cache warmup
    does): down = stride-2 causal (3,1,1) conv; up = channel-doubling
    (3,1,1) conv whose halves interleave as even/odd output frames.
    """

    dim: int
    mode: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.mode.startswith("upsample"):
            if self.mode == "upsample3d" and t > 1:
                tc = CausalConv3d(self.dim * 2, (3, 1, 1), name="time_conv",
                                  dtype=self.dtype)(x)
                # channel halves -> even/odd frames: (..., 2c) == [2, c] split
                tc = tc.reshape(b, t, h, w, 2, c)
                x = jnp.swapaxes(tc, 4, 1).reshape(b, 2 * t, h, w, c)
                t = 2 * t
            y = x.reshape(b * t, h, w, c)
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.Conv(self.dim // 2, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name="resample_1")(y)
            return y.reshape(b, t, 2 * h, 2 * w, self.dim // 2)
        if self.mode.startswith("downsample"):
            y = x.reshape(b * t, h, w, c)
            y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID",
                        dtype=self.dtype, name="resample_1")(y)
            x = y.reshape(b, t, h // 2, w // 2, self.dim)
            if self.mode == "downsample3d" and t > 1:
                x = CausalConv3d(self.dim, (3, 1, 1), (2, 1, 1), time_pad=1,
                                 name="time_conv", dtype=self.dtype)(x)
            return x
        assert self.mode == "none", self.mode
        return x


class WanMidBlock(nn.Module):
    dim: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = WanResidualBlock(self.dim, self.dim, self.dropout,
                             dtype=self.dtype, name="resnets_0")(x, train)
        x = WanAttentionBlock(self.dim, dtype=self.dtype, name="attentions_0")(x)
        x = WanResidualBlock(self.dim, self.dim, self.dropout,
                             dtype=self.dtype, name="resnets_1")(x, train)
        return x


class WanEncoder3d(nn.Module):
    """(B, T, H, W, 3) -> (B, T', H/8, W/8, 2*z) moments."""

    base_dim: int = 96
    z_dim: int = 16  # output channels = 2 * z_dim (mu, logvar)
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Sequence[float] = ()
    temperal_downsample: Sequence[bool] = (False, True, True)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.base_dim * u for u in (1,) + tuple(self.dim_mult)]
        scale = 1.0
        x = CausalConv3d(dims[0], name="conv_in", dtype=self.dtype)(x)
        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(self.num_res_blocks):
                x = WanResidualBlock(in_dim, out_dim, self.dropout, dtype=self.dtype,
                                     name=f"down_blocks_{idx}")(x, train)
                idx += 1
                if scale in self.attn_scales:
                    x = WanAttentionBlock(out_dim, dtype=self.dtype,
                                          name=f"down_blocks_{idx}")(x)
                    idx += 1
                in_dim = out_dim
            if i != len(self.dim_mult) - 1:
                mode = "downsample3d" if self.temperal_downsample[i] else "downsample2d"
                x = WanResample(out_dim, mode, dtype=self.dtype,
                                name=f"down_blocks_{idx}")(x)
                idx += 1
                scale /= 2.0
        x = WanMidBlock(dims[-1], self.dropout, dtype=self.dtype, name="mid_block")(x, train)
        x = WanRMSNorm(dims[-1], name="norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * self.z_dim, name="conv_out", dtype=self.dtype)(x)


class WanUpBlock(nn.Module):
    in_dim: int
    out_dim: int
    num_resnets: int
    upsample_mode: Optional[str]
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = self.in_dim
        for j in range(self.num_resnets):
            x = WanResidualBlock(in_dim, self.out_dim, self.dropout,
                                 dtype=self.dtype, name=f"resnets_{j}")(x, train)
            in_dim = self.out_dim
        if self.upsample_mode is not None:
            x = WanResample(self.out_dim, self.upsample_mode, dtype=self.dtype,
                            name="upsamplers_0")(x)
        return x


class WanDecoder3d(nn.Module):
    """(B, T', h, w, z) -> (B, T, 8h, 8w, 3)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Sequence[float] = ()
    temperal_upsample: Sequence[bool] = (True, True, False)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        dims = [self.base_dim * u for u in
                (self.dim_mult[-1],) + tuple(reversed(self.dim_mult))]
        x = CausalConv3d(dims[0], name="conv_in", dtype=self.dtype)(z)
        x = WanMidBlock(dims[0], self.dropout, dtype=self.dtype, name="mid_block")(x, train)
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2  # the previous stage's upsample halved channels
            mode = None
            if i != len(self.dim_mult) - 1:
                mode = "upsample3d" if self.temperal_upsample[i] else "upsample2d"
            x = WanUpBlock(in_dim, out_dim, self.num_res_blocks + 1, mode,
                           self.dropout, dtype=self.dtype, name=f"up_blocks_{i}")(x, train)
        # the final stage has no upsample, so channels end at dims[-1]
        x = WanRMSNorm(dims[-1], name="norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(3, name="conv_out", dtype=self.dtype)(x)


class AutoencoderKLWan:
    """Frozen-wrapper engine around the WAN encoder/decoder with the
    diffusers param layout (``encoder.* / quant_conv.* / post_quant_conv.* /
    decoder.*``): encode -> diagonal-Gaussian posterior over ``z_dim``
    channels, decode -> [-1, 1]-clamped video."""

    def __init__(self, base_dim: int = 96, z_dim: int = 16,
                 dim_mult: Sequence[int] = (1, 2, 4, 4), num_res_blocks: int = 2,
                 attn_scales: Sequence[float] = (),
                 temperal_downsample: Sequence[bool] = (False, True, True),
                 latents_mean: Optional[Sequence[float]] = None,
                 latents_std: Optional[Sequence[float]] = None,
                 seed: int = 0):
        self.z_dim = z_dim
        self.latents_mean = latents_mean
        self.latents_std = latents_std
        common = dict(base_dim=base_dim, z_dim=z_dim, dim_mult=tuple(dim_mult),
                      num_res_blocks=num_res_blocks, attn_scales=tuple(attn_scales))
        self.encoder = WanEncoder3d(
            temperal_downsample=tuple(temperal_downsample), **common)
        self.decoder = WanDecoder3d(
            temperal_upsample=tuple(reversed(temperal_downsample)), **common)
        self.quant_conv = CausalConv3d(2 * z_dim, (1, 1, 1))
        self.post_quant_conv = CausalConv3d(z_dim, (1, 1, 1))

        f = 2 ** (len(dim_mult) - 1)
        rng = jax.random.PRNGKey(seed)
        # multi-frame probes so the temporal (t>1) conv branches materialise
        # their params — real diffusers checkpoints carry time_conv weights
        probe = jnp.zeros((1, 5, 4 * f, 4 * f, 3))
        zprobe = jnp.zeros((1, 2, 4, 4, z_dim))
        self.params = {
            "encoder": self.encoder.init(jax.random.fold_in(rng, 0), probe)["params"],
            "quant_conv": self.quant_conv.init(
                jax.random.fold_in(rng, 1), jnp.zeros((1, 1, 4, 4, 2 * z_dim)))["params"],
            "post_quant_conv": self.post_quant_conv.init(
                jax.random.fold_in(rng, 2), zprobe)["params"],
            "decoder": self.decoder.init(jax.random.fold_in(rng, 3), zprobe)["params"],
        }
        self._enc = jax.jit(self._encode_moments)
        self._dec = jax.jit(self._decode_impl)

    def _encode_moments(self, params, x):
        h = self.encoder.apply({"params": params["encoder"]}, x)
        return self.quant_conv.apply({"params": params["quant_conv"]}, h)

    def _decode_impl(self, params, z):
        z = self.post_quant_conv.apply({"params": params["post_quant_conv"]}, z)
        x = self.decoder.apply({"params": params["decoder"]}, z)
        return jnp.clip(x, -1.0, 1.0)  # diffusers decode clamps

    def load_checkpoint(self, path: str):
        from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
            convert_state_dict, load_torch_checkpoint)

        sd = load_torch_checkpoint(path)
        params, missing, unexpected = convert_state_dict(sd, self.params)
        self.params = params
        return missing, unexpected

    def encode(self, x) -> DiagonalGaussianDistribution:
        """x: (B, T, H, W, 3) -> posterior over (B, T', H/8, W/8, z)."""
        return DiagonalGaussianDistribution(self._enc(self.params, x))

    def decode(self, z):
        return self._dec(self.params, z)
