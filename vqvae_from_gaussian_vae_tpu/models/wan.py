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

Fidelity: the flax modules process clips whole (identical to diffusers for
single frames, the only case the reference wrappers exercise).  For
multi-frame clips, ``encode_chunked``/``decode_chunked`` interpret the SAME
param tree with diffusers' exact chunked streaming semantics (first frame
alone, then 4-frame chunks through the feature cache — causal convs pad
from the previous chunk's trailing frames, temporal downsamples skip the
first chunk, temporal upsamples treat it as a zero-history "Rep" conv),
matching diffusers frame-for-frame (`tests/test_wan.py` chunked parity).
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
                # y[:, 2i+di] = channel-half di of frame i (diffusers'
                # (b,2,c,t,..) -> stack(dim=3)): order (t, 2) on the time axis
                x = tc.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * t, h, w, c)
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
        # carried as config metadata exactly like diffusers: AutoencoderKLWan
        # stores latents_mean/std in its config and leaves applying them to
        # the consuming pipeline; encode/decode work on raw latents (the
        # reference wrapper samples the raw posterior, autoencoder.py:34-37)
        self.latents_mean = latents_mean
        self.latents_std = latents_std
        common = dict(base_dim=base_dim, z_dim=z_dim, dim_mult=tuple(dim_mult),
                      num_res_blocks=num_res_blocks, attn_scales=tuple(attn_scales))
        self._cfg = dict(common, temperal_downsample=tuple(temperal_downsample),
                         temperal_upsample=tuple(reversed(temperal_downsample)))
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
        # jit once; retraces per clip length (static shapes), not per call
        self._enc_chunked = jax.jit(self._encode_chunked_impl)
        self._dec_chunked = jax.jit(self._decode_chunked_impl)

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

    # ---- chunk-exact streaming path (diffusers multi-frame parity) ----

    def _encode_chunked_impl(self, params, x):
        t = x.shape[1]
        assert t == 1 or (t - 1) % 4 == 0, (
            f"chunked encode expects T = 1 + 4k frames, got {t}")
        cache, outs = {}, []
        for i in range(1 + (t - 1) // 4):
            idx = [0]
            chunk = x[:, :1] if i == 0 else x[:, 1 + 4 * (i - 1):1 + 4 * i]
            outs.append(_encoder_chunk(params["encoder"], chunk,
                                       self._cfg, cache, idx))
        out = jnp.concatenate(outs, axis=1)
        return self.quant_conv.apply({"params": params["quant_conv"]}, out)

    def encode_chunked(self, x) -> DiagonalGaussianDistribution:
        """diffusers-exact encode for clips of T = 1 + 4k frames: the first
        frame alone, then 4-frame chunks through the feature cache."""
        return DiagonalGaussianDistribution(self._enc_chunked(self.params, x))

    def _decode_chunked_impl(self, params, z):
        x = self.post_quant_conv.apply({"params": params["post_quant_conv"]}, z)
        cache, outs = {}, []
        for i in range(x.shape[1]):
            idx = [0]
            outs.append(_decoder_chunk(params["decoder"], x[:, i:i + 1],
                                       self._cfg, cache, idx))
        return jnp.clip(jnp.concatenate(outs, axis=1), -1.0, 1.0)

    def decode_chunked(self, z):
        """diffusers-exact decode: one latent frame per chunk -> 1 + 4k
        output frames, clamped to [-1, 1]."""
        return self._dec_chunked(self.params, z)


# --------------------------------------------------------------------------
# Chunk-exact streaming path (diffusers parity for multi-frame clips)
#
# diffusers processes clips of T = 1 + 4k frames through a feature cache:
# the first frame alone, then 4-frame chunks, with every causal conv padding
# from the previous chunk's trailing frames (CACHE_T = 2) instead of zeros,
# temporal downsamples skipping the first chunk (pure cache warm-up), and
# temporal upsamples treating it as a "Rep" zero-history conv.  The flax
# modules above process clips whole (identical for T = 1); the functions
# below interpret the SAME param tree with the exact per-chunk cache
# semantics, so multi-frame encode/decode match diffusers frame-for-frame.
# The chunk loop is unrolled at trace time (T is static under jit).
# --------------------------------------------------------------------------

_CACHE_T = 2


def _p_conv3d(x, p, stride_t: int = 1):
    """VALID-time / SAME-space conv on (B, T, H, W, C); time padding is the
    caller's job (cache semantics)."""
    k = p["kernel"]
    kh, kw = k.shape[1], k.shape[2]
    y = jax.lax.conv_general_dilated(
        x, k, (stride_t, 1, 1),
        [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["bias"]


def _p_rms(x, gamma):
    n = x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                        keepdims=True), 1e-12)
    return (n * (x.shape[-1] ** 0.5) * gamma).astype(x.dtype)


def _cached_conv(x, p, cache, idx):
    """WanCausalConv3d with the diffusers feat_cache protocol: pad the time
    front from the previous chunk's trailing frames, zeros for the rest."""
    i = idx[0]
    kt = p["kernel"].shape[0]
    tp = 2 * (kt // 2)
    cur = cache.get(i)
    cx = x[:, -_CACHE_T:]
    if cx.shape[1] < _CACHE_T and cur is not None:
        cx = jnp.concatenate([cur[:, -1:], cx], axis=1)
    xin, pad = x, tp
    if cur is not None and tp > 0:
        xin = jnp.concatenate([cur, x], axis=1)
        pad = tp - cur.shape[1]
    if pad > 0:
        xin = jnp.pad(xin, ((0, 0), (pad, 0), (0, 0), (0, 0), (0, 0)))
    cache[i] = cx
    idx[0] += 1
    return _p_conv3d(xin, p)


def _p_resblock(x, p, cache, idx):
    h = jax.nn.silu(_p_rms(x, p["norm1"]["gamma"]))
    h = _cached_conv(h, p["conv1"], cache, idx)
    h = jax.nn.silu(_p_rms(h, p["norm2"]["gamma"]))
    h = _cached_conv(h, p["conv2"], cache, idx)
    if "conv_shortcut" in p:
        x = _p_conv3d(x, p["conv_shortcut"])
    return x + h


def _p_attn(x, p):
    b, t, h, w, c = x.shape
    y = _p_rms(x, p["norm"]["gamma"]).reshape(b * t, h * w, c)
    qkv = y @ p["to_qkv"]["kernel"][0, 0] + p["to_qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    a = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
    a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
    y = jnp.einsum("bqk,bkc->bqc", a, v)
    y = y @ p["proj"]["kernel"][0, 0] + p["proj"]["bias"]
    return x + y.reshape(b, t, h, w, c)


def _p_resample(x, p, mode, cache, idx):
    b, t, h, w, c = x.shape
    if mode == "upsample3d":
        i = idx[0]
        cur = cache.get(i)
        if cur is None:
            cache[i] = "Rep"
        else:
            cx = x[:, -_CACHE_T:]
            if cx.shape[1] < _CACHE_T and not isinstance(cur, str):
                cx = jnp.concatenate([cur[:, -1:], cx], axis=1)
            if isinstance(cur, str):  # first real chunk: zero history
                xin = jnp.pad(x, ((0, 0), (2, 0), (0, 0), (0, 0), (0, 0)))
            else:
                pad = 2 - cur.shape[1]
                xin = jnp.concatenate([cur, x], axis=1)
                if pad > 0:
                    xin = jnp.pad(xin, ((0, 0), (pad, 0), (0, 0), (0, 0), (0, 0)))
            tc = _p_conv3d(xin, p["time_conv"])
            tc = tc.reshape(b, t, h, w, 2, c)
            # order (t, 2): y[:, 2i+di] = channel-half di of frame i
            x = tc.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * t, h, w, c)
            cache[i] = cx
            t = 2 * t
        idx[0] += 1
    if mode.startswith("upsample"):
        y = x.reshape(b * t, h, w, c)
        y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        k2 = p["resample_1"]["kernel"]
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["resample_1"]["bias"]
        return y.reshape(b, t, 2 * h, 2 * w, c // 2)
    # downsample: spatial first, then the (cached) temporal stride
    y = x.reshape(b * t, h, w, c)
    y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
    k2 = p["resample_1"]["kernel"]
    y = jax.lax.conv_general_dilated(
        y, k2, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["resample_1"]["bias"]
    x = y.reshape(b, t, h // 2, w // 2, c)
    if mode == "downsample3d":
        i = idx[0]
        cur = cache.get(i)
        if cur is None:
            cache[i] = x
        else:
            cx = x[:, -1:]
            xin = jnp.concatenate([cur[:, -1:], x], axis=1)
            x = _p_conv3d(xin, p["time_conv"], stride_t=2)
            cache[i] = cx
        idx[0] += 1
    return x


def _encoder_chunk(p, x, cfg, cache, idx):
    base, dim_mult, nrb = cfg["base_dim"], cfg["dim_mult"], cfg["num_res_blocks"]
    attn_scales, tds = cfg["attn_scales"], cfg["temperal_downsample"]
    dims = [base * u for u in (1,) + tuple(dim_mult)]
    x = _cached_conv(x, p["conv_in"], cache, idx)
    scale, name_i = 1.0, 0
    for i in range(len(dim_mult)):
        for _ in range(nrb):
            x = _p_resblock(x, p[f"down_blocks_{name_i}"], cache, idx)
            name_i += 1
            if scale in attn_scales:
                x = _p_attn(x, p[f"down_blocks_{name_i}"])
                name_i += 1
        if i != len(dim_mult) - 1:
            mode = "downsample3d" if tds[i] else "downsample2d"
            x = _p_resample(x, p[f"down_blocks_{name_i}"], mode, cache, idx)
            name_i += 1
            scale /= 2.0
    mid = p["mid_block"]
    x = _p_resblock(x, mid["resnets_0"], cache, idx)
    x = _p_attn(x, mid["attentions_0"])
    x = _p_resblock(x, mid["resnets_1"], cache, idx)
    x = jax.nn.silu(_p_rms(x, p["norm_out"]["gamma"]))
    return _cached_conv(x, p["conv_out"], cache, idx)


def _decoder_chunk(p, z, cfg, cache, idx):
    base, dim_mult, nrb = cfg["base_dim"], cfg["dim_mult"], cfg["num_res_blocks"]
    tus = cfg["temperal_upsample"]
    x = _cached_conv(z, p["conv_in"], cache, idx)
    mid = p["mid_block"]
    x = _p_resblock(x, mid["resnets_0"], cache, idx)
    x = _p_attn(x, mid["attentions_0"])
    x = _p_resblock(x, mid["resnets_1"], cache, idx)
    for i in range(len(dim_mult)):
        blk = p[f"up_blocks_{i}"]
        for j in range(nrb + 1):
            x = _p_resblock(x, blk[f"resnets_{j}"], cache, idx)
        if i != len(dim_mult) - 1:
            mode = "upsample3d" if tus[i] else "upsample2d"
            x = _p_resample(x, blk["upsamplers_0"], mode, cache, idx)
    x = jax.nn.silu(_p_rms(x, p["norm_out"]["gamma"]))
    return _cached_conv(x, p["conv_out"], cache, idx)
