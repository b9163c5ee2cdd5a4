"""FLUX rectified-flow transformer stack, TPU-native
(`/root/reference/pit/modules/flux/`: model.py, modules/layers.py, math.py,
controlnet.py, sampling.py - the generative "token decoder" used by
AutoencodingFluxEngine.dequant to re-generate images from decoded tokens).

Implemented here: the MMDiT architecture (double-stream img/txt blocks with
AdaLN modulation, RMS QK-norm and multi-axis RoPE; fused single-stream
blocks), optional LoRA deltas on the attention/proj paths, the depth-2
ControlNet with zero-init hint/output projections, the shifted rectified-
flow schedule, and the CFG + ControlNet denoise loop.

TPU notes: weights/activations default to bf16 with fp32 softmax and
RMS/LayerNorm statistics; the denoise step is one jitted function re-used
across the (static) timestep list; text/vec conditioning arrives as arrays
(the reference's T5/CLIP/Redux encoders are hub downloads - absent here -
so the pipeline takes embeddings or zeros, with converter hooks for real
checkpoints).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FluxParams:
    in_channels: int = 64
    vec_in_dim: int = 768
    context_in_dim: int = 4096
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth: int = 19
    depth_single_blocks: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    qkv_bias: bool = True
    guidance_embed: bool = True


def flux_dev_params(**overrides) -> FluxParams:
    """The flux-dev configuration (`flux/util.py` configs)."""
    return dataclasses.replace(FluxParams(), **overrides)


# ------------------------------------------------------------------ basics


def timestep_embedding(t, dim: int, max_period: int = 10000, time_factor: float = 1000.0):
    """(`modules/layers.py:28-49`)."""
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def rope_cos_sin(pos, dim: int, theta: int):
    """Per-axis rotary tables: (..., L, dim/2) cos and sin (`math.py:15-22`)."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    out = jnp.einsum("...n,d->...nd", pos.astype(jnp.float32), omega)
    return jnp.cos(out), jnp.sin(out)


def embed_nd(ids, axes_dim: Sequence[int], theta: int):
    """ids (B, L, n_axes) -> (cos, sin) each (B, L, 1, sum(axes)/2),
    broadcasting over the head axis of the (B, L, H, D) q/k layout
    (`modules/layers.py:11-25` builds the head-major equivalent)."""
    coss, sins = [], []
    for i, d in enumerate(axes_dim):
        c, s = rope_cos_sin(ids[..., i], d, theta)
        coss.append(c)
        sins.append(s)
    cos = jnp.concatenate(coss, axis=-1)[:, :, None]
    sin = jnp.concatenate(sins, axis=-1)[:, :, None]
    return cos, sin


def apply_rope(q, k, pe):
    """q, k: (B, L, H, D); pe = (cos, sin) with D/2 entries (`math.py:25-30`)."""
    cos, sin = pe

    def rot(x):
        x = x.astype(jnp.float32)
        x2 = x.reshape(*x.shape[:-1], -1, 2)
        a, b = x2[..., 0], x2[..., 1]
        ra = a * cos - b * sin
        rb = a * sin + b * cos
        return jnp.stack([ra, rb], axis=-1).reshape(x.shape)

    return rot(q), rot(k)


def attention(q, k, v, pe):
    """RoPE + SDPA over token-major (B, L, H, D), fp32 softmax
    (`math.py:6-12`).

    The bf16 TPU path routes through the layout-native packed flash
    kernel (ops/flash_blc.py): (B, L, H, D) reshapes freely to the
    kernel's (B, L, H*D), so neither the head-major transpose nor the
    fp32 (B, H, L, L) probability tensor of the reference's SDPA ever
    materialises (at flux-dev's 24 heads and L=768+ that tensor is
    >170 MB per block).  fp32 inputs keep the exact einsum path (the
    Pallas fp32 dot lowers to fewer bf16 passes than XLA's
    excess-precision fp32 — same boundary as the resample kernels)."""
    from vqvae_from_gaussian_vae_tpu.ops.flash_blc import sdpa_token_major

    qf, kf = apply_rope(q, k, pe)
    return sdpa_token_major(qf, kf, v)


class MLPEmbedder(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_layer")(x)
        return nn.Dense(self.hidden_dim, dtype=self.dtype, name="out_layer")(nn.silu(x))


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        rrms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        return (xf * rrms).astype(x.dtype) * scale


class QKNorm(nn.Module):
    dim: int

    def setup(self):
        self.query_norm = RMSNorm(self.dim)
        self.key_norm = RMSNorm(self.dim)

    def __call__(self, q, k, v):
        return self.query_norm(q).astype(v.dtype), self.key_norm(k).astype(v.dtype)


class LoRADelta(nn.Module):
    """Low-rank delta W = B @ A (`modules/layers.py:86-110`), zero at init."""

    out_features: int
    rank: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        down = nn.Dense(self.rank, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(1.0 / self.rank), name="down")(x)
        return nn.Dense(self.out_features, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="up")(down)


class Modulation(nn.Module):
    """vec -> (shift, scale, gate) x (1|2) (`modules/layers.py:156-175`)."""

    dim: int
    double: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, vec):
        mult = 6 if self.double else 3
        out = nn.Dense(self.dim * mult, dtype=self.dtype, name="lin")(nn.silu(vec))
        parts = jnp.split(out[:, None, :], mult, axis=-1)
        first = parts[:3]
        second = parts[3:] if self.double else None
        return first, second


def _ln(x):
    """elementwise_affine=False LayerNorm, eps 1e-6, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _ip_attention(q, image_proj, k_proj, v_proj, num_heads):
    """IP-adapter cross-attention (`modules/layers.py:283-299,434-448`):
    latent queries (post-QKNorm, NO RoPE — the reference takes q before
    `attention()` applies positional rotation) attend over projected CLIP
    image tokens.  Token-major (B, L, H, D) throughout."""
    from vqvae_from_gaussian_vae_tpu.ops.flash_blc import sdpa_token_major

    b, lc = image_proj.shape[:2]
    hd = q.shape[-1]
    ip_k = k_proj(image_proj).reshape(b, lc, num_heads, hd)
    ip_v = v_proj(image_proj).reshape(b, lc, num_heads, hd)
    out = sdpa_token_major(q, ip_k, ip_v)
    return out


class DoubleStreamBlock(nn.Module):
    """img/txt MMDiT block (`modules/layers.py:303-392`); with
    ``ip_context_dim`` set it also carries the IP-adapter processor's
    zero-init k/v projections (`layers.py:221-248`)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = False
    lora_rank: int = 0
    dtype: Any = jnp.bfloat16
    ip_context_dim: int = 0

    @nn.compact
    def __call__(self, img, txt, vec, pe, image_proj=None, ip_scale=1.0):
        hd = self.hidden_size // self.num_heads
        mlp_dim = int(self.hidden_size * self.mlp_ratio)

        (i_sh1, i_sc1, i_g1), (i_sh2, i_sc2, i_g2) = Modulation(
            self.hidden_size, True, self.dtype, name="img_mod")(vec)
        (t_sh1, t_sc1, t_g1), (t_sh2, t_sc2, t_g2) = Modulation(
            self.hidden_size, True, self.dtype, name="txt_mod")(vec)

        def qkv_split(x, prefix):
            mod = nn.Dense(3 * self.hidden_size, use_bias=self.qkv_bias,
                           dtype=self.dtype, name=f"{prefix}_attn_qkv")(x)
            if self.lora_rank:
                mod = mod + LoRADelta(3 * self.hidden_size, self.lora_rank,
                                      self.dtype, name=f"{prefix}_qkv_lora")(x)
            b, l, _ = mod.shape
            # token-major (B, L, H, D): a slice+reshape XLA fuses away,
            # where the reference's head-major split is a real transpose
            mod = mod.reshape(b, l, 3, self.num_heads, hd)
            q, k, v = mod[:, :, 0], mod[:, :, 1], mod[:, :, 2]
            q, k = QKNorm(hd, name=f"{prefix}_attn_norm")(q, k, v)
            return q, k, v

        img_m = (1 + i_sc1) * _ln(img) + i_sh1
        txt_m = (1 + t_sc1) * _ln(txt) + t_sh1
        iq, ik, iv = qkv_split(img_m, "img")
        tq, tk, tv = qkv_split(txt_m, "txt")
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        out = attention(q, k, v, pe)
        t_len = txt.shape[1]
        txt_attn, img_attn = out[:, :t_len], out[:, t_len:]

        img_proj = nn.Dense(self.hidden_size, dtype=self.dtype, name="img_attn_proj")(img_attn)
        if self.lora_rank:
            img_proj = img_proj + LoRADelta(self.hidden_size, self.lora_rank,
                                            self.dtype, name="img_proj_lora")(img_attn)
        img = img + i_g1 * img_proj
        img_mlp_in = (1 + i_sc2) * _ln(img) + i_sh2
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="img_mlp_0")(img_mlp_in)
        h = jax.nn.gelu(h, approximate=True)
        img = img + i_g2 * nn.Dense(self.hidden_size, dtype=self.dtype, name="img_mlp_2")(h)

        txt_proj = nn.Dense(self.hidden_size, dtype=self.dtype, name="txt_attn_proj")(txt_attn)
        if self.lora_rank:
            txt_proj = txt_proj + LoRADelta(self.hidden_size, self.lora_rank,
                                            self.dtype, name="txt_proj_lora")(txt_attn)
        txt = txt + t_g1 * txt_proj
        txt_mlp_in = (1 + t_sc2) * _ln(txt) + t_sh2
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="txt_mlp_0")(txt_mlp_in)
        h = jax.nn.gelu(h, approximate=True)
        txt = txt + t_g2 * nn.Dense(self.hidden_size, dtype=self.dtype, name="txt_mlp_2")(h)

        if self.ip_context_dim:
            # IPDoubleStreamBlockProcessor (`layers.py:249-299`): image-token
            # cross-attention added AFTER both residual updates; k/v zero-init
            # with bias so a fresh adapter is an exact no-op
            k_proj = nn.Dense(self.hidden_size, use_bias=True, dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="ip_adapter_double_stream_k_proj")
            v_proj = nn.Dense(self.hidden_size, use_bias=True, dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="ip_adapter_double_stream_v_proj")
            if image_proj is not None:
                ip = _ip_attention(iq, image_proj, k_proj, v_proj, self.num_heads)
                img = img + ip_scale * ip.reshape(img.shape)
            else:
                # materialize the adapter params so the tree is static whether
                # or not an image prompt is supplied; XLA drops the dead call
                dummy = jnp.zeros((1, 1, self.ip_context_dim), self.dtype)
                k_proj(dummy), v_proj(dummy)
        return img, txt


class SingleStreamBlock(nn.Module):
    """Fused qkv+mlp single-stream block (`modules/layers.py:485-535`); with
    ``ip_context_dim`` set it carries the IP-adapter processor's zero-init
    bias-free k/v projections (`layers.py:391-449`)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    lora_rank: int = 0
    dtype: Any = jnp.bfloat16
    ip_context_dim: int = 0

    @nn.compact
    def __call__(self, x, vec, pe, image_proj=None, ip_scale=1.0):
        hd = self.hidden_size // self.num_heads
        mlp_dim = int(self.hidden_size * self.mlp_ratio)
        (sh, sc, gate), _ = Modulation(self.hidden_size, False, self.dtype,
                                       name="modulation")(vec)
        x_mod = (1 + sc) * _ln(x) + sh
        fused = nn.Dense(3 * self.hidden_size + mlp_dim, dtype=self.dtype,
                         name="linear1")(x_mod)
        qkv, mlp = jnp.split(fused, [3 * self.hidden_size], axis=-1)
        if self.lora_rank:
            qkv = qkv + LoRADelta(3 * self.hidden_size, self.lora_rank, self.dtype,
                                  name="qkv_lora")(x_mod)
        b, l, _ = qkv.shape
        qkv = qkv.reshape(b, l, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k = QKNorm(hd, name="norm")(q, k, v)
        attn_out = attention(q, k, v, pe)
        if self.ip_context_dim:
            # IPSingleStreamBlockProcessor (`layers.py:391-449`): added to the
            # attention stream BEFORE linear2; bias-free zero-init k/v
            k_proj = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="ip_adapter_single_stream_k_proj")
            v_proj = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="ip_adapter_single_stream_v_proj")
            if image_proj is not None:
                ip = _ip_attention(q, image_proj, k_proj, v_proj, self.num_heads)
                attn_out = attn_out + ip_scale * ip.reshape(attn_out.shape)
            else:
                dummy = jnp.zeros((1, 1, self.ip_context_dim), self.dtype)
                k_proj(dummy), v_proj(dummy)
        cat = jnp.concatenate([attn_out, jax.nn.gelu(mlp, approximate=True)], axis=-1)
        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear2")(cat)
        if self.lora_rank:
            out = out + LoRADelta(self.hidden_size, self.lora_rank, self.dtype,
                                  name="proj_lora")(cat)
        return x + gate * out


class LastLayer(nn.Module):
    hidden_size: int
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, vec):
        mod = nn.Dense(2 * self.hidden_size, dtype=self.dtype,
                       name="adaLN_modulation_1")(nn.silu(vec))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        x = (1 + scale) * _ln(x) + shift
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros, name="linear")(x)


class ImageProjModel(nn.Module):
    """CLIP image embedding -> N extra context tokens
    (`modules/layers.py:574-594`, the tencent IP-Adapter projection)."""

    cross_attention_dim: int = 4096
    clip_embeddings_dim: int = 768
    clip_extra_context_tokens: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, image_embeds):
        x = nn.Dense(self.clip_extra_context_tokens * self.cross_attention_dim,
                     dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(-1, self.clip_extra_context_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class Flux(nn.Module):
    """(`model.py:27-228`): tokens + conditioning -> velocity tokens.

    ``ip_context_dim`` > 0 equips every block with IP-adapter k/v
    projections (`model.py:146-190`); pass ``image_proj`` (the
    ImageProjModel's tokens) and ``ip_scale`` to engage them."""

    params: FluxParams
    lora_rank: int = 0
    remat: bool = True
    ip_context_dim: int = 0

    @nn.compact
    def __call__(self, img, img_ids, txt, txt_ids, timesteps, y,
                 block_controlnet_hidden_states=None, guidance=None,
                 image_proj=None, ip_scale=1.0):
        p = self.params
        dtype = jnp.bfloat16
        img = nn.Dense(p.hidden_size, dtype=dtype, name="img_in")(img)
        vec = MLPEmbedder(p.hidden_size, dtype, name="time_in")(
            timestep_embedding(timesteps, 256)
        )
        if p.guidance_embed:
            assert guidance is not None, "guidance-distilled model needs guidance"
            vec = vec + MLPEmbedder(p.hidden_size, dtype, name="guidance_in")(
                timestep_embedding(guidance, 256)
            )
        vec = vec + MLPEmbedder(p.hidden_size, dtype, name="vector_in")(y)
        txt = nn.Dense(p.hidden_size, dtype=dtype, name="txt_in")(txt)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        pe = embed_nd(ids, p.axes_dim, p.theta)

        dblock = DoubleStreamBlock
        sblock = SingleStreamBlock
        if self.remat:
            dblock = nn.remat(DoubleStreamBlock)
            sblock = nn.remat(SingleStreamBlock)
        for i in range(p.depth):
            img, txt = dblock(
                p.hidden_size, p.num_heads, p.mlp_ratio, p.qkv_bias,
                self.lora_rank, dtype, self.ip_context_dim,
                name=f"double_blocks_{i}",
            )(img, txt, vec, pe, image_proj, ip_scale)
            if block_controlnet_hidden_states is not None:
                img = img + block_controlnet_hidden_states[
                    i % len(block_controlnet_hidden_states)
                ]
        x = jnp.concatenate([txt, img], axis=1)
        for i in range(p.depth_single_blocks):
            x = sblock(
                p.hidden_size, p.num_heads, p.mlp_ratio, self.lora_rank, dtype,
                self.ip_context_dim, name=f"single_blocks_{i}",
            )(x, vec, pe, image_proj, ip_scale)
        x = x[:, txt.shape[1]:]
        return LastLayer(p.hidden_size, 64, dtype, name="final_layer")(x, vec)


class ControlNetFlux(nn.Module):
    """Depth-limited double-block copy emitting per-block residuals
    (`controlnet.py:30-221`)."""

    params: FluxParams
    control_channels: int
    controlnet_depth: int = 2

    @nn.compact
    def __call__(self, img, img_ids, controlnet_cond, txt, txt_ids, timesteps, y,
                 guidance=None):
        p = self.params
        dtype = jnp.bfloat16
        img = nn.Dense(p.hidden_size, dtype=dtype, name="img_in")(img)
        # hint stack: 7 conv+silu (NHWC) then zero conv, 2x2 pack, pos embed
        h = controlnet_cond
        for i in range(7):
            h = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype,
                        name=f"input_hint_block_{2 * i}")(h)
            h = nn.silu(h)
        h = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype,
                    kernel_init=nn.initializers.zeros, name="input_hint_block_14")(h)
        b, hh, ww, c = h.shape
        h = h.reshape(b, hh // 2, 2, ww // 2, 2, c).transpose(0, 1, 3, 5, 2, 4)
        h = h.reshape(b, (hh // 2) * (ww // 2), c * 4)
        img = img + nn.Dense(p.hidden_size, dtype=dtype, name="pos_embed_input")(h)

        vec = MLPEmbedder(p.hidden_size, dtype, name="time_in")(
            timestep_embedding(timesteps, 256)
        )
        if p.guidance_embed:
            vec = vec + MLPEmbedder(p.hidden_size, dtype, name="guidance_in")(
                timestep_embedding(guidance, 256)
            )
        vec = vec + MLPEmbedder(p.hidden_size, dtype, name="vector_in")(y)
        txt = nn.Dense(p.hidden_size, dtype=dtype, name="txt_in")(txt)
        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        pe = embed_nd(ids, p.axes_dim, p.theta)

        residuals = []
        for i in range(self.controlnet_depth):
            img, txt = DoubleStreamBlock(
                p.hidden_size, p.num_heads, p.mlp_ratio, p.qkv_bias, 0, dtype,
                name=f"double_blocks_{i}",
            )(img, txt, vec, pe)
            res = nn.Dense(p.hidden_size, dtype=dtype,
                           kernel_init=nn.initializers.zeros,
                           name=f"controlnet_blocks_{i}")(img)
            residuals.append(res)
        return tuple(residuals)


# ---------------------------------------------------------------- sampling


def time_shift(mu: float, sigma: float, t: np.ndarray):
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


def get_lin_function(x1=256.0, y1=0.5, x2=4096.0, y2=1.15):
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def get_schedule(num_steps: int, image_seq_len: int, base_shift: float = 0.5,
                 max_shift: float = 1.15, shift: bool = True) -> List[float]:
    """(`sampling.py:156-172`)."""
    ts = np.linspace(1.0, 0.0, num_steps + 1)
    if shift:
        mu = get_lin_function(y1=base_shift, y2=max_shift)(image_seq_len)
        with np.errstate(divide="ignore"):
            ts = np.where(ts > 0, time_shift(mu, 1.0, np.clip(ts, 1e-9, 1.0)), 0.0)
        ts[-1] = 0.0
    return [float(t) for t in ts]


def get_noise(rng, num_samples: int, height: int, width: int):
    """Latent-token noise (`sampling.py:12-29`): 16ch, f=8, packed 2x2."""
    return jax.random.normal(
        rng, (num_samples, 16, 2 * math.ceil(height / 16), 2 * math.ceil(width / 16))
    ).transpose(0, 2, 3, 1)


def pack_latents(z):
    """(B, H, W, C) latents -> (B, H/2*W/2, C*4) tokens with the reference's
    "(h ph) (w pw) -> (h w) (c ph pw)" channel-major order (`sampling.py:70`)."""
    b, h, w, c = z.shape
    z = z.reshape(b, h // 2, 2, w // 2, 2, c)
    z = z.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, ph, pw
    return z.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(x, height: int, width: int):
    """(`sampling.py:359-367`), NHWC out."""
    b = x.shape[0]
    h, w = math.ceil(height / 16), math.ceil(width / 16)
    x = x.reshape(b, h, w, -1, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, ph, w, pw, c
    return x.reshape(b, h * 2, w * 2, -1)


def make_img_ids(h_latent: int, w_latent: int, bs: int):
    """(`sampling.py:74-77`)."""
    ids = np.zeros((h_latent // 2, w_latent // 2, 3), np.float32)
    ids[..., 1] += np.arange(h_latent // 2)[:, None]
    ids[..., 2] += np.arange(w_latent // 2)[None, :]
    return jnp.asarray(np.tile(ids.reshape(1, -1, 3), (bs, 1, 1)))


def denoise(
    model_apply,
    img,
    img_ids,
    txt,
    txt_ids,
    vec,
    timesteps: List[float],
    guidance: float = 4.0,
    image_proj=None,
    ip_scale: float = 1.0,
):
    """Plain guided Euler loop, no ControlNet/CFG (`sampling.py:175-228`);
    image_proj/ip_scale engage the IP-adapter path (`sampling.py:192-211`)."""
    guidance_vec = jnp.full((img.shape[0],), guidance, jnp.float32)

    @jax.jit
    def step(img, t_curr, t_prev):
        t_vec = jnp.full((img.shape[0],), t_curr, jnp.float32)
        kw = {} if image_proj is None else {"image_proj": image_proj, "ip_scale": ip_scale}
        pred = model_apply(
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
            timesteps=t_vec, y=vec, guidance=guidance_vec, **kw,
        )
        return img + (t_prev - t_curr) * pred.astype(img.dtype)

    for t_curr, t_prev in zip(timesteps[:-1], timesteps[1:]):
        img = step(img, t_curr, t_prev)
    return img


def denoise_controlnet(
    model_apply,
    controlnet_apply,
    img,
    img_ids,
    txt,
    txt_ids,
    vec,
    neg_txt,
    neg_txt_ids,
    neg_vec,
    controlnet_cond,
    timesteps: List[float],
    guidance: float = 4.0,
    true_gs: float = 1.0,
    controlnet_gs: float = 0.7,
    timestep_to_start_cfg: int = 0,
    image_proj=None,
    neg_image_proj=None,
    ip_scale: float = 1.0,
    neg_ip_scale: float = 1.0,
):
    """CFG + ControlNet Euler loop (`sampling.py:230-318`); the per-step
    function is jitted once and reused across the static schedule.
    image_proj/neg_image_proj engage the IP-adapter on the positive/negative
    branches (`sampling.py:250-311`)."""
    guidance_vec = jnp.full((img.shape[0],), guidance, jnp.float32)

    @jax.jit
    def step(img, t_curr, t_prev, cfg_on):
        t_vec = jnp.full((img.shape[0],), t_curr, jnp.float32)
        residuals = controlnet_apply(
            img=img, img_ids=img_ids, controlnet_cond=controlnet_cond,
            txt=txt, txt_ids=txt_ids, timesteps=t_vec, y=vec, guidance=guidance_vec,
        )
        residuals = [r * controlnet_gs for r in residuals]
        kw = {} if image_proj is None else {"image_proj": image_proj, "ip_scale": ip_scale}
        nkw = ({} if neg_image_proj is None
               else {"image_proj": neg_image_proj, "ip_scale": neg_ip_scale})
        pred = model_apply(
            img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
            timesteps=t_vec, y=vec,
            block_controlnet_hidden_states=residuals, guidance=guidance_vec, **kw,
        )
        neg_pred = model_apply(
            img=img, img_ids=img_ids, txt=neg_txt, txt_ids=neg_txt_ids,
            timesteps=t_vec, y=neg_vec,
            block_controlnet_hidden_states=residuals, guidance=guidance_vec, **nkw,
        )
        pred = jnp.where(cfg_on, neg_pred + true_gs * (pred - neg_pred), pred)
        return img + (t_prev - t_curr) * pred.astype(img.dtype)

    for i, (t_curr, t_prev) in enumerate(zip(timesteps[:-1], timesteps[1:])):
        img = step(img, t_curr, t_prev, i >= timestep_to_start_cfg)
    return img
