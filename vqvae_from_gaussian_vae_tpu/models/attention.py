"""Generic attention zoo (`/root/reference/pit/modules/attention.py`).

The reference carries the Stable-Diffusion attention machinery; only
LinearAttention and the memory-efficient single-head block are consumed by
the UNet (`unet.py:46`), and those live in models/unet.py.  The rest -
cross-attention, GEGLU feed-forward, BasicTransformerBlock and
SpatialTransformer - are provided here for parity and for conditioning
extensions.  On TPU, "memory-efficient attention" is simply the fused einsum
softmax chain: XLA tiles it flash-style, so one implementation serves both
the vanilla and xformers variants of the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models.unet import LinAttnBlock, Normalize  # noqa: F401 (re-export)


class CrossAttention(nn.Module):
    """(`attention.py:279-368`): q from x, k/v from context (or x)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (self.dim_head**-0.5)
        if mask is not None:
            attn = jnp.where(mask[:, None, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


# the reference's xformers variant collapses onto the same fused math on TPU
MemoryEfficientCrossAttention = CrossAttention


class SelfAttention(nn.Module):
    """(`attention.py:178-231`): timm-style multi-head self-attention with a
    packed qkv Linear.  The reference's three attn_modes (xformers / torch /
    math) are one fused einsum chain on TPU."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, l, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SpatialSelfAttention(nn.Module):
    """(`attention.py:234-276`): single-head attention over the spatial grid
    with 1x1-conv q/k/v/proj and a GroupNorm — the SD flavour of the UNet's
    AttnBlock, kept for layout parity (NHWC here)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = Normalize("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """(`attention.py` FeedForward): GEGLU (or GELU) MLP."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        else:
            x = nn.Dense(inner, dtype=self.dtype, name="net_0")(x)
            x = jax.nn.gelu(x)
        return nn.Dense(self.dim_out or self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """(`attention.py:480-560`): self-attn, cross-attn, GEGLU FF, pre-LN."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        attn1 = CrossAttention(
            self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            heads=self.n_heads, dim_head=self.d_head, dtype=self.dtype, name="attn1",
        )
        x = x + attn1(nn.LayerNorm(name="norm1")(x),
                      context=context if self.disable_self_attn else None)
        attn2 = CrossAttention(
            self.dim, context_dim=self.context_dim,
            heads=self.n_heads, dim_head=self.d_head, dtype=self.dtype, name="attn2",
        )
        x = x + attn2(nn.LayerNorm(name="norm2")(x), context=context)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(name="norm3")(x)
        )
        return x


class BasicTransformerSingleLayerBlock(nn.Module):
    """(`attention.py:599-640`): one (cross-)attention + FF block, pre-LN —
    the two reference attn_modes are the same fused math here."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    gated_ff: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        attn1 = CrossAttention(self.dim, context_dim=self.context_dim,
                               heads=self.n_heads, dim_head=self.d_head,
                               dtype=self.dtype, name="attn1")
        x = attn1(nn.LayerNorm(name="norm1")(x), context=context) + x
        x = FeedForward(self.dim, glu=self.gated_ff, dtype=self.dtype,
                        name="ff")(nn.LayerNorm(name="norm2")(x)) + x
        return x


class SimpleTransformer(nn.Module):
    """(`attention.py:750-783`): a plain stack of BasicTransformerBlocks."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        cls = nn.remat(BasicTransformerBlock) if self.remat else BasicTransformerBlock
        for i in range(self.depth):
            x = cls(self.dim, self.heads, self.dim_head,
                    context_dim=self.context_dim, dtype=self.dtype,
                    name=f"layers_{i}")(x, context)
        return x


class SpatialTransformer(nn.Module):
    """(`attention.py:643-783`): GroupNorm -> 1x1 in-proj -> transformer
    blocks over the flattened grid -> 1x1 out-proj, residual."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        residual = x
        x = Normalize("norm")(x)
        x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.n_heads, self.d_head, context_dim=self.context_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(x, context=context)
        x = x.reshape(b, h, w, inner)
        x = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="proj_out")(x)
        return x + residual
