"""BSQ-ViT transformer transcoder backbone ("bsqvit").

Re-implements the behaviour of the reference's transformer encoder/decoder
(`/root/reference/pit/modules/vit.py:282,448`): Linear patchify with the
(c, sh, sw) channel-major patch-feature order, learned positional embedding,
pre-LN residual attention blocks (packed-QKV multi-head attention, GELU MLP,
optional LayerScale/DropPath), causal/block-causal masks, quant_embed ->
2*z_channels head, and the decoder's tanh-FFN output head.

TPU-first: batch-first (B, L, C) layout throughout (the reference permutes
to torch's (L, B, C)), attention as fused einsums that XLA maps onto the
MXU, fp32 softmax.  Param names mirror the torch tree for mechanical
checkpoint conversion (transformer.resblocks.0.attn.in_proj_weight ->
transformer/resblocks_0/attn/in_proj/kernel).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module routed through the one-pass Pallas
    kernel on TPU (ops/layer_norm.py; XLA's lowering costs ~0.24 ms per
    norm at the bsqvit train shape — mean/var as separate reduce passes).

    Parameter tree (scale/bias over the last axis), init, and epsilon
    semantics match flax nn.LayerNorm, so checkpoints are interchangeable.
    Off-TPU (and while initializing) it computes the plain flax way.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, add=None):
        """LN(x), or with `add` the fused pair (s, y) = (x+add, LN(x+add))
        — the residual-stream entry point used by
        ResidualAttentionBlock.streamed."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        import os

        use_kernel = (
            jax.default_backend() == "tpu"
            and not self.is_initializing()
            and c % 128 == 0
            and os.environ.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
        )
        if use_kernel:
            from vqvae_from_gaussian_vae_tpu.ops.layer_norm import (
                layer_norm, layer_norm_add)

            if add is not None:
                return layer_norm_add(x.astype(self.dtype),
                                      add.astype(self.dtype),
                                      scale, bias, self.epsilon)
            return layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)
        s = x if add is None else x + add
        xf = s.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = (xc * jax.lax.rsqrt(var + self.epsilon) * scale + bias).astype(self.dtype)
        if add is not None:
            return s.astype(self.dtype), y
        return y


def get_attention_mask(sequence_length: int, mask_type: str = "none", block_size: int = 16):
    """Additive (-inf) disable mask, or None (`vit.py:38-80`)."""
    if mask_type is None or mask_type.lower() == "none":
        return None
    if mask_type.lower() == "causal":
        return jnp.triu(
            jnp.full((sequence_length, sequence_length), -jnp.inf, jnp.float32), k=1
        )
    if mask_type.lower() == "block-causal":
        assert sequence_length % block_size == 0
        blocks = np.kron(
            np.eye(sequence_length // block_size), np.ones((block_size, block_size))
        )
        causal = np.tril(np.ones((sequence_length, sequence_length)))
        disable = (blocks + causal) < 0.5
        return jnp.where(disable, -jnp.inf, 0.0).astype(jnp.float32)
    raise NotImplementedError(f"Mask type {mask_type} not implemented")


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible packed-QKV self-attention.

    On TPU, unmasked attention routes through the layout-native Pallas
    flash kernel (ops/flash_blc.py), which consumes the packed-QKV
    projection's (B, L, H*D) slices directly — the whole attention block
    runs without a single (B, L, C) <-> (B, H, L, D) layout copy (the
    conventional head-major kernel cost 4 copies x 25 MB per layer,
    9.4 ms of a 65 ms bsqvit e2e forward).  The einsum fallback (masked
    video paths, non-TPU backends, exotic shapes) also stays in blhd
    form, but materialises the fp32 (B, H, L, L) probability tensor —
    805 MB per block at the bsqvit shape, measured 3x slower.
    """

    d_model: int
    n_head: int
    flash: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        b, l, c = x.shape
        hd = c // self.n_head
        # Param layout is identical to nn.Dense(3c name=in_proj)/Dense(c
        # name=out_proj) so checkpoints/converters are unaffected.
        w_in = self.param(
            "in_proj",
            lambda rng, shape: {
                "kernel": nn.initializers.lecun_normal()(rng, (c, 3 * c)),
                "bias": jnp.zeros((3 * c,)),
            },
            None,
        )
        xc = x.astype(self.dtype)
        qkv = xc @ w_in["kernel"].astype(self.dtype) + w_in["bias"].astype(self.dtype)
        _env = __import__("os").environ
        # GVQ_FLASH_INTERPRET=1 runs the Pallas kernel in interpret mode
        # off-TPU (tests compare it against the einsum fallback)
        force_interp = (
            _env.get("GVQ_FLASH_INTERPRET", "") == "1"
            and jax.default_backend() != "tpu"
        )
        from vqvae_from_gaussian_vae_tpu.ops.flash_blc import (
            flash_attention_qkv, flash_blc_supported)

        use_flash = (
            self.flash
            and attn_mask is None
            and (jax.default_backend() == "tpu" or force_interp)
            and flash_blc_supported(l, self.n_head, hd, qkv.dtype)
            and _env.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
        )
        if use_flash:
            # packed entry: no jnp.split — the kernel's index maps slice
            # q/k/v out of the projection output in place
            out = flash_attention_qkv(qkv, hd ** -0.5, self.n_head,
                                      force_interp)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qh = q.reshape(b, l, self.n_head, hd)
            kh = k.reshape(b, l, self.n_head, hd)
            vh = v.reshape(b, l, self.n_head, hd)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * (hd**-0.5)
            if attn_mask is not None:
                attn = attn + attn_mask
            attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, l, c)
        w_out = self.param(
            "out_proj",
            lambda rng, shape: {
                "kernel": nn.initializers.lecun_normal()(rng, (c, c)),
                "bias": jnp.zeros((c,)),
            },
            None,
        )
        out = out @ w_out["kernel"].astype(self.dtype)
        return out + w_out["bias"].astype(self.dtype)


class _MLP(nn.Module):
    width: int
    mlp_width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_width, dtype=self.dtype, name="c_fc")(x)
        # fp32 keeps torch nn.GELU's exact erf for reference parity
        # (vit.py:86).  bf16 uses the tanh approximation: its max abs error
        # (5e-4) sits 60x below bf16 rounding of the exact function (3e-2),
        # while exact erf halves MLP-block throughput on the VPU (measured
        # v5e, 8x1024x768: 0.83 -> 0.43 ms/block, 47% -> 92% of MXU peak).
        exact = jnp.dtype(self.dtype) != jnp.dtype(jnp.bfloat16)
        x = jax.nn.gelu(x, approximate=not exact)
        return nn.Dense(self.width, dtype=self.dtype, name="c_proj")(x)


class LayerScale(nn.Module):
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", lambda k, s: jnp.full(s, self.init_values), (self.dim,))
        return x * gamma


class ResidualAttentionBlock(nn.Module):
    """Pre-LN (default) or post-LN residual block (`vit.py:93-203`).

    drop/attn_drop/drop_path are accepted for config parity; the shipped
    configs train with all of them at 0, and stochastic depth can be added
    via the train flag later without changing checkpoints.
    """

    d_model: int
    n_head: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    use_preln: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        # flax reduces LN statistics in fp32 regardless; pinning the
        # OUTPUT dtype to fp32 cost a transposed 50 MB materialisation
        # per LN on TPU (1.03 ms x 24 per forward, per-op trace)
        self.ln_1 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = MultiheadAttention(self.d_model, self.n_head, dtype=self.dtype)
        self.ln_2 = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp = _MLP(self.d_model, int(self.d_model * self.mlp_ratio), dtype=self.dtype)
        if self.ls_init_value is not None:
            self.ls_1 = LayerScale(self.d_model, self.ls_init_value)
            self.ls_2 = LayerScale(self.d_model, self.ls_init_value)

    def _ls(self, idx, x):
        if self.ls_init_value is None:
            return x
        return (self.ls_1 if idx == 1 else self.ls_2)(x)

    def __call__(self, x, attn_mask=None, train: bool = False):
        if self.use_preln:
            x = x + self._ls(1, self.attn(self.ln_1(x), attn_mask))
            x = x + self._ls(2, self.mlp(self.ln_2(x)))
        else:
            x = x + self.attn(x, attn_mask)
            x = self.ln_1(x)
            x = x + self.mlp(x)
            x = self.ln_2(x)
        return x

    def streamed(self, stream, delta, attn_mask=None, train: bool = False):
        """Pre-LN step over a (stream, delta) residual pair: the pending
        residual add fuses into the LN kernel's read (ops/layer_norm.py
        `layer_norm_add`) — the standalone 25 MB add passes were ~0.5 ms
        each on TPU once LN left XLA's fusion domain.  Math-identical to
        __call__ with x = stream + delta."""
        if delta is None:
            s1, y1 = stream, self.ln_1(stream)
        else:
            s1, y1 = self.ln_1(stream, add=delta)
        a = self._ls(1, self.attn(y1, attn_mask))
        s2, y2 = self.ln_2(s1, add=a)
        m = self._ls(2, self.mlp(y2))
        return s2, m


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    use_preln: bool = True
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        block = ResidualAttentionBlock
        if self.remat:
            block = nn.remat(ResidualAttentionBlock, static_argnums=(3,))
        self.resblocks = [
            block(
                d_model=self.width,
                n_head=self.heads,
                mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value,
                use_preln=self.use_preln,
                dtype=self.dtype,
            )
            for _ in range(self.layers)
        ]

    def __call__(self, x, attn_mask=None, train: bool = False):
        if self.use_preln and not self.remat:
            # remat wraps __call__ only, so the streamed pair-threading is
            # bypassed when activation checkpointing is requested
            stream, delta = x, None
            for blk in self.resblocks:
                stream, delta = blk.streamed(stream, delta, attn_mask, train)
            return stream if delta is None else stream + delta
        for blk in self.resblocks:
            x = blk(x, attn_mask, train)
        return x


def _patchify(x: jnp.ndarray, p: Tuple[int, int]) -> jnp.ndarray:
    """(B,H,W,C) -> (B, hh*ww, C*sh*sw) with channel-major feature order,
    matching the reference's "b c (hh sh) (ww sw) -> b (hh ww) (c sh sw)"
    (`vit.py:392-399`)."""
    b, hh_sh, ww_sw, c = x.shape
    hh, ww = hh_sh // p[0], ww_sw // p[1]
    x = x.reshape(b, hh, p[0], ww, p[1], c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, hh, ww, c, sh, sw
    return x.reshape(b, hh * ww, c * p[0] * p[1])


def _unpatchify(x: jnp.ndarray, grid: Tuple[int, int], p: Tuple[int, int], c: int) -> jnp.ndarray:
    """Inverse of _patchify: (B, L, c*sh*sw) -> (B, H, W, c) (`vit.py:613-620`)."""
    b = x.shape[0]
    x = x.reshape(b, grid[0], grid[1], c, p[0], p[1])
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, hh, sh, ww, sw, c
    return x.reshape(b, grid[0] * p[0], grid[1] * p[1], c)


class TransformerEncoder(nn.Module):
    """(`vit.py:282-445`): image -> (B, L, 2*z or z) tokens."""

    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_ratio: float
    double_z: bool
    z_channels: int
    ls_init_value: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ln_pre: bool = True
    ln_post: bool = True
    act_layer: str = "gelu"
    norm_layer: str = "layer_norm"
    mask_type: Optional[str] = "none"
    mask_block_size: int = -1
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        assert self.act_layer.lower() == "gelu"
        assert self.norm_layer.lower() == "layer_norm"
        p = (self.patch_size, self.patch_size)
        self.grid_size = (self.image_size // p[0], self.image_size // p[1])
        self.conv1 = nn.Dense(self.width, use_bias=not self.ln_pre, dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (self.grid_size[0] * self.grid_size[1], self.width),
        )
        self.ln_pre_mod = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre") if self.ln_pre else None
        self.transformer = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.ln_post_mod = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")
        zc = self.z_channels * 2 if self.double_z else self.z_channels
        self.quant_embed = nn.Dense(zc, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        p = (self.patch_size, self.patch_size)
        x = _patchify(x, p)
        x = self.conv1(x)
        x = x + self.positional_embedding.astype(x.dtype)
        if self.ln_pre_mod is not None:
            x = self.ln_pre_mod(x)
        block = (
            self.grid_size[0] * self.grid_size[1]
            if self.mask_block_size <= 0
            else self.mask_block_size
        )
        mask = get_attention_mask(x.shape[1], self.mask_type or "none", block)
        x = self.transformer(x, mask, train)
        x = self.ln_post_mod(x)
        return self.quant_embed(x)

    @staticmethod
    def last_layer_path():
        """Encoder's final projection (quant_embed); the reference's
        enc_last_layer assumes a conv_out attribute and would fail for the
        ViT backbone - this is the analogous head."""
        return ("quant_embed", "kernel")


class TransformerDecoder(nn.Module):
    """(`vit.py:448-642`): (B, L, z) tokens -> image."""

    image_size: int
    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_ratio: float
    double_z: bool  # accepted for config aliasing (decoder ignores it)
    z_channels: int
    ls_init_value: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ln_pre: bool = True
    ln_post: bool = True
    act_layer: str = "gelu"
    norm_layer: str = "layer_norm"
    use_ffn_output: bool = True
    dim_ffn_output: int = 3072
    logit_laplace: bool = False
    mask_type: Optional[str] = "none"
    mask_block_size: int = -1
    remat: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        assert self.act_layer.lower() == "gelu"
        assert self.norm_layer.lower() == "layer_norm"
        p = (self.patch_size, self.patch_size)
        self.grid_size = (self.image_size // p[0], self.image_size // p[1])
        out_feats = 3 * p[0] * p[1] * (1 + int(self.logit_laplace))
        if self.use_ffn_output:
            self.ffn_0 = nn.Dense(self.dim_ffn_output, dtype=self.dtype)
            self.conv_out = nn.Dense(out_feats, dtype=self.dtype)
        else:
            self.ffn_0 = None
            self.conv_out = nn.Dense(out_feats, dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (self.grid_size[0] * self.grid_size[1], self.width),
        )
        self.ln_pre_mod = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre") if self.ln_pre else None
        self.transformer = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            ls_init_value=self.ls_init_value,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.ln_post_mod = FusedLayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post") if self.ln_post else None
        self.post_quant_embed = nn.Dense(self.width, dtype=self.dtype)

    def _trunk(self, x, train: bool = False):
        x = self.post_quant_embed(x)
        x = x + self.positional_embedding.astype(x.dtype)
        if self.ln_pre_mod is not None:
            x = self.ln_pre_mod(x)
        block = (
            self.grid_size[0] * self.grid_size[1]
            if self.mask_block_size <= 0
            else self.mask_block_size
        )
        mask = get_attention_mask(x.shape[1], self.mask_type or "none", block)
        x = self.transformer(x, mask, train)
        if self.ln_post_mod is not None:
            x = self.ln_post_mod(x)
        if self.ffn_0 is not None:
            x = jnp.tanh(self.ffn_0(x))
        return x

    def __call__(self, x, train: bool = False):
        x = self._trunk(x, train)
        x = self.conv_out(x)
        p = (self.patch_size, self.patch_size)
        return _unpatchify(x, self.grid_size, p, 3 * (1 + int(self.logit_laplace)))

    def pre_last_layer(self, x, train: bool = False):
        """Trunk output right before conv_out, for the adaptive GAN weight
        (decoder `get_last_layer` = conv_out.weight, `vit.py:572-573`)."""
        return self._trunk(x, train)

    def last_layer(self, x, train: bool = False):
        """conv_out + unpatchify; composing pre_last_layer |> last_layer ==
        __call__."""
        x = self.conv_out(x)
        p = (self.patch_size, self.patch_size)
        return _unpatchify(x, self.grid_size, p, 3 * (1 + int(self.logit_laplace)))

    @staticmethod
    def last_layer_path() -> Tuple[str, ...]:
        return ("conv_out", "kernel")
