"""SD3-style convolutional VAE backbone ("sd3unet").

Re-implements the behaviour of the reference's Stability-AI conv VAE
(`/root/reference/pit/modules/unet.py:317,439`): swish nonlinearity,
GroupNorm(32, eps=1e-6), ResNet blocks, single-head attention at configured
resolutions, asymmetric-padded stride-2 downsampling and nearest x2
upsampling, with `double_z` doubling the latent channels for (mu, logvar).
Mid-block attention is omitted exactly as the reference comments it out
(`unet.py:391,429,500,566`).

TPU-first: NHWC layout end to end (images are (B, H, W, C)), bf16-friendly
compute dtype knob, and attention as one fused einsum chain.  Submodule names
mirror the torch module tree so `utils.torch_convert` maps reference
checkpoints mechanically (down.0.block.1.conv1.weight -> down_0/block_1/
conv1/kernel).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)  # swish (unet.py:49-51)


def group_norm_from_stats(x, stats, scale, bias, num_groups: int = 32,
                          eps: float = 1e-6):
    """GroupNorm(32) normalize from precomputed channel statistics.

    ``stats`` is (B, 2, C) f32 — (sum, sum-of-squares over H*W) — as emitted
    by the fused resample Pallas kernels (ops/upsample_conv.py).  With the
    statistics reduce done in-kernel, the normalize here is pure elementwise
    math that XLA fuses into the following conv's prologue, restoring the
    fusion structure the plain path gets for free (the conv fusions emit
    (out, sum, sumsq) tuples — see the Upsample docstring).
    """
    b, h, w, c = x.shape
    cg = c // num_groups
    s = stats[:, 0].reshape(b, num_groups, cg).sum(-1)
    ss = stats[:, 1].reshape(b, num_groups, cg).sum(-1)
    n = h * w * cg
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean = jnp.repeat(mean, cg, axis=-1)[:, None, None, :]
    inv = jnp.repeat(inv, cg, axis=-1)[:, None, None, :]
    y = (x.astype(jnp.float32) - mean) * inv
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _resample_fuses(flag: bool, train: bool, h: int, dtype,
                    train_ok: bool = False) -> bool:
    """True when Up/Downsample will take the Pallas fused path (must mirror
    the use_fused conditions in those modules); lets the level defer the
    last resblock's residual add into the kernel.

    train_ok marks ops whose fused kernel has a custom VJP (the upsample,
    ops/upsample_conv.py) so the bf16 training path can use it too; the
    backward is the phase-algebra adjoint at 16/36 of the naive dgrad/wgrad
    FLOPs.  GVQ_FUSED_TRAIN=0 opts training back onto the plain XLA path.

    Multi-chip: the resample kernels carry custom_partitioning annotations
    (Shardy rule + partition callbacks, ops/*.py) that shard them over the
    batch dim of a GSPMD mesh — verified on the 8-device CPU mesh
    (tests/test_fused_partitioning.py).  GVQ_DISABLE_FUSED_KERNELS=1
    remains as a manual escape hatch to force the plain XLA path.
    """
    import os

    if train and not (train_ok and os.environ.get("GVQ_FUSED_TRAIN", "1") != "0"):
        return False
    return (
        bool(flag)
        and os.environ.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
        and jax.default_backend() == "tpu"
        and h % 4 == 0
        and jnp.dtype(dtype) == jnp.bfloat16
    )


def Normalize(name=None, num_groups: int = 32, dtype=None) -> nn.GroupNorm:
    """GroupNorm(32, eps=1e-6) (unet.py:54-57).  dtype=None inherits the
    activation dtype (bf16 I/O on TPU); flax always computes the mean/var
    statistics in float32 regardless, so bf16 here only changes the
    elementwise normalize/affine I/O - saving full-resolution fp32
    activation round-trips through HBM."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-6, dtype=dtype, name=name)


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv (unet.py:60-73).

    fused=True (default) routes the TPU inference path through the fused
    phase-conv Pallas kernel (ops/upsample_conv.py): nearest upsampling
    duplicates pixels, so the 3x3 taps collapse to four 2x2 phase kernels —
    16/36 of the FLOPs — and the 4x-size upsampled intermediate never
    touches HBM.  Getting the e2e win required two further pieces (history
    in git): (1) a stats epilogue — the plain-XLA decoder fuses each conv
    with the next GroupNorm's statistics reduce, so the kernel emits
    per-sample (sum, sumsq) and the consumer resblock normalizes via
    group_norm_from_stats, elementwise math XLA fuses into its conv; (2)
    layout preservation — XLA lays conv activations out as {3,0,2,1}
    (physical H, W, B, C) while pallas pins row-major, so the kernel
    computes on logically-(H,W,B,C) arrays and the wrapping transposes are
    free bitcasts.  Measured v5e decoder e2e (bs=16, bf16): 49.7 ms fused
    vs 60.2 ms plain (1.21x).  Same param layout (conv/{kernel,bias});
    exact to bf16 rounding; training and non-TPU backends always use the
    plain XLA path (the kernel has no VJP).
    """

    in_channels: int
    with_conv: bool = True
    fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, with_stats: bool = False,
                 add=None):
        if add is not None and self.is_initializing():
            x, add = x + add, None
        b, h, w, c = x.shape
        if not self.with_conv:
            assert add is None
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return (y, None) if with_stats else y
        o = self.in_channels
        conv = nn.Conv(o, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv")
        # bf16 only: the Pallas fp32 matmul uses fewer bf16 passes than
        # XLA's excess-precision fp32 convs (measured ~3e-2 divergence);
        # fp32 inference keeps exact plain-XLA parity
        use_fused = _resample_fuses(self.fused, train, h, self.dtype,
                                    train_ok=True)
        if not use_fused or self.is_initializing():
            # init always takes this path so the conv/{kernel,bias} params
            # exist identically for both; the fused path reuses them below
            assert add is None  # levels defer the add only on the fused path
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            y = conv(y)
            return (y, None) if with_stats else y

        # custom-VJP wrappers: identical Pallas forward; training backward
        # is the phase-algebra adjoint (ops/upsample_conv.py)
        from vqvae_from_gaussian_vae_tpu.ops.upsample_conv import (
            upsample_nearest_conv3x3_gn_add_vjp,
            upsample_nearest_conv3x3_gn_vjp,
        )

        cp = self.variables["params"]["conv"]
        if add is None:
            y, stats = upsample_nearest_conv3x3_gn_vjp(
                x.astype(self.dtype), cp["kernel"].astype(self.dtype), cp["bias"])
        else:
            y, stats = upsample_nearest_conv3x3_gn_add_vjp(
                x.astype(self.dtype), add.astype(self.dtype),
                cp["kernel"].astype(self.dtype), cp["bias"])
        return (y, stats) if with_stats else y


class Downsample(nn.Module):
    """Asymmetric (0,1) pad + stride-2 VALID conv (unet.py:76-97).

    fused=True routes the TPU inference path through the layout-preserving
    phase-matmul Pallas kernel (ops/downsample_conv.py): XLA's stride-2
    conv runs at 15-34% MXU at the encoder shapes (per-op trace) while the
    kernel's 9 dense phase matmuls are FLOP-exact; it also emits the
    output's GN statistics so the consumer GroupNorm costs no extra
    full-res pass.  Same param layout (conv/{kernel,bias}).  Training
    uses the same fused op through its custom VJP (Pallas dgrad/wgrad,
    ops/downsample_conv.py; GVQ_DOWNSAMPLE_BWD=conv falls back to the
    conv-form adjoint, GVQ_FUSED_TRAIN=0 to plain XLA); non-TPU backends
    always take the plain XLA path.
    """

    in_channels: int
    with_conv: bool = True
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, with_stats: bool = False,
                 add=None):
        if add is not None and self.is_initializing():
            x, add = x + add, None
        if not self.with_conv:
            assert add is None
            y = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return (y, None) if with_stats else y
        conv = nn.Conv(self.in_channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")
        use_fused = _resample_fuses(self.fused, train, x.shape[1], self.dtype,
                                    train_ok=True)
        if not use_fused or self.is_initializing():
            assert add is None  # levels defer the add only on the fused path
            y = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = conv(y)
            return (y, None) if with_stats else y

        # custom-VJP wrappers: identical Pallas forward; training backward
        # is the phase-algebra adjoint (ops/downsample_conv.py)
        from vqvae_from_gaussian_vae_tpu.ops.downsample_conv import (
            downsample_conv3x3_gn_add_vjp,
            downsample_conv3x3_gn_vjp,
        )

        cp = self.variables["params"]["conv"]
        if add is None:
            y, stats = downsample_conv3x3_gn_vjp(
                x.astype(self.dtype), cp["kernel"].astype(self.dtype), cp["bias"])
        else:
            y, stats = downsample_conv3x3_gn_add_vjp(
                x.astype(self.dtype), add.astype(self.dtype),
                cp["kernel"].astype(self.dtype), cp["bias"])
        return (y, stats) if with_stats else y


class ResnetBlock(nn.Module):
    """(unet.py:100-157); temb is unused by the VAE (temb_channels=0).

    fused_gn_conv routes the two GroupNorm+swish+conv pairs through the
    Pallas kernel (ops/fused_gn_conv.py) on the inference path - same
    params, 2 fewer full-resolution HBM passes per conv.  Dropout (0 in
    every shipped config) and training fall back to the XLA path.
    """

    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    fused_gn_conv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, in_stats=None,
                 defer_add: bool = False):
        out_ch = self.out_channels or self.in_channels
        use_fused = (
            self.fused_gn_conv
            and not train
            and self.dropout == 0.0
            and x.shape[1] % 8 == 0
        )
        use_in_stats = (
            in_stats is not None
            and not use_fused and not self.is_initializing()
        )
        if use_fused:
            from vqvae_from_gaussian_vae_tpu.ops.fused_gn_conv import fused_gn_swish_conv

            # explicit param dicts sharing the nn.GroupNorm/nn.Conv layout
            # (same names/shapes/inits -> checkpoints unchanged)
            def gn_init(c):
                return lambda rng: {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

            def conv_init(cin, cout):
                return lambda rng: {
                    "kernel": nn.initializers.lecun_normal()(rng, (3, 3, cin, cout)),
                    "bias": jnp.zeros((cout,)),
                }

            n1 = self.param("norm1", gn_init(self.in_channels))
            c1 = self.param("conv1", conv_init(self.in_channels, out_ch))
            n2 = self.param("norm2", gn_init(out_ch))
            c2 = self.param("conv2", conv_init(out_ch, out_ch))
            bh = 32 if x.shape[1] % 32 == 0 else 8
            h = fused_gn_swish_conv(
                x.astype(self.dtype), n1["scale"], n1["bias"],
                c1["kernel"], c1["bias"], block_h=bh,
            )
            h = fused_gn_swish_conv(
                h, n2["scale"], n2["bias"], c2["kernel"], c2["bias"], block_h=bh,
            )
        else:
            # GVQ_CONV_WGRAD=1 routes the 3x3 convs through the custom-VJP
            # op whose weight gradient is the Pallas kernel
            # (ops/conv3x3_train.py).  OFF by default: although XLA's
            # wgrads run at ~32% MXU here, they fuse the GN-normalize+swish
            # recompute into the wgrad conv, so the producer activation
            # never hits HBM; the custom op must save it as a residual and
            # measured a net LOSS (ae step 287.6 -> 325.9 ms at bs=16).
            # Matching XLA needs the normalize+swish applied in-kernel from
            # stats — future work.
            _env = __import__("os").environ
            use_wg = (
                train and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and jnp.dtype(self.dtype) == jnp.bfloat16
                and _env.get("GVQ_CONV_WGRAD", "0") == "1"
                and _env.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
            )

            def conv3(name, v):
                if use_wg:
                    from vqvae_from_gaussian_vae_tpu.ops.conv3x3_train import (
                        conv3x3_same_wg,
                    )

                    p = self.variables["params"][name]
                    return conv3x3_same_wg(
                        v.astype(self.dtype), p["kernel"].astype(self.dtype),
                        p["bias"].astype(self.dtype))
                return nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                               dtype=self.dtype, name=name)(v)

            # GVQ_GN_BWD=1 routes GroupNorm+swish through the custom-VJP
            # op whose BACKWARD is the one-kernel two-phase Pallas GN+swish
            # adjoint (ops/gn_swish_bwd.py): XLA's backward materialises
            # the dh_gn intermediate between its stats and apply fusions
            # (6 activation traversals/site); the kernel recomputes it in
            # VMEM (5).  Experiment knob — ship/remove on the bench_train
            # measurement (round-5 GN-dgrad spike, docs/kernels.md).
            use_gnb = (
                train and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and jnp.dtype(self.dtype) == jnp.bfloat16
                and _env.get("GVQ_GN_BWD", "0") == "1"
                and _env.get("GVQ_DISABLE_FUSED_KERNELS", "") != "1"
            )

            def gn_swish_site(name, v):
                from vqvae_from_gaussian_vae_tpu.ops.gn_swish_bwd import gn_swish

                p = self.variables["params"][name]
                return gn_swish(v.astype(self.dtype), p["scale"], p["bias"])

            if use_in_stats:
                # the producing resample kernel already reduced the GN
                # statistics; normalize is elementwise -> fuses into conv1
                p = self.variables["params"]["norm1"]
                h = group_norm_from_stats(x, in_stats, p["scale"], p["bias"])
                h = nonlinearity(h)
            elif use_gnb:
                h = gn_swish_site("norm1", x)
            else:
                h = nonlinearity(Normalize("norm1", dtype=self.dtype)(x))
            h = conv3("conv1", h)
            if use_gnb:
                h = gn_swish_site("norm2", h)
            else:
                h = nonlinearity(Normalize("norm2", dtype=self.dtype)(h))
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = conv3("conv2", h)
        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        if defer_add:
            # the consuming fused resample kernel sums these in VMEM,
            # skipping a full-HBM materialisation of the residual add
            return x, h
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the spatial grid (unet.py:166-206).

    q/k/v/proj are 1x1 convs; softmax runs in fp32 with the torch SDPA
    default scale (c^-0.5).  The bf16 TPU path routes the SDPA through the
    packed flash kernel (ops/flash_blc.py, n_head=1 — c=512 is a full MXU
    contraction), which keeps the fp32 (B, L, L) score tensor in VMEM
    instead of HBM (67 MB per block at the headline bs=16, 32x32 shape);
    fp32 keeps the exact einsum path for reference parity.
    """

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = Normalize("norm", dtype=self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        from vqvae_from_gaussian_vae_tpu.ops.flash_blc import sdpa_token_major

        l = hh * ww
        h = sdpa_token_major(
            q.reshape(b, l, 1, c), k.reshape(b, l, 1, c),
            v.reshape(b, l, 1, c), c ** -0.5).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class LinAttnBlock(nn.Module):
    """Linear (kernel-feature) attention, the reference's `use_linear_attn`
    path (unet.py:159-163 via attention.py LinearAttention), single head."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = x.reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("bnd,bne->bde", k, v)
        out = jnp.einsum("bnd,bde->bne", q, ctx)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, hh, ww, c)


def make_attn(in_channels: int, attn_type: str = "vanilla", dtype: Any = jnp.float32):
    """(unet.py:282-314).  "vanilla-xformers" maps to the same fused einsum
    attention - XLA's flash-style fusion is the TPU memory-efficient path."""
    assert attn_type in ("vanilla", "vanilla-xformers", "linear", "none"), attn_type
    if attn_type in ("vanilla", "vanilla-xformers"):
        return AttnBlock(in_channels, dtype=dtype)
    if attn_type == "none":
        return None
    return LinAttnBlock(in_channels, dtype=dtype)


def _resblock_cls(remat: bool):
    """ResnetBlock, optionally remat-wrapped (jax.checkpoint): recompute
    activations in the backward pass to cut training memory - the analog of
    the reference's commented-out torch checkpointing (unet.py:157)."""
    if remat:
        return nn.remat(ResnetBlock, static_argnums=(2,))
    return ResnetBlock


class _DownLevel(nn.Module):
    block_specs: Tuple[Tuple[int, int], ...]  # (in, out) per res block
    use_attn: bool
    attn_type: str
    dropout: float
    has_downsample: bool
    remat: bool = False
    fused_gn_conv: bool = False
    fused_downsample: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        cls = _resblock_cls(self.remat)
        self.block = [
            cls(in_channels=i, out_channels=o, dropout=self.dropout,
                fused_gn_conv=self.fused_gn_conv, dtype=self.dtype)
            for i, o in self.block_specs
        ]
        if self.use_attn:
            self.attn = [
                make_attn(o, self.attn_type, self.dtype) for _, o in self.block_specs
            ]
        if self.has_downsample:
            self.downsample = Downsample(self.block_specs[-1][1],
                                         fused=self.fused_downsample,
                                         dtype=self.dtype)

    def __call__(self, x, train: bool = False, in_stats=None):
        n = len(self.block)
        defer = (
            self.has_downsample
            and not self.use_attn
            and not self.is_initializing()
            and _resample_fuses(self.fused_downsample, train, x.shape[1],
                                self.dtype, train_ok=True)
        )
        add = None
        for i, blk in enumerate(self.block):
            if defer and i == n - 1:
                x, add = blk(x, train, in_stats if i == 0 else None, True)
            else:
                x = blk(x, train, in_stats if i == 0 else None)
                if self.use_attn:
                    x = self.attn[i](x)
        out_stats = None
        if self.has_downsample:
            x, out_stats = self.downsample(x, train=train, with_stats=True, add=add)
        return x, out_stats


class _Mid(nn.Module):
    channels: int
    dropout: float
    fused_gn_conv: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.block_1 = ResnetBlock(in_channels=self.channels, dropout=self.dropout,
                                   fused_gn_conv=self.fused_gn_conv, dtype=self.dtype)
        self.block_2 = ResnetBlock(in_channels=self.channels, dropout=self.dropout,
                                   fused_gn_conv=self.fused_gn_conv, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        x = self.block_1(x, train=train)
        # mid attention intentionally absent (unet.py:391,429 commented out)
        return self.block_2(x, train=train)


class Encoder(nn.Module):
    """(unet.py:317-436).  forward: (B,H,W,3) -> (B,H/f,W/f, 2*z or z)."""

    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    double_z: bool = True
    use_linear_attn: bool = False
    attn_type: str = "vanilla"
    remat: bool = False
    fused_gn_conv: bool = False  # Pallas GN+swish+conv on the inference path
    fused_downsample: bool = True  # Pallas phase-matmul downsample (see Downsample)
    dtype: Any = jnp.float32

    def setup(self):
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        num_resolutions = len(self.ch_mult)
        self.conv_in = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)

        in_ch_mult = (1,) + tuple(self.ch_mult)
        levels = []
        curr_res = self.resolution
        for i_level in range(num_resolutions):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            specs = []
            for _ in range(self.num_res_blocks):
                specs.append((block_in, block_out))
                block_in = block_out
            levels.append(
                _DownLevel(
                    block_specs=tuple(specs),
                    use_attn=(curr_res in self.attn_resolutions) and attn_type != "none",
                    attn_type=attn_type,
                    dropout=self.dropout,
                    has_downsample=i_level != num_resolutions - 1,
                    remat=self.remat,
                    fused_gn_conv=self.fused_gn_conv,
                    fused_downsample=self.fused_downsample,
                    dtype=self.dtype,
                )
            )
            if i_level != num_resolutions - 1:
                curr_res //= 2
        self.down = levels
        self.mid = _Mid(self.ch * self.ch_mult[-1], self.dropout,
                        fused_gn_conv=self.fused_gn_conv, dtype=self.dtype)
        self.norm_out = Normalize(dtype=self.dtype)
        z_out = 2 * self.z_channels if self.double_z else self.z_channels
        self.conv_out = nn.Conv(z_out, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        h = self.conv_in(x)
        stats = None
        for level in self.down:
            h, stats = level(h, train=train, in_stats=stats)
        h = self.mid(h, train=train)
        h = self.norm_out(h)
        h = nonlinearity(h)
        return self.conv_out(h)

    @staticmethod
    def last_layer_path():
        """Param path of the encoder's final projection (the vf adaptive
        weight target, autoencoder.py:444)."""
        return ("conv_out", "kernel")


class _UpLevel(nn.Module):
    block_specs: Tuple[Tuple[int, int], ...]
    use_attn: bool
    attn_type: str
    dropout: float
    has_upsample: bool
    remat: bool = False
    fused_gn_conv: bool = False
    fused_upsample: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        cls = _resblock_cls(self.remat)
        self.block = [
            cls(in_channels=i, out_channels=o, dropout=self.dropout,
                fused_gn_conv=self.fused_gn_conv, dtype=self.dtype)
            for i, o in self.block_specs
        ]
        if self.use_attn:
            self.attn = [
                make_attn(o, self.attn_type, self.dtype) for _, o in self.block_specs
            ]
        if self.has_upsample:
            self.upsample = Upsample(self.block_specs[-1][1],
                                     fused=self.fused_upsample, dtype=self.dtype)

    def __call__(self, x, train: bool = False, in_stats=None):
        n = len(self.block)
        defer = (
            self.has_upsample
            and not self.use_attn
            and not self.is_initializing()
            and _resample_fuses(self.fused_upsample, train, x.shape[1],
                                self.dtype, train_ok=True)
        )
        add = None
        for i, blk in enumerate(self.block):
            if defer and i == n - 1:
                x, add = blk(x, train, in_stats if i == 0 else None, True)
            else:
                x = blk(x, train, in_stats if i == 0 else None)
                if self.use_attn:
                    x = self.attn[i](x)
        out_stats = None
        if self.has_upsample:
            x, out_stats = self.upsample(x, train=train, with_stats=True, add=add)
        return x, out_stats


class Decoder(nn.Module):
    """(unet.py:439-587).  forward: (B,h,w,z) -> (B,H,W,out_ch)."""

    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    tanh_out: bool = False
    use_linear_attn: bool = False
    attn_type: str = "vanilla"
    double_z: bool = True  # accepted for config aliasing; unused
    remat: bool = False
    fused_gn_conv: bool = False  # Pallas GN+swish+conv on the inference path
    fused_upsample: bool = True  # Pallas phase-conv upsample (see Upsample)
    dtype: Any = jnp.float32

    def setup(self):
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        self.conv_in = nn.Conv(block_in, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)
        self.mid = _Mid(block_in, self.dropout, fused_gn_conv=self.fused_gn_conv,
                        dtype=self.dtype)

        levels = [None] * num_resolutions
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            specs = []
            for _ in range(self.num_res_blocks + 1):
                specs.append((block_in, block_out))
                block_in = block_out
            levels[i_level] = _UpLevel(
                block_specs=tuple(specs),
                use_attn=(curr_res in self.attn_resolutions) and attn_type != "none",
                attn_type=attn_type,
                dropout=self.dropout,
                has_upsample=i_level != 0,
                remat=self.remat,
                fused_gn_conv=self.fused_gn_conv,
                fused_upsample=self.fused_upsample,
                dtype=self.dtype,
            )
            if i_level != 0:
                curr_res *= 2
        self.up = levels
        self.norm_out = Normalize(dtype=self.dtype)
        self.conv_out = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)

    def __call__(self, z, train: bool = False):
        h = self.conv_in(z)
        h = self.mid(h, train=train)
        stats = None
        for i_level in reversed(range(len(self.ch_mult))):
            h, stats = self.up[i_level](h, train=train, in_stats=stats)
        if self.give_pre_end:
            return h
        h = self.norm_out(h)
        h = nonlinearity(h)
        h = self.conv_out(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h

    def pre_last_layer(self, z, train: bool = False):
        """Everything up to (excluding) conv_out - used by the adaptive GAN
        weight, which needs gradients w.r.t. only the last layer
        (`discriminator_loss.py:211-220`)."""
        h = self.conv_in(z)
        h = self.mid(h, train=train)
        stats = None
        for i_level in reversed(range(len(self.ch_mult))):
            h, stats = self.up[i_level](h, train=train, in_stats=stats)
        h = self.norm_out(h)
        return nonlinearity(h)

    def last_layer(self, h, train: bool = False):
        """conv_out (+ tanh) applied to pre_last_layer output; composing
        pre_last_layer |> last_layer == __call__."""
        h = self.conv_out(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h

    @staticmethod
    def last_layer_path() -> Tuple[str, ...]:
        """Param-tree path of the adaptive-weight target (decoder
        `get_last_layer`, unet.py:551-552)."""
        return ("conv_out", "kernel")
