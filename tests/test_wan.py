"""WAN causal-3D VAE: flax backbone vs an in-test torch mock implementing
the diffusers ``AutoencoderKLWan`` semantics (causal convs with front-only
zero time padding, channel-L2 RMS norms, SiLU, per-frame spatial attention,
WAN resamples) with the diffusers key layout — the network the reference's
Qwen/WAN wrappers load (`/root/reference/pit/models/autoencoder.py:25-59`)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models.wan import AutoencoderKLWan


# ---- torch mock (diffusers semantics, single-frame path) ------------------

CACHE_T = 2


class TCausalConv3d(torch.nn.Conv3d):
    def __init__(self, cin, cout, kernel=(3, 3, 3), stride=(1, 1, 1)):
        super().__init__(cin, cout, kernel, stride)
        kt, kh, kw = self.kernel_size
        self._pad = (kw // 2, kw // 2, kh // 2, kh // 2, kt - 1, 0)

    def forward(self, x, cache_x=None):
        pad = list(self._pad)
        if cache_x is not None and pad[4] > 0:
            x = torch.cat([cache_x, x], dim=2)
            pad[4] -= cache_x.shape[2]
        return torch.nn.Conv3d.forward(self, F.pad(x, tuple(pad)))


def _tcc(conv, x, feat_cache, feat_idx):
    """The diffusers feat_cache protocol around a causal conv."""
    if feat_cache is None:
        return conv(x)
    idx = feat_idx[0]
    cur = feat_cache.get(idx)
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and cur is not None:
        cache_x = torch.cat([cur[:, :, -1:], cache_x], dim=2)
    out = conv(x, cur)
    feat_cache[idx] = cache_x
    feat_idx[0] += 1
    return out


class TRMS(torch.nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        shape = (dim, 1, 1) if images else (dim, 1, 1, 1)
        self.gamma = torch.nn.Parameter(torch.ones(shape))
        self.scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class TResBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = TRMS(cin, images=False)
        self.conv1 = TCausalConv3d(cin, cout)
        self.norm2 = TRMS(cout, images=False)
        self.conv2 = TCausalConv3d(cout, cout)
        self.conv_shortcut = TCausalConv3d(cin, cout, (1, 1, 1)) if cin != cout else torch.nn.Identity()

    def forward(self, x, feat_cache=None, feat_idx=None):
        h = _tcc(self.conv1, F.silu(self.norm1(x)), feat_cache, feat_idx)
        h = _tcc(self.conv2, F.silu(self.norm2(h)), feat_cache, feat_idx)
        return self.conv_shortcut(x) + h


class TAttn(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = TRMS(dim)
        self.to_qkv = torch.nn.Conv2d(dim, dim * 3, 1)
        self.proj = torch.nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        y = self.norm(x)
        q, k, v = (self.to_qkv(y).reshape(b * t, 1, c * 3, -1)
                   .permute(0, 1, 3, 2).chunk(3, dim=-1))
        y = F.scaled_dot_product_attention(q, k, v)
        y = y.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        y = self.proj(y)
        return identity + y.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


class TResample(torch.nn.Module):
    """The full diffusers WanResample incl. the temporal cache protocol."""

    def __init__(self, dim, mode):
        super().__init__()
        self.mode = mode
        if mode.startswith("upsample"):
            self.resample = torch.nn.Sequential(
                torch.nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                torch.nn.Conv2d(dim, dim // 2, 3, padding=1))
            if mode == "upsample3d":
                # diffusers time_conv has padding=(1,0,0) -> causal front pad 2
                self.time_conv = TCausalConv3d(dim, dim * 2, (3, 1, 1))
        else:
            self.resample = torch.nn.Sequential(
                torch.nn.ZeroPad2d((0, 1, 0, 1)),
                torch.nn.Conv2d(dim, dim, 3, stride=(2, 2)))
            if mode == "downsample3d":
                # padding=(0,0,0): history comes from the cache, never zeros
                self.time_conv = TCausalConv3d(dim, dim, (3, 1, 1), (2, 1, 1))
                self.time_conv._pad = (0, 0, 0, 0, 0, 0)

    def forward(self, x, feat_cache=None, feat_idx=None):
        b, c, t, h, w = x.shape
        if self.mode == "upsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            cur = feat_cache.get(idx)
            if cur is None:
                feat_cache[idx] = "Rep"
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and not isinstance(cur, str):
                    cache_x = torch.cat([cur[:, :, -1:], cache_x], dim=2)
                if isinstance(cur, str):
                    y = self.time_conv(x)
                else:
                    y = self.time_conv(x, cur)
                feat_cache[idx] = cache_x
                y = y.reshape(b, 2, c, t, h, w)
                y = torch.stack((y[:, 0], y[:, 1]), 3)
                x = y.reshape(b, c, t * 2, h, w)
                t = t * 2
            feat_idx[0] += 1
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and feat_cache is not None:
            idx = feat_idx[0]
            cur = feat_cache.get(idx)
            if cur is None:
                feat_cache[idx] = x.clone()
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.time_conv(torch.cat([cur[:, :, -1:], x], 2))
                feat_cache[idx] = cache_x
            feat_idx[0] += 1
        return x


class TMid(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resnets = torch.nn.ModuleList([TResBlock(dim, dim), TResBlock(dim, dim)])
        self.attentions = torch.nn.ModuleList([TAttn(dim)])

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = self.resnets[0](x, feat_cache, feat_idx)
        x = self.attentions[0](x)
        return self.resnets[1](x, feat_cache, feat_idx)


class TEncoder(torch.nn.Module):
    def __init__(self, base_dim, z_dim, dim_mult, num_res_blocks, temperal_downsample):
        super().__init__()
        dims = [base_dim * u for u in [1] + list(dim_mult)]
        self.conv_in = TCausalConv3d(3, dims[0])
        self.down_blocks = torch.nn.ModuleList()
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(num_res_blocks):
                self.down_blocks.append(TResBlock(cin, cout))
                cin = cout
            if i != len(dim_mult) - 1:
                mode = "downsample3d" if temperal_downsample[i] else "downsample2d"
                self.down_blocks.append(TResample(cout, mode))
        self.mid_block = TMid(dims[-1])
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv3d(dims[-1], 2 * z_dim)

    def forward(self, x, feat_cache=None, feat_idx=None):
        x = _tcc(self.conv_in, x, feat_cache, feat_idx)
        for blk in self.down_blocks:
            if isinstance(blk, (TResBlock, TResample)):
                x = blk(x, feat_cache, feat_idx)
            else:
                x = blk(x)
        x = self.mid_block(x, feat_cache, feat_idx)
        return _tcc(self.conv_out, F.silu(self.norm_out(x)), feat_cache, feat_idx)


class TUpBlock(torch.nn.Module):
    def __init__(self, cin, cout, n, mode):
        super().__init__()
        self.resnets = torch.nn.ModuleList()
        for _ in range(n):
            self.resnets.append(TResBlock(cin, cout))
            cin = cout
        self.upsamplers = torch.nn.ModuleList([TResample(cout, mode)]) if mode else None

    def forward(self, x, feat_cache=None, feat_idx=None):
        for r in self.resnets:
            x = r(x, feat_cache, feat_idx)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x, feat_cache, feat_idx)
        return x


class TDecoder(torch.nn.Module):
    def __init__(self, base_dim, z_dim, dim_mult, num_res_blocks, temperal_upsample):
        super().__init__()
        dims = [base_dim * u for u in [dim_mult[-1]] + list(reversed(dim_mult))]
        self.conv_in = TCausalConv3d(z_dim, dims[0])
        self.mid_block = TMid(dims[0])
        self.up_blocks = torch.nn.ModuleList()
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                cin = cin // 2
            mode = None
            if i != len(dim_mult) - 1:
                mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
            self.up_blocks.append(TUpBlock(cin, cout, num_res_blocks + 1, mode))
        self.norm_out = TRMS(dims[-1], images=False)
        self.conv_out = TCausalConv3d(dims[-1], 3)

    def forward(self, z, feat_cache=None, feat_idx=None):
        x = _tcc(self.conv_in, z, feat_cache, feat_idx)
        x = self.mid_block(x, feat_cache, feat_idx)
        for blk in self.up_blocks:
            x = blk(x, feat_cache, feat_idx)
        return _tcc(self.conv_out, F.silu(self.norm_out(x)), feat_cache, feat_idx)


class TWanVAE(torch.nn.Module):
    def __init__(self, base_dim=24, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                 temperal_downsample=(False, True)):
        super().__init__()
        self.encoder = TEncoder(base_dim, z_dim, dim_mult, num_res_blocks, temperal_downsample)
        self.quant_conv = TCausalConv3d(2 * z_dim, 2 * z_dim, (1, 1, 1))
        self.post_quant_conv = TCausalConv3d(z_dim, z_dim, (1, 1, 1))
        self.decoder = TDecoder(base_dim, z_dim, dim_mult, num_res_blocks,
                                tuple(reversed(temperal_downsample)))

    def encode_chunked(self, x):
        """diffusers AutoencoderKLWan._encode: first frame, then 4-frame
        chunks through a shared feature cache."""
        t = x.shape[2]
        cache, outs = {}, []
        for i in range(1 + (t - 1) // 4):
            idx = [0]
            chunk = x[:, :, :1] if i == 0 else x[:, :, 1 + 4 * (i - 1):1 + 4 * i]
            outs.append(self.encoder(chunk, cache, idx))
        return self.quant_conv(torch.cat(outs, dim=2))

    def decode_chunked(self, z):
        x = self.post_quant_conv(z)
        cache, outs = {}, []
        for i in range(x.shape[2]):
            idx = [0]
            outs.append(self.decoder(x[:, :, i:i + 1], cache, idx))
        return torch.cat(outs, dim=2).clamp(-1, 1)


CFG = dict(base_dim=24, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
           temperal_downsample=(False, True))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = TWanVAE(**CFG).eval()
    jmodel = AutoencoderKLWan(**CFG)
    missing, unexpected = _load(jmodel, tmodel.state_dict())
    assert missing == [], missing
    assert unexpected == [], unexpected
    return tmodel, jmodel


def _load(jmodel, sd):
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    params, missing, unexpected = convert_state_dict(sd, jmodel.params)
    jmodel.params = params
    return missing, unexpected


def test_wan_encode_parity_single_frame(pair):
    tmodel, jmodel = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 32, 32, 3), np.float32) * 0.5  # NTHWC
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCTHW
        moments_t = tmodel.quant_conv(tmodel.encoder(tx)).numpy()
    moments_j = np.asarray(jmodel._enc(jmodel.params, jnp.asarray(x)))
    np.testing.assert_allclose(
        moments_j, moments_t.transpose(0, 2, 3, 4, 1), rtol=2e-4, atol=2e-4)


def test_wan_decode_parity_single_frame(pair):
    tmodel, jmodel = pair
    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 1, 4, 4, CFG["z_dim"]), np.float32)
    with torch.no_grad():
        tz = torch.from_numpy(z.transpose(0, 4, 1, 2, 3))
        out_t = tmodel.decoder(tmodel.post_quant_conv(tz)).clamp(-1, 1).numpy()
    out_j = np.asarray(jmodel._dec(jmodel.params, jnp.asarray(z)))
    assert out_j.shape == (2, 1, 16, 16, 3)
    np.testing.assert_allclose(
        out_j, out_t.transpose(0, 2, 3, 4, 1), rtol=2e-4, atol=2e-4)


def test_wan_wrappers_protocol():
    from vqvae_from_gaussian_vae_tpu.models.third_party import (
        AutoencoderKLQwenImage, AutoencoderKLWAN)

    for cls in (AutoencoderKLQwenImage, AutoencoderKLWAN):
        wrapper = cls(base_dim=24, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                      temperal_downsample=(False,))
        x = jnp.zeros((1, 16, 16, 3))
        z, log = wrapper.encode(x, return_reg_log=True)
        assert z.shape == (1, 8, 8, 4)
        assert log == {}
        xhat = wrapper.decode(z)
        assert xhat.shape == (1, 16, 16, 3)
        assert float(jnp.max(jnp.abs(xhat))) <= 1.0


def test_wan_multiframe_shapes():
    # full-clip causal path: T=5 through one temporal stride-2 causal conv
    # (front pad 1, kernel 3) -> T' = (5+1-3)//2 + 1 = 2 latent frames; the
    # decoder's upsample3d doubles them back
    jmodel = AutoencoderKLWan(**CFG)
    x = jnp.zeros((1, 5, 16, 16, 3))
    post = jmodel.encode(x)
    assert post.mean.shape == (1, 2, 4, 4, CFG["z_dim"])
    y = jmodel.decode(post.mean)
    assert y.shape == (1, 4, 16, 16, 3)


def test_wan_chunked_multiframe_encode_parity(pair):
    """T = 1 + 4k clips through the chunk-exact streaming path must match
    the diffusers cache protocol frame-for-frame (first frame alone, 4-frame
    chunks, causal convs padding from the previous chunk's tail)."""
    tmodel, jmodel = pair
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 9, 16, 16, 3), np.float32) * 0.5
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        moments_t = tmodel.encode_chunked(tx).numpy()  # (B, 2z, T', h, w)
    post = jmodel.encode_chunked(jnp.asarray(x))
    mean_j = np.asarray(post.mean)
    z = CFG["z_dim"]
    assert mean_j.shape == (1, 5, 4, 4, z)  # T' = 1 + 2 + 2
    np.testing.assert_allclose(
        mean_j, moments_t[:, :z].transpose(0, 2, 3, 4, 1), rtol=3e-4, atol=3e-4)


def test_wan_chunked_multiframe_decode_parity(pair):
    tmodel, jmodel = pair
    rng = np.random.default_rng(8)
    z = rng.standard_normal((1, 3, 4, 4, CFG["z_dim"]), np.float32)
    with torch.no_grad():
        tz = torch.from_numpy(z.transpose(0, 4, 1, 2, 3))
        out_t = tmodel.decode_chunked(tz).numpy()
    out_j = np.asarray(jmodel.decode_chunked(jnp.asarray(z)))
    assert out_j.shape[1] == out_t.shape[2]
    np.testing.assert_allclose(
        out_j, out_t.transpose(0, 2, 3, 4, 1), rtol=3e-4, atol=3e-4)


CFG2 = dict(base_dim=16, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
            temperal_downsample=(True, True))


@pytest.fixture(scope="module")
def pair2():
    """Two temporal down/upsamples: the second decoder upsample3d sees t=2
    chunks, exercising the frame interleave and the 2-frame cache depth
    (a single-temporal config keeps t=1 everywhere and cannot)."""
    torch.manual_seed(1)
    tmodel = TWanVAE(**CFG2).eval()
    jmodel = AutoencoderKLWan(**CFG2)
    missing, unexpected = _load(jmodel, tmodel.state_dict())
    assert missing == [] and unexpected == []
    return tmodel, jmodel


def test_wan_chunked_two_temporal_stages_encode(pair2):
    tmodel, jmodel = pair2
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 9, 16, 16, 3), np.float32) * 0.5
    with torch.no_grad():
        moments_t = tmodel.encode_chunked(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    mean_j = np.asarray(jmodel.encode_chunked(jnp.asarray(x)).mean)
    z = CFG2["z_dim"]
    assert mean_j.shape == (1, 3, 4, 4, z)  # T' = 1 + 1 + 1
    np.testing.assert_allclose(
        mean_j, moments_t[:, :z].transpose(0, 2, 3, 4, 1), rtol=3e-4, atol=3e-4)


def test_wan_chunked_two_temporal_stages_decode(pair2):
    tmodel, jmodel = pair2
    rng = np.random.default_rng(10)
    z = rng.standard_normal((1, 3, 4, 4, CFG2["z_dim"]), np.float32)
    with torch.no_grad():
        out_t = tmodel.decode_chunked(
            torch.from_numpy(z.transpose(0, 4, 1, 2, 3))).numpy()
    out_j = np.asarray(jmodel.decode_chunked(jnp.asarray(z)))
    assert out_j.shape == (1, 9, 16, 16, 3)  # 1 + 4 + 4 frames
    np.testing.assert_allclose(
        out_j, out_t.transpose(0, 2, 3, 4, 1), rtol=5e-4, atol=5e-4)
