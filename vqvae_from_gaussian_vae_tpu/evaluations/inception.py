"""InceptionV3 feature extractor for FID, in flax
(`/root/reference/pit/evaluations/fid/inception.py`, itself the pytorch-fid
port of torchvision inception_v3 with the FID-specific pooling tweaks:
InceptionA/C and the first InceptionE use count_include_pad=False average
pooling; the second InceptionE uses max pooling in its pool branch).

NHWC throughout; BasicConv2d = bias-free conv + BatchNorm(eps=1e-3, eval
stats) + ReLU.  Module names mirror the torch tree
(Mixed_5b.branch1x1.conv.weight -> Mixed_5b/branch1x1/conv/kernel) so the
pt_inception-2015-12-05 checkpoint converts mechanically when supplied
(`fid/inception.py:13` URL; this image has no egress, so tests run with
random weights - FID math is weight-agnostic, rFID parity needs the asset).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

DEFAULT_BLOCK_INDEX = 3
BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}


def _avg_pool_no_pad(x, window: int = 3):
    """3x3 stride-1 avg pool, count_include_pad=False."""
    ones = jnp.ones_like(x[..., :1])
    dims, strides = (1, window, window, 1), (1, 1, 1, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pad)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pad)
    return s / n


def _max_pool(x, window=3, stride=2, pad="VALID"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        pad if isinstance(pad, str) else ((0, 0),) + tuple(pad) + ((0, 0),),
    )


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple):
            pad = [pad[0], pad[1]] if isinstance(pad[0], tuple) else [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(self.out_channels, self.kernel, strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # FID: first E uses avg (no pad count), second max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_no_pad(x)
        else:
            bp = _max_pool(x, 3, 1, pad=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature trunk up to the 2048-d pool (`fid/inception.py:16-37`).

    resize_input: bilinear resize to 299x299 first.  normalize_input: map
    [0,1] -> [-1,1] (the reference eval passes normalize_input=False and
    feeds [-1,1] images directly, `eval.py:118`).
    """

    output_blocks: Tuple[int, ...] = (DEFAULT_BLOCK_INDEX,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        outputs = {}
        last = max(self.output_blocks)
        if self.resize_input:
            # pytorch-fid uses F.interpolate(bilinear) without antialiasing
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), "bilinear", antialias=False
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        # block 0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        outputs[0] = x
        if last >= 1:
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = _max_pool(x, 3, 2)
            outputs[1] = x
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outputs[2] = x
        if last >= 3:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg pool
            outputs[3] = x
        return [outputs[i] for i in self.output_blocks]


InceptionV3.BLOCK_INDEX_BY_DIM = BLOCK_INDEX_BY_DIM


def load_inception_weights(params_template, pth_path: str):
    """Convert the pytorch-fid pt_inception checkpoint onto the template."""
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if not k.startswith(("AuxLogits", "fc"))}
    # BN buffers: running_mean/var -> flax batch_stats live in a separate
    # collection; here we fold them into the 'batch_stats' tree
    params_sd = {k: v for k, v in sd.items() if "running_" not in k and "num_batches" not in k}
    stats_sd = {k: v for k, v in sd.items() if "running_" in k}
    params, missing, unexpected = convert_state_dict(params_sd, params_template["params"])
    stats_sd = {
        k.replace("running_mean", "mean").replace("running_var", "var"): v
        for k, v in stats_sd.items()
    }
    stats, s_missing, s_unexpected = convert_state_dict(stats_sd, params_template["batch_stats"])
    return (
        {"params": params, "batch_stats": stats},
        missing + s_missing,
        unexpected + s_unexpected,
    )
