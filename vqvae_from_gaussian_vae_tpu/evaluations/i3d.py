"""I3D (Inflated 3D Inception) video feature extractor for FVD, in flax.

The reference computes FVD from the 400-d logits of an I3D torchscript model
downloaded from dropbox (`/root/reference/pit/evaluations/fvd/fvd_score.py:10-19`,
called with ``rescale=False, resize=False, return_features=True``).  That
torchscript wraps the canonical Kinetics-400 I3D — GoogLeNet inflated to 3D
(Carreira & Zisserman, "Quo Vadis") — in the pytorch-i3d layout: ``Unit3D`` =
bias-free Conv3d + BatchNorm3d(eps=1e-3) + ReLU with TF-SAME padding, Inception
branches named ``b0 / b1a / b1b / b2a / b2b / b3b``, trunk stages
``Conv3d_1a_7x7 .. Mixed_5c`` and a bias-only 1x1x1 ``logits`` head.

TPU-first: NTHWC layout throughout (videos are (N, T, H, W, C)), flax ``SAME``
padding (identical to TF SAME, which pytorch-i3d re-implements by hand), eval
BatchNorm via running stats.  Module names mirror the torch tree so the
torchscript's state_dict converts mechanically via ``load_i3d_weights`` when
the asset is supplied (no egress in this image; tests run a torch oracle with
random weights instead).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _max_pool_3d(x, window: Tuple[int, int, int], stride: Tuple[int, int, int]):
    """TF-SAME max pool over (T, H, W) of an NTHWC tensor (pytorch-i3d
    MaxPool3dSamePadding)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + tuple(window) + (1,),
        (1,) + tuple(stride) + (1,),
        "SAME",
    )


class Unit3D(nn.Module):
    """Conv3d(no bias) + BatchNorm3d(eps=1e-3, eval stats) + ReLU.

    The logits head disables bn/activation and enables the bias
    (pytorch-i3d ``Unit3D(..., activation_fn=None, use_batch_norm=False,
    use_bias=True)``).
    """

    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride, padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype, name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=jnp.float32, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    """Four-branch inflated Inception block: 1x1 | 1x1->3x3 | 1x1->3x3 |
    maxpool->1x1, concatenated on channels."""

    channels: Tuple[int, int, int, int, int, int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], (1, 1, 1), dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(c[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(c[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = _max_pool_3d(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (b0, b1a, b1b, b2a, b2b, b3b) per Mixed stage — inflated GoogLeNet.
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),      # in 192  -> 256
    "Mixed_3c": (128, 128, 192, 32, 96, 64),    # in 256  -> 480
    "Mixed_4b": (192, 96, 208, 16, 48, 64),     # in 480  -> 512
    "Mixed_4c": (160, 112, 224, 24, 64, 64),    # in 512  -> 512
    "Mixed_4d": (128, 128, 256, 24, 64, 64),    # in 512  -> 512
    "Mixed_4e": (112, 144, 288, 32, 64, 64),    # in 512  -> 528
    "Mixed_4f": (256, 160, 320, 32, 128, 128),  # in 528  -> 832
    "Mixed_5b": (256, 160, 320, 32, 128, 128),  # in 832  -> 832
    "Mixed_5c": (384, 192, 384, 48, 128, 128),  # in 832  -> 1024
}


class InceptionI3d(nn.Module):
    """Kinetics-400 I3D; returns per-video 400-d pre-softmax logits, the FVD
    feature the reference's detector emits with ``return_features=True``.

    Input: (N, T, H, W, C) videos.  ``rescale`` maps [0, 255] -> [-1, 1];
    ``resize`` bilinear-resizes frames to 224x224 — both default off to match
    the reference's detector kwargs (`fvd_score.py:24-26`), so callers feed
    224x224 frames already in [-1, 1].
    """

    num_classes: int = 400
    rescale: bool = False
    resize: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, h, w, c = x.shape
        if self.resize and (h, w) != (224, 224):
            x = jax.image.resize(x, (n, t, 224, 224, c), "bilinear", antialias=False)
        if self.rescale:
            x = x * (2.0 / 255.0) - 1.0
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype, name="Conv3d_1a_7x7")(x)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a_3x3
        x = Unit3D(64, (1, 1, 1), dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a_3x3
        x = InceptionModule(_MIXED["Mixed_3b"], dtype=self.dtype, name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], dtype=self.dtype, name="Mixed_3c")(x)
        x = _max_pool_3d(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a_3x3
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[name], dtype=self.dtype, name=name)(x)
        x = _max_pool_3d(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a_2x2
        x = InceptionModule(_MIXED["Mixed_5b"], dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], dtype=self.dtype, name="Mixed_5c")(x)
        # avg_pool (2, 7, 7) stride 1, VALID — then the 1x1x1 logits conv and
        # a mean over the remaining time steps (pytorch-i3d forward)
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), "VALID",
        ) / (2 * 7 * 7)
        x = Unit3D(self.num_classes, (1, 1, 1), use_bn=False, use_relu=False,
                   use_bias=True, dtype=self.dtype, name="logits")(x)
        return jnp.mean(x, axis=(1, 2, 3))  # (N, num_classes)


def load_i3d_weights(params_template, state_dict):
    """Convert a pytorch-i3d style state_dict (e.g. the torchscript FVD
    detector's) onto the flax template: Conv3d OIDHW -> DHWIO, bn
    weight/bias -> scale/bias, running stats -> batch_stats."""
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    sd = {}
    for k, v in state_dict.items():
        v = v.numpy() if hasattr(v, "numpy") else v
        sd[k.removeprefix("module.").removeprefix("i3d.")] = v
    params_sd = {k: v for k, v in sd.items()
                 if "running_" not in k and "num_batches" not in k}
    stats_sd = {
        k.replace("running_mean", "mean").replace("running_var", "var"): v
        for k, v in sd.items() if "running_" in k
    }
    params, missing, unexpected = convert_state_dict(params_sd, params_template["params"])
    stats, s_missing, s_unexpected = convert_state_dict(stats_sd, params_template["batch_stats"])
    return (
        {"params": params, "batch_stats": stats},
        missing + s_missing,
        unexpected + s_unexpected,
    )


def make_i3d_feature_fn(variables=None, rng_seed: int = 0,
                        resize: bool = False):
    """Build an FVD ``feature_fn``: (N, T, H, W, C) in [-1, 1] -> (N, 400)
    numpy.  ``resize=True`` bilinear-resizes frames to 224x224 (required for
    inputs below 224).  Without ``variables`` the net runs at random init
    (loud print), which still exercises the full FVD pipeline."""
    import numpy as np

    model = InceptionI3d(resize=resize)
    if variables is None:
        print("WARNING: I3D running with RANDOM weights (no i3d asset supplied); "
              "FVD values are not comparable to the reference.")
        variables = model.init(jax.random.PRNGKey(rng_seed),
                               jnp.zeros((1, 9, 224, 224, 3)))
    apply = jax.jit(lambda v: model.apply(variables, v))

    def feature_fn(videos):
        return np.asarray(apply(jnp.asarray(videos, jnp.float32)))

    return feature_fn
