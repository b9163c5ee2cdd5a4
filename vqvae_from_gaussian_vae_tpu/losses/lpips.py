"""LPIPS perceptual loss on a VGG16 trunk, in flax
(`/root/reference/pit/modules/lpips/loss/lpips.py`).

Five feature taps (relu1_2/2_2/3_3/4_3/5_3), per-tap channel-unit-normalise,
squared diff, learned 1x1 reweighting (NetLinLayer), spatial mean, sum.

Weights: the reference auto-downloads torchvision's VGG16 + the LPIPS linear
heads (`lpips/util.py:34-42`); this environment has no egress, so
`load_lpips_weights` converts a user-supplied .pth and tests run with seeded
random weights (the math is weight-agnostic).  VGG conv names mirror
torchvision's ``features.N`` indices for mechanical conversion.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16.features conv indices and channel widths
_VGG_CFG: Tuple[Tuple[int, int], ...] = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
# maxpool sits before these conv indices
_POOL_BEFORE = {5, 10, 17, 24}
# slice boundaries: outputs after the relu of these conv indices
_TAPS = (2, 7, 14, 21, 28)
CHNS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """torchvision-layout VGG16 trunk emitting the five LPIPS taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        for idx, width in _VGG_CFG:
            if idx in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(width, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"features_{idx}")(x)
            x = nn.relu(x)
            if idx in _TAPS:
                taps.append(x)
        return taps


class NetLinLayer(nn.Module):
    """1x1 conv reweighting head (`lpips.py:82-97`); dropout is identity in
    the frozen eval-mode loss.  Named ``model_1`` to match the torch
    Sequential(Dropout, Conv) indexing."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(1, (1, 1), use_bias=False, name="model_1")(x)


def _normalize_tensor(x, eps: float = 1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """(`lpips.py:12-65`); NHWC inputs in [-1, 1]; returns (B, 1, 1, 1)."""

    dtype: Any = jnp.float32

    def setup(self):
        self.scaling_shift = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
        self.scaling_scale = jnp.array([0.458, 0.448, 0.450], jnp.float32)
        self.net = VGG16Features(dtype=self.dtype)
        self.lin0 = NetLinLayer()
        self.lin1 = NetLinLayer()
        self.lin2 = NetLinLayer()
        self.lin3 = NetLinLayer()
        self.lin4 = NetLinLayer()

    def __call__(self, input, target):
        lins = (self.lin0, self.lin1, self.lin2, self.lin3, self.lin4)
        in0 = (input - self.scaling_shift) / self.scaling_scale
        in1 = (target - self.scaling_shift) / self.scaling_scale
        outs0 = self.net(in0)
        outs1 = self.net(in1)
        val = None
        for tap0, tap1, lin in zip(outs0, outs1, lins):
            diff = (_normalize_tensor(tap0) - _normalize_tensor(tap1)) ** 2
            res = jnp.mean(lin(diff), axis=(1, 2), keepdims=True)
            val = res if val is None else val + res
        return val


def load_lpips_weights(params_template, vgg_pth=None, state_dict=None):
    """Convert the reference's combined LPIPS checkpoint onto the template.

    Handles the actual vgg.pth layout (`lpips/util.py:9` heibox asset, the
    full torch-LPIPS state_dict): ``lin{k}.model.1.weight`` heads,
    ``net.slice{s}.{n}.weight|bias`` VGG convs — the slice submodules keep
    torchvision's *global* ``features`` indices (`lpips.py:100-118`), so
    ``net.slice3.12`` maps to our ``net/features_12`` — and the
    ``scaling_layer.shift/scale`` buffers (fixed constants here, verified
    then dropped).  Raw torchvision vgg16 ``features.N.*`` keys also work.
    """
    import re as _re

    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    if state_dict is None:
        if vgg_pth is None:
            return params_template, ["no weights supplied"], []
        import torch

        state_dict = torch.load(vgg_pth, map_location="cpu", weights_only=False)

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("scaling_layer."):
            continue  # constants baked into LPIPS.setup (identical values)
        k = _re.sub(r"^net\.slice\d+\.(\d+)\.", r"net.features.\1.", k)
        k = _re.sub(r"^features\.(\d+)\.", r"net.features.\1.", k)
        sd[k] = v
    return convert_state_dict(sd, params_template)
