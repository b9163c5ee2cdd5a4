"""Frozen foundation-model feature extractors for the vf alignment branch
(`/root/reference/pit/models/foundation_models.py`).

The reference pulls MAE / DINOv2 / DINOv3 ViT-L trunks from timm and exposes
a (B, C, h, w) patch-feature map plus ``feature_dim``.  This environment has
no egress/timm, so the trunk is implemented here (standard ViT with cls
token, conv patch embed, optional LayerScale - the DINOv2/MAE ViT-L layout)
with a converter hook for timm/torch state_dicts; without weights it runs
seeded-random and frozen, which keeps the training plumbing exercised while
absolute alignment quality awaits the asset.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models.vit import ResidualAttentionBlock

_SPECS = {
    # name: (patch, width, layers, heads, ls_init)
    "mae": (16, 1024, 24, 16, None),
    "dinov2": (14, 1024, 24, 16, 1e-5),
    "dinov3": (16, 1024, 24, 16, 1e-5),
}


class FoundationViT(nn.Module):
    """ViT-L trunk emitting the patch-token grid (B, h, w, width)."""

    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    ls_init_value: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, _ = x.shape
        gh, gw = hh // self.patch_size, ww // self.patch_size
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, self.width)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.width))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, gh * gw + 1, self.width)
        )
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1) + pos
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                d_model=self.width,
                n_head=self.heads,
                ls_init_value=self.ls_init_value,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        patches = x[:, 1:, :]
        return patches.reshape(b, gh, gw, self.width)


class aux_foundation_model:
    """(`foundation_models.py:46-88`): name -> frozen extractor with
    ``feature_dim``; callable on NHWC [-1, 1] images."""

    def __init__(self, name: str, weights_path: Optional[str] = None, seed: int = 0):
        assert name in _SPECS, f"unknown foundation model {name}"
        patch, width, layers, heads, ls = _SPECS[name]
        self.name = name
        self.feature_dim = width
        self.patch_size = patch
        self.module = FoundationViT(
            patch_size=patch, width=width, layers=layers, heads=heads, ls_init_value=ls
        )
        self.params = None
        self._seed = seed
        self._weights_path = weights_path

    def init_params(self, example):
        variables = self.module.init({"params": jax.random.PRNGKey(self._seed)}, example)
        self.params = variables["params"]
        if self._weights_path:
            from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict
            import torch

            sd = torch.load(self._weights_path, map_location="cpu", weights_only=False)
            self.params, missing, unexpected = convert_state_dict(sd, self.params)
            if missing:
                print(f"foundation model missing keys: {missing[:5]}...")
        else:
            print(
                f"WARNING: {self.name} foundation model running with random "
                f"frozen weights (no pretrained asset in this environment)"
            )
        return self.params


class DINOEncoder(aux_foundation_model):
    """(`foundation_models.py:91-116`)."""

    def __init__(self, weights_path: Optional[str] = None):
        super().__init__("dinov2", weights_path=weights_path)
