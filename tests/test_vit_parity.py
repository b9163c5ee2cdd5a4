"""Numerical parity of the JAX ViT backbone against the reference torch
implementation.  The reference imports timm, which is absent from this
image; a minimal stub provides the three symbols it uses."""

import sys
import types

import numpy as np
import pytest
import torch


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        # transformers probes deps via importlib.util.find_spec; a None
        # __spec__ raises there, so give stubs a real-looking spec
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    timm = _mod("timm")
    models = _mod("timm.models")
    layers = _mod("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0):
        return torch.nn.init.trunc_normal_(tensor, std=std)

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


_install_timm_stub()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqvae_from_gaussian_vae_tpu.models.vit import (  # noqa: E402
    TransformerDecoder,
    TransformerEncoder,
    get_attention_mask,
)
from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

SMALL = dict(
    double_z=True,
    z_channels=8,
    image_size=32,
    patch_size=8,
    width=64,
    layers=2,
    heads=4,
    mlp_ratio=4,
    drop_rate=0.0,
)


def test_encoder_parity():
    from pit.modules.vit import TransformerEncoder as TEncoder

    torch.manual_seed(0)
    tenc = TEncoder(**SMALL).eval()
    jenc = TransformerEncoder(**SMALL)
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)

    template = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params, missing, unexpected = convert_state_dict(tenc.state_dict(), template)
    assert not missing, missing
    assert not unexpected, unexpected

    jout = jenc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tout = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=2e-4, rtol=1e-3)


def test_decoder_parity():
    from pit.modules.vit import TransformerDecoder as TDecoder

    torch.manual_seed(1)
    tdec = TDecoder(**SMALL).eval()
    jdec = TransformerDecoder(**SMALL)
    z = np.random.default_rng(1).standard_normal((2, 16, 8)).astype(np.float32)

    template = jdec.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    params, missing, unexpected = convert_state_dict(tdec.state_dict(), template)
    assert not missing, missing
    assert not unexpected, unexpected

    jout = jdec.apply({"params": params}, jnp.asarray(z))
    with torch.no_grad():
        tout = tdec(torch.from_numpy(z))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("mask_type", ["causal", "block-causal"])
def test_attention_masks_match_torch(mask_type):
    from pit.modules.vit import get_attention_mask as torch_mask

    jm = np.asarray(get_attention_mask(16, mask_type, block_size=4))
    tm = torch_mask(16, torch.device("cpu"), mask_type=mask_type, block_size=4)
    if mask_type == "causal":
        np.testing.assert_array_equal(jm, tm.numpy())
    else:
        # torch returns a bool disable mask; ours is additive -inf
        np.testing.assert_array_equal(np.isneginf(jm), tm.numpy())
