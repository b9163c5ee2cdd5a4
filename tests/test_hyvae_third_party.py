"""HunyuanVAE2D + frozen third-party wrapper tests.

The reference hyvae imports diffusers (absent here); a minimal stub provides
the mixins it touches so its math is usable as a parity oracle."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch

    diffusers = types.ModuleType("diffusers")
    cfg_utils = types.ModuleType("diffusers.configuration_utils")
    model_out = types.ModuleType("diffusers.models.modeling_outputs")
    model_utils = types.ModuleType("diffusers.models.modeling_utils")
    utils = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")
    models = types.ModuleType("diffusers.models")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    class ModelMixin(torch.nn.Module):
        pass

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__.update(kw)

    class AutoencoderKLOutput(BaseOutput):
        pass

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(*shape, generator=generator, dtype=dtype)

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config
    model_out.AutoencoderKLOutput = AutoencoderKLOutput
    model_utils.ModelMixin = ModelMixin
    utils.BaseOutput = BaseOutput
    torch_utils.randn_tensor = randn_tensor
    utils.torch_utils = torch_utils
    models.modeling_outputs = model_out
    models.modeling_utils = model_utils
    diffusers.configuration_utils = cfg_utils
    diffusers.models = models
    diffusers.utils = utils
    for name, mod in {
        "diffusers": diffusers,
        "diffusers.configuration_utils": cfg_utils,
        "diffusers.models": models,
        "diffusers.models.modeling_outputs": model_out,
        "diffusers.models.modeling_utils": model_utils,
        "diffusers.utils": utils,
        "diffusers.utils.torch_utils": torch_utils,
    }.items():
        sys.modules[name] = mod


_install_diffusers_stub()

from vqvae_from_gaussian_vae_tpu.models.hyvae import (
    DiagonalGaussianDistribution,
    HunyuanVAE2D,
)


def test_diagonal_gaussian_matches_torch_reference():
    import torch
    from pit.models.hyvae import DiagonalGaussianDistribution as TDist

    rng = np.random.default_rng(0)
    params = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    jd = DiagonalGaussianDistribution(jnp.asarray(params))
    # torch chunks on dim=1 (NCHW); ours on -1 (NHWC)
    td = TDist(torch.from_numpy(params.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(jd.kl()), td.kl().numpy(), rtol=1e-5)
    sample = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jd.nll(jnp.asarray(sample))),
        td.nll(torch.from_numpy(sample.transpose(0, 3, 1, 2))).numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jd.mode()), params[..., :4], atol=0
    )


def test_hyvae_roundtrip_shapes_and_resampling_parity():
    """Full tiny HunyuanVAE2D forward + pixel(un)shuffle shortcut parity
    against the reference Downsample/Upsample blocks."""
    import torch
    from pit.models.hyvae import Downsample as TDown, Upsample as TUp

    from vqvae_from_gaussian_vae_tpu.models.hyvae import Downsample, Upsample
    from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

    torch.manual_seed(0)
    tdown = TDown(32, 64).eval()
    x = np.random.default_rng(1).standard_normal((2, 8, 8, 32)).astype(np.float32)
    jdown = Downsample(32, 64)
    template = jdown.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params, missing, unexpected = convert_state_dict(tdown.state_dict(), template)
    assert not missing and not unexpected
    jout = jdown.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tout = tdown(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )

    tup = TUp(64, 32).eval()
    z = np.random.default_rng(2).standard_normal((2, 4, 4, 64)).astype(np.float32)
    jup = Upsample(64, 32)
    template = jup.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    params, missing, unexpected = convert_state_dict(tup.state_dict(), template)
    assert not missing and not unexpected
    jout = jup.apply({"params": params}, jnp.asarray(z))
    with torch.no_grad():
        tout = tup(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_hyvae_full_model_roundtrip():
    vae = HunyuanVAE2D(
        block_out_channels=[32, 64],
        latent_channels=4,
        layers_per_block=1,
        ffactor_spatial=2,
        sample_size=32,
    )
    vae.init_params(sample_size=16)
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    posterior = vae.encode(x)
    assert posterior.mean.shape == (2, 8, 8, 4)
    xhat = vae.decode(posterior.mode())
    assert xhat.shape == x.shape
    out = vae(x, sample_posterior=True)
    assert out.shape == x.shape
    # slicing path gives identical results
    vae.use_slicing = True
    xhat2 = vae.decode(posterior.mode())
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(xhat2), atol=1e-5)


def test_third_party_wrappers():
    from vqvae_from_gaussian_vae_tpu.models.third_party import (
        AutoencoderKLDiffusers,
        AutoencoderKLQwenImage,
    )

    vae = AutoencoderKLDiffusers(latent_channels=4, ch=32, ch_mult=[1, 2], resolution=32,
                                 scaling_factor=0.5, shift_factor=0.1)
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    z, log = vae.encode(x)
    assert z.shape == (1, 16, 16, 4) and log == {}
    xhat = vae.decode(z)
    assert xhat.shape == x.shape

    # Qwen/WAN wrappers are real now (models/wan.py); full protocol + torch
    # parity live in tests/test_wan.py — here just the tiny-config protocol
    qwen = AutoencoderKLQwenImage(base_dim=8, z_dim=4, dim_mult=(1, 2),
                                  num_res_blocks=1, temperal_downsample=(False,))
    zq, logq = qwen.encode(x)
    assert zq.shape == (1, 16, 16, 4) and logq == {}
    assert qwen.decode(zq).shape == x.shape
