"""Numerical parity of the JAX UNet backbone against the reference torch
implementation (random weights, converted via utils.torch_convert)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vqvae_from_gaussian_vae_tpu.models.unet import Decoder, Encoder
from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

SMALL = dict(
    attn_type="vanilla",
    double_z=True,
    z_channels=8,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=2,
    attn_resolutions=[16],
    dropout=0.0,
)


def _torch_modules():
    from pit.modules.unet import Decoder as TDecoder
    from pit.modules.unet import Encoder as TEncoder

    torch.manual_seed(0)
    return TEncoder(**SMALL).eval(), TDecoder(**SMALL).eval()


def test_encoder_parity():
    tenc, _ = _torch_modules()
    jenc = Encoder(**SMALL)
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)

    template = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params, missing, unexpected = convert_state_dict(tenc.state_dict(), template)
    assert not missing, missing
    assert not unexpected, unexpected

    jout = jenc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tout = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-4
    )


def test_decoder_parity():
    _, tdec = _torch_modules()
    jdec = Decoder(**SMALL)
    z = np.random.default_rng(1).standard_normal((2, 16, 16, 8)).astype(np.float32)

    template = jdec.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    params, missing, unexpected = convert_state_dict(tdec.state_dict(), template)
    assert not missing, missing
    assert not unexpected, unexpected

    jout = jdec.apply({"params": params}, jnp.asarray(z))
    with torch.no_grad():
        tout = tdec(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-4
    )


def test_decoder_pre_last_layer_consistency():
    """pre_last_layer + conv_out must equal the full decoder forward."""
    jdec = Decoder(**SMALL)
    z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 16, 8)), jnp.float32)
    variables = jdec.init(jax.random.PRNGKey(0), z)
    full = jdec.apply(variables, z)
    pre = jdec.apply(variables, z, method="pre_last_layer")
    w = variables["params"]["conv_out"]["kernel"]
    b = variables["params"]["conv_out"]["bias"]
    manual = jax.lax.conv_general_dilated(
        pre, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(np.asarray(full), np.asarray(manual), atol=1e-5)
