"""Loss-stack tests: ActNorm/discriminator parity vs the reference torch
implementations, LPIPS structure/behaviour, and the full loss head."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vqvae_from_gaussian_vae_tpu.losses.discriminator import (
    ActNorm,
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
)
from vqvae_from_gaussian_vae_tpu.losses.discriminator_loss import GeneralLPIPSWithDiscriminator
from vqvae_from_gaussian_vae_tpu.losses.lpips import LPIPS
from vqvae_from_gaussian_vae_tpu.utils.torch_convert import convert_state_dict

RNG = {"params": jax.random.PRNGKey(0)}


def test_actnorm_init_and_forward_match_torch():
    from pit.modules.lpips.util import ActNorm as TActNorm

    x = np.random.default_rng(0).standard_normal((4, 6, 6, 8)).astype(np.float32) * 3 + 1
    tmod = TActNorm(8).train()
    with torch.no_grad():
        tout = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jmod = ActNorm(8)
    variables = jmod.init(RNG, jnp.asarray(x))  # data-dependent init
    jout = jmod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_discriminator_parity_with_torch():
    from pit.modules.lpips.model.model import NLayerDiscriminator as TDisc

    torch.manual_seed(0)
    tmod = TDisc(input_nc=3, ndf=16, n_layers=3, use_actnorm=True).train()
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        tout = tmod(xt)  # first call also initialises torch ActNorms

    jmod = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3, use_actnorm=True)
    variables = jmod.init(RNG, jnp.asarray(x))
    params, missing, unexpected = convert_state_dict(
        {k: v for k, v in tmod.state_dict().items() if "initialized" not in k},
        variables["params"],
    )
    assert not missing and not unexpected, (missing, unexpected)
    jout = jmod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1), atol=1e-3, rtol=1e-3
    )


def test_gan_loss_functions():
    lr = jnp.asarray(np.random.default_rng(2).standard_normal((4, 5)), jnp.float32)
    lf = jnp.asarray(np.random.default_rng(3).standard_normal((4, 5)), jnp.float32)
    h = float(hinge_d_loss(lr, lf))
    expect = 0.5 * (np.maximum(0, 1 - np.asarray(lr)).mean() + np.maximum(0, 1 + np.asarray(lf)).mean())
    np.testing.assert_allclose(h, expect, rtol=1e-6)
    v = float(vanilla_d_loss(lr, lf))
    expect_v = 0.5 * (
        np.log1p(np.exp(-np.asarray(lr))).mean() + np.log1p(np.exp(np.asarray(lf))).mean()
    )
    np.testing.assert_allclose(v, expect_v, rtol=1e-5)


def test_lpips_basic_properties():
    mod = LPIPS()
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    variables = mod.init(RNG, x, y)
    # identical inputs -> exactly zero distance
    zero = mod.apply(variables, x, x)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-7)
    d = mod.apply(variables, x, y)
    assert d.shape == (2, 1, 1, 1)
    # vgg16 trunk has the torchvision layout: 13 convs
    convs = [k for k in variables["params"]["net"] if k.startswith("features_")]
    assert len(convs) == 13
    lins = [k for k in variables["params"] if k.startswith("lin")]
    assert len(lins) == 5


def _loss_module():
    return GeneralLPIPSWithDiscriminator(
        disc_start=10,
        disc_weight=0.75,
        learn_logvar=True,
        perceptual_weight=1.0,
        regularization_weights={"kl_loss": 0.1},
        additional_log_keys=["bits-mean"],
        discriminator_config={
            "target": "vqvae_from_gaussian_vae_tpu.losses.discriminator.NLayerDiscriminator",
            "params": {"input_nc": 3, "ndf": 16, "n_layers": 3, "use_actnorm": True},
        },
    )


def test_loss_head_both_phases():
    loss = _loss_module()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    xr = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    variables = loss.init(RNG, x, xr, method="init_all")
    reg_log = {"kl_loss": jnp.float32(3.0), "bits-mean": jnp.float32(15.9)}

    # phase 0 pre-disc-start (train): g term must be zeroed
    l0, log0 = loss.apply(
        variables, x, xr, regularization_log=reg_log, optimizer_idx=0,
        global_step=0, train=True, d_weight=jnp.float32(123.0),
    )
    assert float(log0["train/scalars/d_weight"]) == 0.0
    assert "train/kl_loss" in log0 and "train/bits-mean" in log0
    # the 0.1-weighted kl term is included
    nll, weighted = loss.apply(variables, x, xr, method="nll_from_images")
    np.testing.assert_allclose(float(l0), float(weighted) + 0.1 * 3.0, rtol=1e-5)

    # phase 0 post-disc-start (train): supplied d_weight applies
    l0b, log0b = loss.apply(
        variables, x, xr, regularization_log=reg_log, optimizer_idx=0,
        global_step=11, train=True, d_weight=jnp.float32(2.0),
    )
    g = float(log0b["train/loss/g"])
    np.testing.assert_allclose(float(l0b), float(weighted) + 0.1 * 3.0 + 2.0 * g, rtol=1e-5)

    # eval defaults d_weight to 1.0 (discriminator_loss.py:283-284)
    _, log_eval = loss.apply(
        variables, x, xr, regularization_log=reg_log, optimizer_idx=0,
        global_step=0, split="val", train=False,
    )
    assert float(log_eval["val/scalars/d_weight"]) == 1.0

    # phase 1: hinge disc loss, gated by step
    l1, log1 = loss.apply(
        variables, x, xr, regularization_log=reg_log, optimizer_idx=1,
        global_step=0, train=True,
    )
    assert float(l1) == 0.0
    l1b, _ = loss.apply(
        variables, x, xr, regularization_log=reg_log, optimizer_idx=1,
        global_step=11, train=True,
    )
    assert float(l1b) > 0.0


def test_loss_dtype_knob_keeps_params_fp32():
    """bf16 compute in the loss head (the bf16_compute overlay) must not
    change parameter dtypes, and the custom disc config inherits the knob
    when it doesn't set its own."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config

    cfg = {
        "target": "vqvae_from_gaussian_vae_tpu.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
        "params": {
            "disc_start": 0,
            "dtype": "bfloat16",
            "discriminator_config": {
                "target": "vqvae_from_gaussian_vae_tpu.losses.discriminator.NLayerDiscriminator",
                "params": {"input_nc": 3, "ndf": 8, "n_layers": 2, "use_actnorm": True},
            },
        },
    }
    m = instantiate_from_config(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, x * 0.9, method="init_all")
    assert {str(l.dtype) for l in jax.tree.leaves(v["params"])} == {"float32"}
    loss, _ = m.apply(v, x, x * 0.9, regularization_log={}, optimizer_idx=0,
                      global_step=5, train=True, d_weight=jnp.float32(0.5))
    assert np.isfinite(float(loss))


def test_visualize_disc_logits_zero_size_logit_map():
    """An n_layers-deep PatchGAN on a small image can collapse the logit map
    to zero spatial size (seen with the production n_layers=6 disc at 128px);
    the visualizer must return {} instead of crashing on np.abs(lr).max()."""
    import jax
    from vqvae_from_gaussian_vae_tpu.losses.discriminator_loss import visualize_disc_logits

    loss = GeneralLPIPSWithDiscriminator(
        disc_start=0,
        discriminator_config={
            "target": "vqvae_from_gaussian_vae_tpu.losses.discriminator.NLayerDiscriminator",
            "params": {"input_nc": 3, "ndf": 8, "n_layers": 6, "use_actnorm": True},
        },
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)), jnp.float32)
    variables = loss.init(RNG, x, x, method="init_all")
    lr, lf = loss.apply(variables, x, x, method="disc_logits")
    assert lr.size == 0  # precondition: the map really is empty at this depth
    out = visualize_disc_logits(loss, variables["params"], x, x)
    assert out == {}
