"""Quantizer unit tests: quantize->dequant round-trips (the reference's
__main__ smoke tests, SURVEY.md section 4) plus numerical parity against the
reference torch implementations run on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vqvae_from_gaussian_vae_tpu.quantization.bsq import BSQQuantizer
from vqvae_from_gaussian_vae_tpu.quantization.fsq import FSQQuantizer
from vqvae_from_gaussian_vae_tpu.quantization.gaussian import (
    GaussianQuantRegularizer,
    GaussianRegularizer,
    IdentityRegularizer,
    init_duals,
    update_duals,
)
from vqvae_from_gaussian_vae_tpu.quantization.lfq import LFQQuantizer
from vqvae_from_gaussian_vae_tpu.quantization.vq import VQQuantizer

RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}


def _init_apply(mod, z, **kw):
    variables = mod.init(RNGS, z, **kw)
    out = mod.apply(variables, z, rngs={"sample": jax.random.PRNGKey(2)}, **kw)
    return variables, out


# ---------------------------------------------------------------------- GQ


def test_gq_eval_roundtrip_bhwc():
    """Mirrors gaussian.py:373-381: quantize then dequant must be exact."""
    mod = GaussianQuantRegularizer(format="bchw", group=16, n_samples=1024, backend="xla")
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 32))
    variables, (zhat, info) = _init_apply(mod, z, train=False)
    assert zhat.shape == (1, 4, 4, 16)
    assert info["indices"].shape == (1, 4, 4, 1)
    assert info["zhat_noquant"].shape == (1, 4, 4, 16)
    z2 = mod.apply(variables, info["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(zhat), np.asarray(z2), atol=1e-6)


def test_gq_eval_roundtrip_blc_multigroup():
    mod = GaussianQuantRegularizer(format="blc", group=8, n_samples=512, backend="xla")
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 64))  # c=32 -> ng=4
    variables, (zhat, info) = _init_apply(mod, z, train=False)
    assert zhat.shape == (2, 6, 32)
    assert info["indices"].shape == (2, 6, 4)
    z2 = mod.apply(variables, info["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(zhat), np.asarray(z2), atol=1e-6)


def test_gq_eval_indices_match_torch_reference():
    from pit.quantization.gaussian import GaussianQuantRegularizer as TorchGQ

    tmod = TorchGQ(format="blc", n_samples=1024, group=16, backend="torch").eval()
    z = np.random.default_rng(5).standard_normal((2, 16, 32)).astype(np.float32)
    with torch.no_grad():
        tzhat, tinfo = tmod(torch.from_numpy(z))

    jmod = GaussianQuantRegularizer(format="blc", group=16, n_samples=1024, backend="xla")
    variables, (jzhat, jinfo) = _init_apply(jmod, jnp.asarray(z), train=False)
    match = (np.asarray(jinfo["indices"]) == tinfo["indices"].numpy()).mean()
    assert match > 0.99, match
    if match == 1.0:
        np.testing.assert_allclose(np.asarray(jzhat), tzhat.numpy(), atol=1e-6)


def test_gq_train_losses_match_torch_reference():
    from pit.quantization.gaussian import GaussianQuantRegularizer as TorchGQ

    tmod = TorchGQ(format="blc", n_samples=1024, group=16, backend="torch").train()
    z = np.random.default_rng(6).standard_normal((2, 16, 32)).astype(np.float32)
    tzhat, tinfo = tmod(torch.from_numpy(z))

    jmod = GaussianQuantRegularizer(format="blc", group=16, n_samples=1024, backend="xla")
    variables, (jzhat, jinfo) = _init_apply(jmod, jnp.asarray(z), train=True)
    # losses are sampling-free given identical duals (lam=1 at init)
    np.testing.assert_allclose(float(jinfo["kl_loss"]), float(tinfo["kl_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(jinfo["bits-mean"]), float(tinfo["bits-mean"]), rtol=1e-5)
    np.testing.assert_allclose(float(jinfo["bits-min"]), float(tinfo["bits-min"]), rtol=1e-4)
    np.testing.assert_allclose(float(jinfo["bits-max"]), float(tinfo["bits-max"]), rtol=1e-5)


def test_gq_dual_update_matches_torch_reference():
    from pit.quantization.gaussian import GaussianQuantRegularizer as TorchGQ

    tmod = TorchGQ(format="blc", n_samples=1024, group=16, backend="torch").train()
    rng = np.random.default_rng(7)
    duals = init_duals()
    for step in range(5):
        z = (rng.standard_normal((2, 16, 32)) * (1.0 + step)).astype(np.float32)
        _, tinfo = tmod(torch.from_numpy(z))
        stats = {
            "bits-mean": jnp.float32(float(tinfo["bits-mean"])),
            "bits-min": jnp.float32(float(tinfo["bits-min"])),
            "bits-max": jnp.float32(float(tinfo["bits-max"])),
        }
        duals = update_duals(duals, stats, tmod.log_n_samples, tmod.tolerance, tmod.lam_factor)
        np.testing.assert_allclose(float(duals["lam"]), tmod.lam, rtol=1e-6)
        np.testing.assert_allclose(float(duals["lam_min"]), tmod.lam_min, rtol=1e-6)
        np.testing.assert_allclose(float(duals["lam_max"]), tmod.lam_max, rtol=1e-6)


def test_gaussian_regularizer_kl():
    mod = GaussianRegularizer(format="bchw")
    z = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 4, 8))
    _, (zhat, info) = _init_apply(mod, z, train=True)
    assert zhat.shape == (2, 4, 4, 4)
    mu = np.asarray(z)[..., :4]
    logvar = np.asarray(z)[..., 4:]
    kl = 0.5 * (mu**2 + np.exp(logvar) - 1 - logvar)
    np.testing.assert_allclose(float(info["kl"]), kl.reshape(2, -1).sum(1).mean(), rtol=1e-5)


def test_identity_regularizer():
    mod = IdentityRegularizer()
    z = jnp.ones((2, 3))
    _, (zhat, info) = _init_apply(mod, z)
    np.testing.assert_array_equal(np.asarray(zhat), np.ones((2, 3)))
    assert info == {}


# ---------------------------------------------------------------------- VQ


def test_vq_roundtrip_and_torch_parity():
    from pit.quantization.vq import VQQuantizer as TorchVQ

    tmod = TorchVQ(format="bchw", n=64, dim=8, codebook_num=2)
    jmod = VQQuantizer(format="bchw", n=64, dim=8, codebook_num=2)
    z = np.random.default_rng(9).standard_normal((2, 4, 4, 16)).astype(np.float32)
    variables = jmod.init(RNGS, jnp.asarray(z), train=True)
    # copy torch's embedding into our params for exact parity
    emb = tmod.embedding.weight.detach().numpy()
    variables = {"params": {"embedding": jnp.asarray(emb)}}

    jzq, jinfo = jmod.apply(variables, jnp.asarray(z), train=True)
    with torch.no_grad():
        tzq, tinfo = tmod(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(
        np.asarray(jinfo["indices"]), tinfo["indices"].numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(
        np.asarray(jzq), tzq.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(float(jinfo["codebook_loss"]), float(tinfo["codebook_loss"]), rtol=1e-4)

    jz2 = jmod.apply(variables, jinfo["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(jz2), np.asarray(jzq), atol=1e-6)


# ---------------------------------------------------------------------- FSQ


def test_fsq_roundtrip_and_torch_parity():
    from pit.quantization.fsq import FSQQuantizer as TorchFSQ

    levels = [8, 8, 5, 5]
    tmod = TorchFSQ(levels, "bchw")
    jmod = FSQQuantizer(levels=levels, format="bchw")
    z = np.random.default_rng(10).standard_normal((3, 4, 4, 4)).astype(np.float32)
    variables, (jzq, jinfo) = _init_apply(jmod, jnp.asarray(z), train=False)
    with torch.no_grad():
        tzq, tinfo = tmod(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(
        np.asarray(jinfo["indices"]), tinfo["indices"].numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(np.asarray(jzq), tzq.numpy().transpose(0, 2, 3, 1), atol=1e-5)
    np.testing.assert_allclose(float(jinfo["bits"]), float(tinfo["bits"]), rtol=1e-6)
    jz2 = jmod.apply(variables, jinfo["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(jz2), np.asarray(jzq), atol=1e-5)


# ---------------------------------------------------------------------- LFQ


def test_lfq_roundtrip_and_torch_parity():
    from pit.quantization.lfq import LFQQuantizer as TorchLFQ

    tmod = TorchLFQ(format="bchw", codebook_size=256, num_codebooks=2).train()
    jmod = LFQQuantizer(format="bchw", codebook_size=256, num_codebooks=2)
    z = np.random.default_rng(11).standard_normal((2, 4, 4, 16)).astype(np.float32)
    variables, (jzq, jinfo) = _init_apply(jmod, jnp.asarray(z), train=True)
    tzq, tinfo = tmod(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(
        np.asarray(jinfo["indices"]), tinfo["indices"].numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(
        np.asarray(jzq), tzq.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        float(jinfo["entropy_aux_loss"]), float(tinfo["entropy_aux_loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(float(jinfo["commit_loss"]), float(tinfo["commit_loss"]), rtol=1e-4)
    jz2 = jmod.apply(variables, jinfo["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(jz2), np.asarray(jzq), atol=1e-6)


# ---------------------------------------------------------------------- BSQ


def test_bsq_roundtrip_and_torch_parity():
    from pit.quantization.bsq import BSQQuantizer as TorchBSQ

    tmod = TorchBSQ(format="bchw", codebook_size=2, num_codebooks=16).train()
    jmod = BSQQuantizer(format="bchw", codebook_size=2, num_codebooks=16)
    z = np.random.default_rng(12).standard_normal((2, 4, 4, 16)).astype(np.float32)
    variables, (jzq, jinfo) = _init_apply(jmod, jnp.asarray(z), train=True)
    tzq, tinfo = tmod(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(
        np.asarray(jinfo["indices"]), tinfo["indices"].numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(
        np.asarray(jzq), tzq.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        float(jinfo["entropy_aux_loss"]), float(tinfo["entropy_aux_loss"]), rtol=1e-3, atol=1e-4
    )
    jz2 = jmod.apply(variables, jinfo["indices"], method="dequant")
    np.testing.assert_allclose(np.asarray(jz2), np.asarray(jzq), atol=1e-6)
