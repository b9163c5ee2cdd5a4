"""End-to-end engine slice (SURVEY.md section 7 stage 4): config ->
AutoencodingEngine -> encode(demo) -> indices -> dequant -> decode,
exercising L0-L3 and the reference README API (Readme.md:56-92)."""

import os

import jax
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.utils.config import apply_dotlist, load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")
DEMO = "/root/reference/demo.png"


def _small_unet_overrides():
    # 64px, f=2 UNet -> (1, 32, 32, z) latents; small codebook for CPU speed
    return [
        "model.params.encoder_config.params.resolution=64",
        "model.params.encoder_config.params.ch=32",
        "model.params.encoder_config.params.ch_mult=[1,2]",
        "model.params.encoder_config.params.attn_resolutions=[32]",
    ]


def _small_gq_overrides():
    return _small_unet_overrides() + [
        "model.params.regularizer_config.params.n_samples=1024",
    ]


def _load_engine(name, overrides=()):
    cfg = load_config(os.path.join(CONFIG_DIR, f"{name}.yaml"), dotlist=overrides)
    cfg["model"]["params"].pop("ckpt_path", None)  # no pretrained ckpts in CI
    cfg["model"]["params"]["loss_config"] = None  # eval-only slice
    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    return engine


def test_sd3unet_gq_encode_quant_dequant_roundtrip():
    engine = _load_engine("sd3unet_gq_0.25", _small_gq_overrides())
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1, np.float32
    )

    z, reg_log = engine.encode(x, return_reg_log=True)
    assert z.shape == (1, 32, 32, 16)
    assert reg_log["indices"].shape == (1, 32, 32, 1)
    assert reg_log["zhat_noquant"].shape == (1, 32, 32, 16)

    # quant() convenience
    z2, indices = engine.quant(x)
    np.testing.assert_array_equal(np.asarray(indices), np.asarray(reg_log["indices"]))

    # dequant -> image; decode(z) must equal dequant(indices) exactly
    xhat = engine.dequant(reg_log["indices"])
    xdec = engine.decode(z)
    assert xhat.shape == x.shape
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(xdec), atol=1e-5)

    # unregularized encode returns the raw (mu, logvar) stack
    zraw = engine.encode(x, unregularized=True)
    assert zraw[0].shape == (1, 32, 32, 32)


def test_engine_forward_and_log_images():
    engine = _load_engine("sd3unet_gq_0.25", _small_gq_overrides())
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 2 - 1, np.float32
    )
    z, dec, reg_log = engine.forward(x)
    assert dec.shape == x.shape
    log = engine.log_images({"img": x})
    for key in ("inputs", "reconstructions", "diff", "diff_boost"):
        assert log[key].shape == x.shape
        assert np.isfinite(np.asarray(log[key])).all()


@pytest.mark.parametrize(
    "name,overrides",
    [
        ("sd3unet_vq_16", _small_unet_overrides()),
        ("sd3unet_fsq_16", _small_unet_overrides()),
        ("sd3unet_lfq_16", _small_unet_overrides()),
        ("sd3unet_bsq_16", _small_unet_overrides()),
        ("sd3unet_gaussian_kl_0.64", _small_unet_overrides()),
        ("sd3unet_gq2_0.25", _small_unet_overrides()
         + ["model.params.regularizer_config.params.codebook_size=1024"]),
        (
            "bsqvit_gq_0.25",
            [
                "model.params.encoder_config.params.image_size=32",
                "model.params.encoder_config.params.width=64",
                "model.params.encoder_config.params.layers=2",
                "model.params.encoder_config.params.heads=4",
            ],
        ),
    ],
)
def test_all_config_families_e2e(name, overrides):
    engine = _load_engine(name, overrides)
    size = 32 if name.startswith("bsqvit") else 64
    x = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (1, size, size, 3)) * 2 - 1, np.float32
    )
    z, dec, reg_log = engine.forward(x)
    assert dec.shape == x.shape
    if "indices" in reg_log and name != "sd3unet_gq2_0.25":
        xhat = engine.dequant(reg_log["indices"])
        assert xhat.shape == x.shape


def test_demo_image_full_resolution():
    """The README flow on the actual demo image at 256x256 (random weights -
    checks shapes, determinism of indices, and the full jit path)."""
    if not os.path.exists(DEMO):
        pytest.skip("demo image unavailable")
    from vqvae_from_gaussian_vae_tpu.data.dataset import load_image

    engine = _load_engine("sd3unet_gq_0.25")
    img = load_image(DEMO, 256)[None]  # (1, 256, 256, 3)
    z, reg_log = engine.encode(img, return_reg_log=True)
    assert z.shape == (1, 32, 32, 16)
    assert reg_log["indices"].shape == (1, 32, 32, 1)
    # indices are a deterministic function of the input (no sampling)
    _, reg_log2 = engine.encode(img, return_reg_log=True)
    np.testing.assert_array_equal(np.asarray(reg_log["indices"]), np.asarray(reg_log2["indices"]))
    xhat = engine.dequant(reg_log["indices"])
    assert xhat.shape == img.shape
