"""vf (foundation-feature alignment) branch: engine forward emits
aux_feature/zp, the loss consumes them, and the adaptive vf weight trains."""

import jax
import numpy as np

from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

PKG = "vqvae_from_gaussian_vae_tpu"


def _vf_engine(reverse_proj=True):
    cfg = {
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "use_vf": "dinov2",
            "reverse_proj": reverse_proj,
            "loss_config": {
                "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
                "params": {
                    "perceptual_weight": 1.0,
                    "disc_start": 100,
                    "learn_logvar": True,
                    "vf_weight": 0.2,
                    "adaptive_vf": True,
                    "distmat_margin": 0.25,
                    "cos_margin": 0.5,
                    "regularization_weights": {"kl_loss": 0.1},
                    "discriminator_config": {
                        "target": f"{PKG}.losses.discriminator.NLayerDiscriminator",
                        "params": {"input_nc": 3, "ndf": 8, "n_layers": 2, "use_actnorm": True},
                    },
                },
            },
            "regularizer_config": {
                "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
                "params": {"format": "bchw", "group": 4, "n_samples": 256,
                           "seed": 7, "backend": "xla"},
            },
            "encoder_config": {
                "target": f"{PKG}.models.unet.Encoder",
                "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                           "resolution": 56, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
            "decoder_config": {
                "target": f"{PKG}.models.unet.Decoder",
                "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                           "resolution": 56, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
        },
    }
    # shrink the foundation trunk for CI speed
    import vqvae_from_gaussian_vae_tpu.models.foundation as fnd

    fnd._SPECS["dinov2"] = (14, 64, 2, 4, 1e-5)
    engine = instantiate_from_config(cfg)
    return engine


def _batch(seed=0, n=2):
    rng = np.random.default_rng(seed)
    return {"img": rng.uniform(-1, 1, (n, 56, 56, 3)).astype(np.float32)}


def test_vf_forward_emits_alignment_features():
    engine = _vf_engine(reverse_proj=True)
    engine.init_params(jax.random.PRNGKey(0), example=_batch()["img"])
    z, dec, reg_log = engine.forward(_batch()["img"])
    assert "aux_feature" in reg_log and "zp" in reg_log
    # 56/14 = 4x4 feature grid, dim 64; zp projected into vf space
    assert reg_log["aux_feature"].shape == (2, 4, 4, 64)
    assert reg_log["zp"].shape == (2, 4, 4, 64)
    assert "foundation" in engine.params and "linear_proj" in engine.params


def test_vf_train_step_with_adaptive_weight():
    engine = _vf_engine(reverse_proj=True)
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    assert builder.vf_adaptive
    state = builder.init_state(jax.random.PRNGKey(1), _batch())

    found_before = jax.tree.map(np.asarray, state.engine_params["foundation"])
    proj_before = np.asarray(state.engine_params["linear_proj"]["kernel"]).copy()

    state, log = builder.ae_step(state, _batch(seed=2), disc_active=False)
    assert "train/loss/vf" in log
    assert np.isfinite(float(log["train/loss/vf"]))
    assert np.isfinite(float(log["train/loss/total"]))

    # linear_proj trains; the frozen foundation trunk must not move
    proj_after = np.asarray(state.engine_params["linear_proj"]["kernel"])
    assert not np.allclose(proj_before, proj_after)
    for b, a in zip(jax.tree.leaves(found_before),
                    jax.tree.leaves(state.engine_params["foundation"])):
        np.testing.assert_array_equal(b, np.asarray(a))
