"""Learning sanity: overfitting one batch drives the reconstruction loss
down through the full two-optimizer stack (the strongest cheap signal that
gradients, adaptive weights, duals and optimizer plumbing are all wired)."""

import jax
import numpy as np

from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

PKG = "vqvae_from_gaussian_vae_tpu"


def _engine():
    return instantiate_from_config({
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "loss_config": {
                "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
                "params": {
                    # isolate the reconstruction objective: no perceptual
                    # term (random VGG), late disc
                    "perceptual_weight": 0.0,
                    "disc_start": 10_000,
                    "learn_logvar": False,
                    "regularization_weights": {"kl_loss": 1e-4},
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
                           "resolution": 16, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
            "decoder_config": {
                "target": f"{PKG}.models.unet.Decoder",
                "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                           "resolution": 16, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
        },
    })


def test_overfit_one_batch_reduces_rec_loss():
    engine = _engine()
    ae_opt, disc_opt = make_optimizers(3e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    batch = {"img": np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)}
    state = builder.init_state(jax.random.PRNGKey(0), batch)

    recs = []
    for _ in range(40):
        state, log = builder.ae_step(state, batch, disc_active=False)
        recs.append(float(log["train/loss/rec"]))
    first = np.mean(recs[:5])
    last = np.mean(recs[-5:])
    assert last < 0.6 * first, (first, last, recs[::8])
