"""End-to-end training step over the ViT backbone (blc format): gradients
flow through patchify/attention/GQ-blc, the adaptive weight targets the
ViT's conv_out head, and toy datasets parse."""

import gzip
import os
import pickle
import struct

import jax
import numpy as np

from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

PKG = "vqvae_from_gaussian_vae_tpu"


def _vit_engine():
    cfg = {
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "clamp_range": [-1, 1],
            "loss_config": {
                "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
                "params": {
                    "perceptual_weight": 1.0,
                    "disc_start": 0,
                    "disc_weight": 0.75,
                    "learn_logvar": True,
                    "regularization_weights": {"kl_loss": 0.1},
                    "discriminator_config": {
                        "target": f"{PKG}.losses.discriminator.NLayerDiscriminator",
                        "params": {"input_nc": 3, "ndf": 8, "n_layers": 2, "use_actnorm": True},
                    },
                },
            },
            "regularizer_config": {
                "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
                "params": {"format": "blc", "group": 4, "n_samples": 256,
                           "seed": 7, "backend": "xla"},
            },
            "encoder_config": {
                "target": f"{PKG}.models.vit.TransformerEncoder",
                "params": {"double_z": True, "z_channels": 4, "image_size": 32,
                           "patch_size": 8, "width": 32, "layers": 2, "heads": 4,
                           "mlp_ratio": 2, "drop_rate": 0.0},
            },
            "decoder_config": {
                "target": f"{PKG}.models.vit.TransformerDecoder",
                "params": {"double_z": True, "z_channels": 4, "image_size": 32,
                           "patch_size": 8, "width": 32, "layers": 2, "heads": 4,
                           "mlp_ratio": 2, "drop_rate": 0.0,
                           "dim_ffn_output": 64},
            },
        },
    }
    return instantiate_from_config(cfg)


def _batch(seed=0, n=2):
    rng = np.random.default_rng(seed)
    return {"img": rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)}


def test_vit_gan_training_with_adaptive_weight():
    engine = _vit_engine()
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    assert builder.last_layer_path == ("decoder", "conv_out", "kernel")
    state = builder.init_state(jax.random.PRNGKey(0), _batch())
    state, log = builder.ae_step(state, _batch(seed=1), disc_active=True)
    assert np.isfinite(float(log["train/loss/total"]))
    assert float(log["train/scalars/d_weight"]) > 0.0
    state, log_d = builder.disc_step(state, _batch(seed=2))
    assert float(log_d["train/loss/disc"]) > 0.0
    # blc indices shape from an eval forward
    engine.params = state.engine_params
    z, dec, reg_log = engine.forward(_batch(seed=3)["img"])
    assert reg_log["indices"].shape == (2, 16, 1)  # 16 tokens at 32px/p8
    assert dec.shape == (2, 32, 32, 3)


def test_toy_datasets(tmp_path):
    from vqvae_from_gaussian_vae_tpu.data.toy import CIFAR10Dataset, MNISTDataset

    # synthesize an MNIST idx file
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (5, 28, 28), dtype=np.uint8)
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3))
        f.write(struct.pack(">III", *imgs.shape))
        f.write(imgs.tobytes())
    ds = MNISTDataset(str(tmp_path), image_size=32)
    item = ds[0]
    assert item["img"].shape == (32, 32, 3)
    assert -1.0 <= item["img"].min() and item["img"].max() <= 1.0

    # synthesize a CIFAR batch
    os.makedirs(tmp_path / "cifar-10-batches-py", exist_ok=True)
    blob = {b"data": rng.integers(0, 255, (4, 3072), dtype=np.uint8)}
    for name in [f"data_batch_{i}" for i in range(1, 6)]:
        with open(tmp_path / "cifar-10-batches-py" / name, "wb") as f:
            pickle.dump(blob, f)
    cds = CIFAR10Dataset(str(tmp_path), image_size=32)
    assert len(cds) == 20
    assert cds[0]["img"].shape == (32, 32, 3)
