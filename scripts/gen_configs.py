#!/usr/bin/env python
"""Generate the shipped YAML configs (one per reference config, same names
and hyperparameters, native class paths).  Run from the repo root:

    python scripts/gen_configs.py
"""

import copy
import os

import yaml

PKG = "vqvae_from_gaussian_vae_tpu"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")

DISC = {
    "target": f"{PKG}.losses.discriminator.NLayerDiscriminator",
    "params": {"input_nc": 3, "ndf": 160, "n_layers": 6, "use_actnorm": True},
}


def loss_cfg(reg_weights, log_keys):
    return {
        "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
        "params": {
            "perceptual_weight": 1.0,
            "disc_start": 20001,
            "disc_weight": 0.75,
            "learn_logvar": True,
            "regularization_weights": reg_weights,
            "additional_log_keys": log_keys,
            "discriminator_config": DISC,
        },
    }


def unet_cfg(z_channels, double_z):
    return {
        "params": {
            "attn_type": "vanilla",
            "double_z": double_z,
            "z_channels": z_channels,
            "resolution": 256,
            "in_channels": 3,
            "out_ch": 3,
            "ch": 128,
            "ch_mult": [1, 2, 4, 4],
            "num_res_blocks": 2,
            "attn_resolutions": [32],
            "dropout": 0.0,
        }
    }


def vit_cfg(z_channels):
    return {
        "params": {
            "double_z": True,
            "z_channels": z_channels,
            "image_size": 256,
            "patch_size": 8,
            "width": 768,
            "layers": 12,
            "heads": 12,
            "mlp_ratio": 4,
            "drop_rate": 0.0,
        }
    }


def model(base_lr, loss, regularizer, backbone, enc_target, dec_target, extra=None):
    enc = copy.deepcopy(backbone)
    enc["target"] = enc_target
    params = {
        "input_key": "img",
        "loss_config": loss,
        "regularizer_config": regularizer,
        "encoder_config": enc,
        "decoder_config": {
            "target": dec_target,
            "params": "${model.params.encoder_config.params}",
        },
    }
    if extra:
        params.update(extra)
    return {
        "base_learning_rate": base_lr,
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": params,
    }


TRAINING = {
    # our SPMD trainer's knobs (the reference's `lightning:` section analog;
    # the trainer also understands reference-style lightning sections)
    "checkpoint": {"every_n_train_steps": 5000, "keep_every_n_train_steps": 10000},
    "image_logger": {"batch_frequency": 1000, "max_images": 8, "increase_log_steps": True},
    "trainer": {
        "precision": 32,
        "max_steps": 1_000_000,
        "log_every_n_steps": 50,
        "seed": 23,
        "mesh": {"data": -1},  # -1: all devices on the data axis
    },
}

DATA = {
    "target": f"{PKG}.data.dataset.ImageDataModuleFromConfig",
    "params": {
        "num_workers": 16,
        "batch_size": 16,
        "train": {
            "target": f"{PKG}.data.dataset.SimpleDataset",
            "params": {"root": "/data/imagenet/train", "image_size": 256},
        },
    },
}


def gq_reg(n_samples):
    return {
        "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
        "params": {"format": "bchw", "group": 16, "n_samples": n_samples, "backend": "auto"},
    }


GQ_LOSS_KEYS = ["kl_loss", "bits-mean", "bits-min", "bits-max"]
UNET = f"{PKG}.models.unet"
VIT = f"{PKG}.models.vit"

CONFIGS = {}

# sd3unet_gq family: bits-per-dim sweep via the KL group size
# (0.25 -> group 16, 0.50 -> group 8, 1.00 -> group 4; 16 bits per group)
for name, group in [("sd3unet_gq_0.25", 16), ("sd3unet_gq_0.50", 8), ("sd3unet_gq_1.00", 4)]:
    reg = gq_reg(65536)
    reg["params"]["group"] = group
    CONFIGS[name] = model(
        1e-4, loss_cfg({"kl_loss": 0.1}, GQ_LOSS_KEYS), reg,
        unet_cfg(16, True), f"{UNET}.Encoder", f"{UNET}.Decoder",
    )

for name, group in [("bsqvit_gq_0.25", 16), ("bsqvit_gq_0.50", 8), ("bsqvit_gq_1.00", 4)]:
    reg = gq_reg(65536)
    reg["params"].update(format="blc", group=group)
    CONFIGS[name] = model(
        1e-4, loss_cfg({"kl_loss": 0.1}, GQ_LOSS_KEYS), reg,
        vit_cfg(16), f"{VIT}.TransformerEncoder", f"{VIT}.TransformerDecoder",
        extra={"clamp_range": [-1, 1]},
    )

CONFIGS["sd3unet_gq2_0.25"] = model(
    1e-4, loss_cfg({"kl_loss": 0.1}, GQ_LOSS_KEYS),
    {
        "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer2",
        "params": {"dim": 16, "codebook_size": 65536, "backend": "auto"},
    },
    unet_cfg(16, True), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

CONFIGS["sd3unet_vq_16"] = model(
    4e-4, loss_cfg({"codebook_loss": 1.0}, None),
    {"target": f"{PKG}.quantization.vq.VQQuantizer",
     "params": {"format": "bchw", "n": 65536, "dim": 16}},
    unet_cfg(16, False), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

CONFIGS["sd3unet_fsq_16"] = model(
    1e-4, loss_cfg(None, None),
    {"target": f"{PKG}.quantization.fsq.FSQQuantizer",
     "params": {"levels": [8, 8, 8, 5, 5, 5], "format": "bchw"}},
    unet_cfg(6, False), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

CONFIGS["sd3unet_lfq_16"] = model(
    4e-5, loss_cfg({"entropy_aux_loss": 0.1, "commit_loss": 0.025}, None),
    {"target": f"{PKG}.quantization.lfq.LFQQuantizer",
     "params": {"format": "bchw", "codebook_size": 256, "num_codebooks": 2}},
    unet_cfg(16, False), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

CONFIGS["sd3unet_bsq_16"] = model(
    4e-5, loss_cfg({"entropy_aux_loss": 0.1}, None),
    {"target": f"{PKG}.quantization.bsq.BSQQuantizer",
     "params": {"format": "bchw", "codebook_size": 2, "num_codebooks": 16}},
    unet_cfg(16, False), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

# pure Gaussian-VAE mode (the reference names a class it never defines;
# GaussianRegularizer here is a real implementation, SURVEY.md 2.4)
CONFIGS["sd3unet_gaussian_kl_0.64"] = model(
    1e-4, loss_cfg({"kl": 0.64}, None),
    {"target": f"{PKG}.quantization.gaussian.GaussianRegularizer",
     "params": {"format": "bchw"}},
    unet_cfg(16, True), f"{UNET}.Encoder", f"{UNET}.Decoder",
)

# fine-tune / re-eval variants of the flagship run
CONFIGS["sd3unet_gq_0.25_vq"] = copy.deepcopy(CONFIGS["sd3unet_gq_0.25"])
CONFIGS["sd3unet_gq_0.25_vq"]["params"]["ckpt_path"] = "./models_256/sd3unet_gq_0.25.ckpt"
CONFIGS["sd3unet_gq_0.25_vq"]["params"]["loss_config"]["params"]["regularization_weights"] = None
CONFIGS["sd3unet_gq_0.25_vq"]["params"]["loss_config"]["params"]["additional_log_keys"] = None

CONFIGS["sd3unet_gq_0.25_gaussian"] = copy.deepcopy(CONFIGS["sd3unet_gaussian_kl_0.64"])
CONFIGS["sd3unet_gq_0.25_gaussian"]["params"]["ckpt_path"] = "./models_256/sd3unet_gq_0.25.ckpt"
CONFIGS["sd3unet_gq_0.25_gaussian"]["params"]["loss_config"]["params"]["regularization_weights"] = None

CONFIGS["sd3unet_gq_0.25_vf"] = copy.deepcopy(CONFIGS["sd3unet_gq_0.25"])
CONFIGS["sd3unet_gq_0.25_vf"]["params"]["use_vf"] = "dinov2"
CONFIGS["sd3unet_gq_0.25_vf"]["params"]["reverse_proj"] = True
CONFIGS["sd3unet_gq_0.25_vf"]["params"]["loss_config"]["params"].update(
    {"vf_weight": 0.2, "adaptive_vf": True, "distmat_margin": 0.25, "cos_margin": 0.5}
)
del CONFIGS["sd3unet_gq_0.25_vf"]["params"]["regularizer_config"]["params"]["backend"]


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, model_cfg in CONFIGS.items():
        cfg = {"model": model_cfg, "training": copy.deepcopy(TRAINING), "data": copy.deepcopy(DATA)}
        path = os.path.join(OUT, f"{name}.yaml")
        with open(path, "w") as f:
            f.write(f"# generated by scripts/gen_configs.py - edit there, not here\n")
            yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None)
        print("wrote", path)


if __name__ == "__main__":
    main()
