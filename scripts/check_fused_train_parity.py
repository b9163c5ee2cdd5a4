#!/usr/bin/env python
"""TPU sanity: one ae/disc train step with the fused training kernels vs
GVQ_DISABLE_FUSED_KERNELS=1, on a small bf16 engine.  Losses and a sample
of parameter updates must agree to bf16-accumulation tolerance.

Usage: python scripts/check_fused_train_parity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PKG = "vqvae_from_gaussian_vae_tpu"


def build(disable_fused: bool):
    os.environ["GVQ_DISABLE_FUSED_KERNELS"] = "1" if disable_fused else ""
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

    model_cfg = {
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "loss_config": {
                "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
                "params": {
                    "perceptual_weight": 1.0, "disc_start": 0,
                    "disc_weight": 0.75, "learn_logvar": True,
                    "dtype": "bfloat16",
                    "regularization_weights": {"kl_loss": 0.1},
                    "discriminator_config": {
                        "target": f"{PKG}.losses.discriminator.NLayerDiscriminator",
                        "params": {"input_nc": 3, "ndf": 16, "n_layers": 2,
                                   "use_actnorm": True},
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
                "params": {
                    "attn_type": "vanilla", "double_z": True, "z_channels": 4,
                    "resolution": 64, "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 2,
                    "attn_resolutions": [], "dropout": 0.0,
                    "dtype": "bfloat16",
                },
            },
            "decoder_config": {
                "target": f"{PKG}.models.unet.Decoder",
                "params": {
                    "attn_type": "vanilla", "double_z": True, "z_channels": 4,
                    "resolution": 64, "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 2,
                    "attn_resolutions": [], "dropout": 0.0,
                    "dtype": "bfloat16",
                },
            },
        },
    }
    engine = instantiate_from_config(model_cfg)
    ae_opt, disc_opt = make_optimizers(1e-3)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    rng = np.random.default_rng(0)
    batch = {"img": rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)}
    state = builder.init_state(jax.random.PRNGKey(0), batch)
    state = state.replace(step=jnp.int32(10))
    state, log = builder.ae_step(state, {"img": jnp.asarray(batch["img"])},
                                 disc_active=True)
    state, dlog = builder.disc_step(state, {"img": jnp.asarray(batch["img"])})
    return state, {**log, **dlog}


def main():
    s_fused, log_fused = build(False)
    s_plain, log_plain = build(True)
    bad = 0
    for k in sorted(log_fused):
        a, b = float(np.asarray(log_fused[k])), float(np.asarray(log_plain[k]))
        rel = abs(a - b) / (abs(b) + 1e-6)
        flag = "" if rel < 5e-2 else "  <-- MISMATCH"
        bad += rel >= 5e-2
        print(f"{k}: fused={a:.5f} plain={b:.5f} rel={rel:.2e}{flag}")
    pf = jax.tree.leaves(s_fused.engine_params)
    pp = jax.tree.leaves(s_plain.engine_params)
    deltas = [float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
              for x, y in zip(pf, pp)]
    print(f"max param-update delta: {max(deltas):.3e} over {len(deltas)} leaves")
    print("OK" if bad == 0 and max(deltas) < 5e-2 else "FAIL")
    sys.exit(0 if bad == 0 and max(deltas) < 5e-2 else 1)


if __name__ == "__main__":
    main()
