#!/usr/bin/env python
"""Convert a reference torch Lightning .ckpt into this framework's native
.msgpack params (and back-check the load).

    python scripts/convert_checkpoint.py --base configs/sd3unet_gq_0.25.yaml \
        --ckpt sd3unet_gq_0.25.ckpt --out sd3unet_gq_0.25.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    cfg = load_config(args.base)
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    missing, unexpected = engine.load_checkpoint(args.ckpt)
    print(f"missing: {len(missing)}  unexpected(ignored): {len(unexpected)}")
    engine.save_params(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
