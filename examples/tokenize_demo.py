#!/usr/bin/env python
"""The reference README flow (Readme.md:56-92), end to end:

    python examples/tokenize_demo.py --image demo.png \
        [--base configs/sd3unet_gq_0.25.yaml] [--ckpt model.ckpt] \
        [--out side_by_side.png]

Tokenizes an image into 32x32 16-bit codes, reconstructs it from the tokens
alone, and writes input|reconstruction side by side.  Without --ckpt the
model runs with seeded random weights (the pipeline still demonstrates the
token round-trip; reconstructions need trained weights to look like the
input).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--base", default="configs/sd3unet_gq_0.25.yaml")
    p.add_argument("--ckpt", default="")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--out", default="tokenize_demo_out.png")
    args = p.parse_args()

    import jax
    import numpy as np
    from PIL import Image

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.data.dataset import load_image
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    cfg = load_config(args.base)
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    vae = instantiate_from_config(cfg["model"])
    vae.init_params(jax.random.PRNGKey(0))
    if args.ckpt:
        vae.load_checkpoint(args.ckpt)

    img = load_image(args.image, args.img_size)[None]

    z, reg_log = vae.encode(img, return_reg_log=True)
    indices = np.asarray(reg_log["indices"])
    print(f"tokens: shape {indices.shape}, dtype {indices.dtype}, "
          f"range [{indices.min()}, {indices.max()}], "
          f"{len(np.unique(indices))} distinct codes")

    xhat = np.asarray(vae.dequant(reg_log["indices"]))  # image from tokens alone
    xrec = np.asarray(vae.decode(z))
    print(f"dequant(indices) == decode(z): "
          f"max diff {np.abs(xhat - xrec).max():.2e}")

    side = np.concatenate([np.asarray(img[0]), xhat[0]], axis=1)
    u8 = np.clip((side + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
