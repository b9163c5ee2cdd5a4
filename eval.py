#!/usr/bin/env python
"""Sharded reconstruction-metric sweep (reference `/root/reference/eval.py`).

    python eval.py --base configs/sd3unet_gq_0.25.yaml --ckpt model.ckpt \
        --dataset /path/to/images --img_size 256 --bs 16 [--save --save_dir out]

Prints PSNR / SSIM / MS-SSIM / LPIPS(alex) means +-std and FID between the
source and reconstructed image distributions.

TPU-native redesign: the reference launches one torch.distributed process
per GPU and all_gathers every metric tensor (`eval.py:83-107,166-203`), then
rank-0 re-interleaves the shards (`:213-215`).  Here a single SPMD program
shards each batch over the `data` mesh axis; metric arrays come back as
ordinary global arrays, so the gather choreography and the interleave reorg
disappear entirely.

Weight assets (no egress in this image): pass --inception_weights /
--lpips_weights to load converted torch checkpoints; otherwise the nets run
with seeded random weights and a warning (relative comparisons remain
meaningful, absolute FID/LPIPS parity needs the assets).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="", type=str, help="model config yaml")
    p.add_argument("--ckpt", default="", type=str, help="torch .ckpt or flax .msgpack")
    p.add_argument("--dataset", default="", type=str, help="image folder or .txt list")
    p.add_argument("--img_size", default=256, type=int)
    p.add_argument("--bs", default=1, type=int, help="per-device batch size")
    p.add_argument("--save", default=False, type=bool)
    p.add_argument("--save_dir", default="", type=str)
    p.add_argument("--limit", default=0, type=int, help="cap on total images (0 = all)")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="engine backbone compute dtype; bfloat16 engages the "
                        "fused Pallas inference kernels (~2x sweep throughput, "
                        "reconstructions differ at bf16 rounding)")
    p.add_argument("--inception_weights", default="", type=str)
    p.add_argument("--lpips_weights", default="", type=str)
    p.add_argument("--video", action="store_true",
                   help="treat --dataset as a folder of clips (GIF/MP4): "
                        "per-frame metrics, optionally FVD (--fvd)")
    p.add_argument("--num_frames", default=16, type=int, help="frames per clip (video mode)")
    p.add_argument("--fvd", action="store_true",
                   help="also compute FVD over I3D features (needs "
                        "--num_frames >= 9; supply --i3d_weights for "
                        "reference-comparable values)")
    p.add_argument("--i3d_weights", default="", type=str,
                   help="converted I3D torchscript state_dict (video mode FVD)")
    p.add_argument("--stats_cache", default="", type=str,
                   help=".npz path caching the source dataset's Inception (mu, sigma)")
    # accepted for reference-CLI compatibility; SPMD needs no backend choice
    p.add_argument("--dist-backend", default="", type=str)
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host slice init (the reference's torch.distributed env:// init,
    # eval.py:83-88); no-op without coordinator env vars or under a worker
    # that already initialized jax.distributed (tests/eval_multihost_worker.py)
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    import jax
    import jax.numpy as jnp

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.data.dataset import SimpleDataset, _PrefetchLoader
    from vqvae_from_gaussian_vae_tpu.evaluations.fid import calculate_frechet_distance
    from vqvae_from_gaussian_vae_tpu.evaluations.inception import InceptionV3, load_inception_weights
    from vqvae_from_gaussian_vae_tpu.evaluations.lpips_metric import LPIPSMetric
    from vqvae_from_gaussian_vae_tpu.evaluations.psnr import get_psnr
    from vqvae_from_gaussian_vae_tpu.evaluations.ssim import get_ssim_and_msssim
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import make_mesh, shard_batch
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    cfg = load_config(args.base)
    params_cfg = cfg["model"].setdefault("params", {})
    if "loss_config" in params_cfg:
        params_cfg["loss_config"] = None
    params_cfg.pop("ckpt_path", None)
    if args.dtype != "float32":
        for key in ("encoder_config", "decoder_config"):
            if isinstance(params_cfg.get(key), dict):
                params_cfg[key].setdefault("params", {})["dtype"] = args.dtype
    engine = instantiate_from_config(cfg["model"])
    # the tokenizer engine exposes .module/.params for a single fused jit;
    # frozen third-party wrappers (models/third_party.py - the reference's
    # eval baselines, autoencoder.py:25-217) only expose the encode/decode
    # protocol, so reconstruction runs through that instead
    protocol_mode = not hasattr(engine, "module")
    if not protocol_mode:
        engine.init_params(jax.random.PRNGKey(0))
    if args.ckpt:
        engine.load_checkpoint(args.ckpt)

    n_dev = len(jax.devices())
    mesh = make_mesh({"data": -1})
    multi = jax.process_count() > 1
    # per-host loader feeds this host's mesh slice; shard_batch assembles the
    # global array (the reference's DistributedSampler role, eval.py:97-107)
    host_bs = args.bs * (jax.local_device_count() if multi else n_dev)

    if args.video:
        from vqvae_from_gaussian_vae_tpu.data.video import VideoDataset

        dataset = VideoDataset(args.dataset, image_size=args.img_size,
                               num_frames=args.num_frames)
    else:
        dataset = SimpleDataset(args.dataset, image_size=args.img_size)
    loader = _PrefetchLoader(dataset, host_bs, shuffle=False, drop_last=True,
                             shard_id=jax.process_index(),
                             num_shards=jax.process_count())

    inception = InceptionV3(output_blocks=(3,), resize_input=True, normalize_input=False)
    inc_vars = inception.init(jax.random.PRNGKey(1), jnp.zeros((1, args.img_size, args.img_size, 3)))
    if args.inception_weights:
        inc_vars, missing, _ = load_inception_weights(inc_vars, args.inception_weights)
        if missing:
            print("inception missing keys:", missing[:5], "...")
    else:
        print("WARNING: no --inception_weights; FID uses random-weight features")
    lpips = LPIPSMetric("alex", weights_path=args.lpips_weights or None)
    if not args.lpips_weights:
        print("WARNING: no --lpips_weights; LPIPS uses random-weight features")

    if args.video and args.save:
        raise SystemExit("--save writes per-image PNGs; not supported with --video")
    i3d_fn = None
    if args.video and args.fvd:
        assert jax.process_count() == 1, (
            "--video --fvd gathers clip features on one host; run single-process"
        )
        assert args.num_frames >= 9, (
            "FVD's I3D trunk needs >= 9 frames per clip (temporal stride 8 "
            "plus the final window-2 pool)"
        )
        from vqvae_from_gaussian_vae_tpu.evaluations.i3d import (
            InceptionI3d, load_i3d_weights, make_i3d_feature_fn)

        i3d_vars = None
        if args.i3d_weights:
            import torch as _torch

            model = InceptionI3d()
            template = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 9, 224, 224, 3)))
            i3d_vars, i3d_missing, _ = load_i3d_weights(
                template, _torch.load(args.i3d_weights, map_location="cpu",
                                      weights_only=False))
            if i3d_missing:
                print("i3d missing keys:", i3d_missing[:5], "...")
        i3d_fn = make_i3d_feature_fn(i3d_vars, resize=True)

    def metrics_of(img, rec, inc_vars, lpips_vars):
        psnr = get_psnr(img, rec, zero_mean=True)
        ssim_v, msssim_v = get_ssim_and_msssim(img, rec, zero_mean=True)
        lp = lpips.module.apply(lpips_vars, img, rec)[:, 0, 0, 0]
        (feat_x,) = inception.apply(inc_vars, img)
        (feat_r,) = inception.apply(inc_vars, rec)
        return {
            "rec": rec,
            "psnr": psnr,
            "ssim": ssim_v,
            "msssim": msssim_v,
            "lpips": lp,
            "feat_x": feat_x[:, 0, 0, :],
            "feat_r": feat_r[:, 0, 0, :],
        }

    if protocol_mode:
        metrics_jit = jax.jit(metrics_of)

        def step(params, inc_vars, lpips_vars, img, rng):
            z, info = engine.encode(img, return_reg_log=True)
            rec = engine.decode(z)
            out = metrics_jit(img, rec, inc_vars, lpips_vars)
            out["indices"] = info.get("indices") if isinstance(info, dict) else None
            return out

        params = None
    else:
        module, params = engine.module, engine.params

        def metric_step(params, inc_vars, lpips_vars, img, rng):
            z, info = module.apply(
                {"params": params}, img, return_reg_log=True, train=False,
                method="encode", rngs={"sample": rng},
            )
            rec = module.apply({"params": params}, z, method="decode")
            out = metrics_of(img, rec, inc_vars, lpips_vars)
            out["indices"] = info.get("indices")
            return out

        step = jax.jit(metric_step)
        # place weights on device once; host numpy leaves would re-transfer per call
        params = jax.tree.map(jnp.asarray, params)
    inc_vars = jax.tree.map(jnp.asarray, inc_vars)
    lpips.variables = jax.tree.map(jnp.asarray, lpips.variables)

    acc = {k: [] for k in ("psnr", "ssim", "msssim", "lpips", "feat_x", "feat_r")}
    fvd_real, fvd_fake = [], []
    hist = np.zeros(65536, np.int64)
    total = 0
    if args.save:
        src_dir = os.path.join(args.save_dir, "src")
        rec_dir = os.path.join(args.save_dir, "rec")
        os.makedirs(src_dir, exist_ok=True)
        os.makedirs(rec_dir, exist_ok=True)

    with mesh:
        for i, batch in enumerate(loader):
            if args.video:
                # clips -> frame batch; the 2D tokenizer reconstructs frames
                # independently (`pit/dataset/video_data.py` role + the FVD
                # scorer the reference never wired, fvd_score.py)
                vid = np.asarray(batch["video"])  # (B, T, H, W, C)
                bsz, tlen = vid.shape[:2]
                batch = dict(batch, img=vid.reshape((-1,) + vid.shape[2:]))
            img = shard_batch(mesh, {"img": batch["img"]})["img"]
            out = step(params, inc_vars, lpips.variables, img, jax.random.fold_in(jax.random.PRNGKey(2), i))
            if multi:
                # data-sharded outputs are not fully addressable on any one
                # host; gather the metric rows so every process prints the
                # same global numbers (torch all_gather role, eval.py:166-203)
                from jax.experimental import multihost_utils

                gathered = multihost_utils.process_allgather(
                    {k: out[k] for k in list(acc) + ["indices"] if out.get(k) is not None},
                    tiled=True,
                )
                out = {**out, **gathered}
            for k in acc:
                acc[k].append(np.asarray(out[k]))
            if out["indices"] is not None:
                idx = np.asarray(out["indices"]).reshape(-1)
                if idx.max() < hist.shape[0]:
                    hist += np.bincount(idx, minlength=hist.shape[0])
            if args.save:
                from PIL import Image

                if multi:
                    # this host's rows, in local-batch order (shard iteration
                    # order is not contractually row order - sort by offset)
                    shards = sorted(out["rec"].addressable_shards,
                                    key=lambda sh: sh.index[0].start or 0)
                    rec = np.concatenate([np.asarray(sh.data) for sh in shards])
                else:
                    rec = np.asarray(out["rec"])
                for b, fpath in enumerate(batch["fpath"]):
                    fname = fpath.split("/")[-1] + ".png"
                    for arr, d in ((batch["img"][b], src_dir), (rec[b], rec_dir)):
                        u8 = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
                        Image.fromarray(u8).save(os.path.join(d, fname))
            if args.video and i3d_fn is not None:
                rec = np.asarray(out["rec"]).reshape(vid.shape)
                fvd_real.append(i3d_fn(vid))
                fvd_fake.append(i3d_fn(rec))
            total += img.shape[0]
            if args.limit and total >= args.limit:
                break
            if i % 20 == 0:
                print(f"\r{total} images", end="", flush=True)

    print(f"\nevaluated {total} images on {n_dev} device(s)")
    cat = {k: np.concatenate(v) for k, v in acc.items()}
    print(f"PSNR: {cat['psnr'].mean():.4f} (±{cat['psnr'].std():.4f})")
    print(f"SSIM: {cat['ssim'].mean():.4f} (±{cat['ssim'].std():.4f})")
    print(f"MS-SSIM: {np.nanmean(cat['msssim']):.4f} (±{np.nanstd(cat['msssim']):.4f})")
    print(f"LPIPS (AlexNet): {cat['lpips'].mean():.4f} (±{cat['lpips'].std():.4f})")
    m1, s1 = cat["feat_r"].mean(0), np.cov(cat["feat_r"], rowvar=False)
    if args.stats_cache and os.path.exists(args.stats_cache):
        blob = np.load(args.stats_cache)
        m2, s2 = blob["mu"], blob["sigma"]
        print(f"(source stats from {args.stats_cache})")
    else:
        m2, s2 = cat["feat_x"].mean(0), np.cov(cat["feat_x"], rowvar=False)
        if args.stats_cache:
            np.savez(args.stats_cache, mu=m2, sigma=s2)
            print(f"(source stats cached to {args.stats_cache})")
    print(f"FID: {calculate_frechet_distance(m1, s1, m2, s2):.4f}")
    if fvd_real:
        from vqvae_from_gaussian_vae_tpu.evaluations.fvd import fvd_from_features

        print(f"FVD: {fvd_from_features(np.concatenate(fvd_real), np.concatenate(fvd_fake)):.4f}")
    if hist.sum() > 0:
        usage = (hist > 0).mean()
        p = hist / hist.sum()
        ent = -(p * np.log2(p + 1e-12)).sum()
        print(f"codebook usage: {usage * 100:.2f}%  entropy: {ent:.2f} bits")


if __name__ == "__main__":
    main()
