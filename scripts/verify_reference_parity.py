#!/usr/bin/env python
"""The given-assets rFID parity runbook: convert -> eval -> assert deltas.

One command that closes the reference-parity chain end-to-end
(reference `/root/reference/eval.py:207-260` + `Readme.md:118-126`):

    python scripts/verify_reference_parity.py \
        --assets_dir reference_assets [--img_size 256] [--limit 64]

`--assets_dir` is expected to contain:
    model.ckpt      the reference Lightning checkpoint (HF release or own run)
    images/         an image folder (or pass --dataset separately)
    pt_inception*.pth   (optional) the pytorch-fid InceptionV3 weights;
                        without it the rFID leg is skipped

Pipeline (both frameworks consume the SAME checkpoint and the SAME images):
    1. convert    our engine loads the torch .ckpt (strict=False semantics)
                  and writes native .msgpack params
    2. reference  the reference's own AutoencodingEngine (torch, run
                  in-process with its heavy deps stubbed) does
                  encode -> indices -> dequant per batch
    3. ours       this framework does the same
    4. assert     token-index match >= 99.9%, |dPSNR| <= 0.05 dB,
                  |rFID_ours - rFID_torch| <= 0.05 (the BASELINE.json gate)

When the assets are absent the script DEGRADES to a dress rehearsal: it
mints a synthetic bundle with the exact upstream formats (a random-weight
reference-architecture Lightning .ckpt, random PNGs, a random-weight
pt_inception .pth with the exact torchvision/pytorch-fid key layout) into a
temp dir and runs the identical pipeline on it - every code path above is
still exercised for real; only the absolute metric values are meaningless.

Exit code 0 = all asserted deltas within tolerance; 1 = a parity failure;
the last stdout line is a JSON summary either way.
"""

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.append(REFERENCE)  # the torch oracle (run in-process, never copied)

import numpy as np

# tolerances (BASELINE.json north star: rFID within 0.05 of the reference)
TOL = {"index_match_min": 0.999, "psnr_delta_db": 0.05, "rfid_delta": 0.05}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--assets_dir", default="", help="folder with model.ckpt / images/ / pt_inception*.pth")
    p.add_argument("--base", default=os.path.join(REPO, "configs", "sd3unet_gq_0.25.yaml"))
    p.add_argument("--ckpt", default="", help="override: reference .ckpt path")
    p.add_argument("--dataset", default="", help="override: image folder or .txt list")
    p.add_argument("--inception_weights", default="", help="override: pt_inception .pth")
    p.add_argument("--img_size", default=256, type=int)
    p.add_argument("--bs", default=4, type=int)
    p.add_argument("--limit", default=64, type=int, help="max images")
    p.add_argument("--out", default="", help="where to write the converted .msgpack")
    return p.parse_args()


# --------------------------------------------------------------------------
# synthetic dress-rehearsal bundle (exact upstream formats, random weights)
# --------------------------------------------------------------------------

def make_synthetic_assets(dst: str, base_cfg: str, img_size: int, n_images: int = 8):
    import torch
    from PIL import Image

    from tests.test_engine_reference_parity import _install_stubs

    _install_stubs()
    from pit.models.autoencoder import AutoencodingEngine as TorchEngine

    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    os.makedirs(os.path.join(dst, "images"), exist_ok=True)

    # random-weight reference engine -> Lightning-format .ckpt
    cfg = load_config(base_cfg)
    _reverse_alias_targets(cfg)
    params = dict(cfg["model"]["params"])
    params["regularizer_config"]["params"]["backend"] = "torch"
    torch.manual_seed(0)
    tengine = TorchEngine(
        input_key="img", eval_only=True,
        encoder_config=params["encoder_config"],
        decoder_config=params["decoder_config"],
        regularizer_config=params["regularizer_config"],
        loss_config=params["loss_config"],
    ).eval()
    torch.save({"state_dict": tengine.state_dict()}, os.path.join(dst, "model.ckpt"))

    # random-weight pt_inception .pth with the exact pytorch-fid key layout
    from tests.test_weight_converters import _TorchFIDInception

    torch.manual_seed(1)
    inc = _TorchFIDInception().eval()
    g = torch.Generator().manual_seed(3)
    for mod in inc.modules():
        # kaiming convs + near-identity BN keep activations input-dependent
        # through the 90+ conv stack (fully random weights collapse the 2048-d
        # features to a constant, which would make the rFID delta vacuous)
        if isinstance(mod, torch.nn.Conv2d):
            torch.nn.init.kaiming_normal_(mod.weight, generator=g)
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.zero_()
            mod.running_var.fill_(1.0)
            mod.weight.data.fill_(1.0)
            mod.bias.data.copy_(torch.randn(mod.bias.shape, generator=g) * 0.02)
    torch.save(inc.state_dict(), os.path.join(dst, "pt_inception-synthetic.pth"))

    # random PNGs (smooth noise so recon metrics are non-degenerate)
    rng = np.random.default_rng(7)
    for i in range(n_images):
        lo = rng.uniform(0, 255, (img_size // 8, img_size // 8, 3))
        img = np.kron(lo, np.ones((8, 8, 1)))[:img_size, :img_size]
        img = (img + rng.uniform(-16, 16, img.shape)).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(dst, "images", f"synth_{i:03d}.png"))
    return dst


# --------------------------------------------------------------------------
# the pipeline
# --------------------------------------------------------------------------

def _reverse_alias_targets(node):
    """Rewrite this framework's target strings back to the reference's
    ``pit.*`` names (inverse of utils/config._TARGET_ALIASES) so the torch
    oracle engine instantiates torch modules from the same config."""
    from vqvae_from_gaussian_vae_tpu.utils.config import _TARGET_ALIASES

    inverse = {v: k for k, v in _TARGET_ALIASES.items()}
    if isinstance(node, dict):
        if isinstance(node.get("target"), str) and node["target"] in inverse:
            node["target"] = inverse[node["target"]]
        for v in node.values():
            _reverse_alias_targets(v)
    elif isinstance(node, list):
        for v in node:
            _reverse_alias_targets(v)

def torch_psnr(x: np.ndarray, rec: np.ndarray) -> np.ndarray:
    """Reference get_psnr (`/root/reference/pit/evaluations/psnr.py:17`):
    [-1,1] -> 255 scale, per-image 10*log10(255^2/mse)."""
    a = (x + 1.0) * 127.5
    b = (rec + 1.0) * 127.5
    mse = ((a - b) ** 2).reshape(x.shape[0], -1).mean(1)
    return 10.0 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-12))


def run(args) -> dict:
    import torch

    from tests.test_engine_reference_parity import _install_stubs

    _install_stubs()
    from pit.models.autoencoder import AutoencodingEngine as TorchEngine

    import jax

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.data.dataset import SimpleDataset
    from vqvae_from_gaussian_vae_tpu.evaluations.fid import calculate_frechet_distance
    from vqvae_from_gaussian_vae_tpu.evaluations.psnr import get_psnr
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    summary = {"mode": args.mode, "img_size": args.img_size}

    # ---- stage 1: convert -------------------------------------------------
    print(f"[1/4] convert {args.ckpt} -> native params")
    cfg = load_config(args.base)
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    cfg["model"]["params"]["regularizer_config"]["params"]["backend"] = "auto"
    jengine = instantiate_from_config(cfg["model"])
    jengine.init_params(jax.random.PRNGKey(0))
    missing, unexpected = jengine.load_checkpoint(args.ckpt)
    core_missing = [k for k in missing
                    if k.startswith(("encoder.", "decoder.", "regularization."))]
    print(f"      missing core keys: {len(core_missing)}  "
          f"unexpected(ignored): {len(unexpected)}")
    assert not core_missing, f"conversion left core keys unconverted: {core_missing[:8]}"
    out = args.out or os.path.join(tempfile.gettempdir(), "converted_params.msgpack")
    jengine.save_params(out)
    summary["converted_params"] = out

    # ---- stage 2: reference torch engine, in-process ----------------------
    print("[2/4] reference torch engine sweep")
    rcfg = load_config(args.base)
    _reverse_alias_targets(rcfg)  # pit.* targets so the torch engine builds torch modules
    rparams = dict(rcfg["model"]["params"])
    rparams["regularizer_config"]["params"]["backend"] = "torch"
    torch.manual_seed(0)
    tengine = TorchEngine(
        input_key="img", eval_only=True,
        encoder_config=rparams["encoder_config"],
        decoder_config=rparams["decoder_config"],
        regularizer_config=rparams["regularizer_config"],
        loss_config=rparams["loss_config"],
    ).eval()
    sd = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    tengine.load_state_dict(sd, strict=False)

    ds = SimpleDataset(args.dataset, args.img_size)
    n = min(len(ds), args.limit) if args.limit else len(ds)
    n -= n % args.bs or 0
    n = max(n, args.bs)
    xs = np.stack([ds[i]["img"] for i in range(n)])  # NHWC in [-1,1]

    t_idx, t_rec = [], []
    with torch.no_grad():
        for i in range(0, n, args.bs):
            xb = torch.from_numpy(xs[i:i + args.bs].transpose(0, 3, 1, 2))
            _, log = tengine.encode(xb, return_reg_log=True)
            t_idx.append(log["indices"].numpy())
            t_rec.append(tengine.dequant(log["indices"]).numpy())
    t_idx = np.concatenate(t_idx)
    t_rec = np.concatenate(t_rec).transpose(0, 2, 3, 1)
    t_psnr = torch_psnr(xs, t_rec)

    # ---- stage 3: this framework ------------------------------------------
    print("[3/4] TPU-native engine sweep")
    j_idx, j_rec = [], []
    for i in range(0, n, args.bs):
        _, log = jengine.encode(xs[i:i + args.bs], return_reg_log=True)
        j_idx.append(np.asarray(log["indices"]))
        j_rec.append(np.asarray(jengine.dequant(log["indices"])))
    j_idx = np.concatenate(j_idx).transpose(0, 3, 1, 2)  # match torch NCHW
    j_rec = np.concatenate(j_rec)
    j_psnr = np.asarray(get_psnr(xs, j_rec, zero_mean=True))  # [-1,1] inputs

    # ---- stage 4: deltas ---------------------------------------------------
    print("[4/4] deltas")
    summary["n_images"] = int(n)
    summary["index_match"] = float((j_idx == t_idx).mean())
    summary["psnr_torch"] = round(float(t_psnr.mean()), 4)
    summary["psnr_ours"] = round(float(j_psnr.mean()), 4)
    summary["psnr_delta_db"] = round(abs(float(t_psnr.mean() - j_psnr.mean())), 5)

    if args.inception_weights:
        from vqvae_from_gaussian_vae_tpu.evaluations.inception import (
            InceptionV3, load_inception_weights,
        )
        from tests.test_weight_converters import _TorchFIDInception

        def fid_from(feat_x, feat_r):
            mu1, s1 = feat_x.mean(0), np.cov(feat_x, rowvar=False)
            mu2, s2 = feat_r.mean(0), np.cov(feat_r, rowvar=False)
            return float(calculate_frechet_distance(mu1, s1, mu2, s2))

        # torch leg: pytorch-fid semantics (bilinear resize to 299, [-1,1] in)
        tinc = _TorchFIDInception().eval()
        tinc.load_state_dict(torch.load(args.inception_weights, map_location="cpu",
                                        weights_only=False), strict=True)

        def t_feats(imgs):
            outs = []
            with torch.no_grad():
                for i in range(0, len(imgs), args.bs):
                    xb = torch.from_numpy(imgs[i:i + args.bs].transpose(0, 3, 1, 2))
                    xb = torch.nn.functional.interpolate(
                        xb, size=(299, 299), mode="bilinear", align_corners=False)
                    outs.append(tinc(xb).numpy())
            return np.concatenate(outs)

        # our leg: the framework's InceptionV3 with the converted weights
        jinc = InceptionV3(output_blocks=(3,), resize_input=True, normalize_input=False)
        import jax.numpy as jnp
        template = jinc.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        variables, inc_missing, _ = load_inception_weights(template, args.inception_weights)
        assert inc_missing == [], inc_missing

        def j_feats(imgs):
            outs = []
            for i in range(0, len(imgs), args.bs):
                o = jinc.apply(variables, jnp.asarray(imgs[i:i + args.bs]))[0]
                outs.append(np.asarray(o).reshape(len(o), -1))
            return np.concatenate(outs)

        rfid_t = fid_from(t_feats(xs), t_feats(t_rec))
        rfid_j = fid_from(j_feats(xs), j_feats(j_rec))
        summary["rfid_torch"] = round(rfid_t, 5)
        summary["rfid_ours"] = round(rfid_j, 5)
        summary["rfid_delta"] = round(abs(rfid_t - rfid_j), 5)
    else:
        print("      (no inception weights found - rFID leg skipped)")

    # ---- verdict -----------------------------------------------------------
    fails = []
    if summary["index_match"] < TOL["index_match_min"]:
        fails.append(f"index_match {summary['index_match']:.5f} < {TOL['index_match_min']}")
    if summary["psnr_delta_db"] > TOL["psnr_delta_db"]:
        fails.append(f"psnr_delta {summary['psnr_delta_db']} dB > {TOL['psnr_delta_db']}")
    if "rfid_delta" in summary and summary["rfid_delta"] > TOL["rfid_delta"]:
        fails.append(f"rfid_delta {summary['rfid_delta']} > {TOL['rfid_delta']}")
    summary["pass"] = not fails
    summary["failures"] = fails
    return summary


def main():
    args = parse_args()
    ckpt = args.ckpt or (os.path.join(args.assets_dir, "model.ckpt") if args.assets_dir else "")
    dataset = args.dataset or (os.path.join(args.assets_dir, "images") if args.assets_dir else "")
    if args.assets_dir and not args.inception_weights:
        import glob as _g
        hits = sorted(_g.glob(os.path.join(args.assets_dir, "pt_inception*.pth")))
        args.inception_weights = hits[0] if hits else ""

    if ckpt and os.path.exists(ckpt) and dataset and os.path.exists(dataset):
        args.mode = "full"
        args.ckpt, args.dataset = ckpt, dataset
    else:
        print("=" * 72)
        print("DRESS REHEARSAL: reference assets not found - minting a synthetic")
        print("bundle (exact upstream .ckpt/.pth/image formats, random weights).")
        print("Every pipeline stage below still runs for real; absolute metric")
        print("values are meaningless, only the asserted DELTAS matter.")
        print("=" * 72)
        args.mode = "rehearsal"
        args.img_size = min(args.img_size, 64)  # keep torch-CPU time sane
        args.bs = min(args.bs, 4)
        synth = os.path.join(tempfile.gettempdir(), "gvq_parity_rehearsal")
        make_synthetic_assets(synth, args.base, args.img_size)
        args.ckpt = os.path.join(synth, "model.ckpt")
        args.dataset = os.path.join(synth, "images")
        args.inception_weights = os.path.join(synth, "pt_inception-synthetic.pth")

    summary = run(args)
    print()
    for k in ("mode", "n_images", "index_match", "psnr_torch", "psnr_ours",
              "psnr_delta_db", "rfid_torch", "rfid_ours", "rfid_delta"):
        if k in summary:
            print(f"  {k:>14}: {summary[k]}")
    print(f"  {'VERDICT':>14}: {'PASS' if summary['pass'] else 'FAIL ' + '; '.join(summary['failures'])}")
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
