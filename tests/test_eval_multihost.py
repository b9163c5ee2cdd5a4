"""2-process x 4-device eval.py parity vs single-process 8-device: the
sharded metric sweep must print the same global PSNR/SSIM/LPIPS/FID and
codebook stats regardless of the process topology (the reference's
torch.distributed eval path, `/root/reference/eval.py:83-107,166-203`, has
no such test below real hardware)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "eval_multihost_worker.py")

PKG = "vqvae_from_gaussian_vae_tpu"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _tiny_cfg(path):
    enc = {
        "target": f"{PKG}.models.unet.Encoder",
        "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                   "resolution": 32, "in_channels": 3, "out_ch": 3, "ch": 32,
                   "ch_mult": [1, 2], "num_res_blocks": 1,
                   "attn_resolutions": [], "dropout": 0.0},
    }
    dec = {"target": f"{PKG}.models.unet.Decoder", "params": dict(enc["params"])}
    cfg = {"model": {
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "loss_config": None,
            "regularizer_config": {
                "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
                "params": {"format": "bchw", "group": 4, "n_samples": 256,
                           "seed": 7, "backend": "xla"},
            },
            "encoder_config": enc,
            "decoder_config": dec,
        },
    }}
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def _make_images(folder, n=8, size=32):
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(11)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(folder, f"img_{i:02d}.png"))


METRIC_RE = {
    "psnr": r"PSNR: ([\d.]+)",
    "ssim": r"SSIM: ([\d.]+)",
    "lpips": r"LPIPS \(AlexNet\): ([\d.]+)",
    "fid": r"FID: ([\d.]+)",
    "usage": r"codebook usage: ([\d.]+)%",
    "entropy": r"entropy: ([\d.]+) bits",
    "count": r"evaluated (\d+) images",
}


def _parse(stdout):
    out = {}
    for k, pat in METRIC_RE.items():
        m = re.search(pat, stdout)
        assert m, f"{k} missing from eval output:\n{stdout[-3000:]}"
        out[k] = float(m.group(1))
    return out


def _launch(nproc, port, eval_args, cache_dir=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    if cache_dir:
        env["GVQ_TEST_COMPILE_CACHE"] = str(cache_dir)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port)] + eval_args,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return logs


def test_two_process_eval_matches_single_process(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    _tiny_cfg(cfg_path)
    _make_images(tmp_path / "images")
    eval_args = ["--base", str(cfg_path), "--dataset", str(tmp_path / "images"),
                 "--img_size", "32", "--bs", "1"]

    cache = tmp_path / "xla_cache"
    single = _parse(_launch(1, _free_port(), eval_args, cache)[0])
    logs = _launch(2, _free_port(), eval_args, cache)
    multi = [_parse(log) for log in logs]

    assert single["count"] == 8
    for rank_metrics in multi:
        # every process prints identical GLOBAL numbers (process_allgather)
        assert rank_metrics["count"] == 8
        for k in ("psnr", "ssim", "lpips", "fid", "usage", "entropy"):
            np.testing.assert_allclose(
                rank_metrics[k], single[k], rtol=2e-3, atol=2e-3,
                err_msg=f"{k} diverged between 1-process and 2-process eval",
            )
