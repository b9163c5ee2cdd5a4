#!/usr/bin/env python
"""Headline benchmark: 256x256 encode + 2^16-codebook quantize + decode
images/sec/chip on the flagship sd3unet_gq_0.25 model (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

vs_baseline is the fraction of the analytic single-chip roofline
(utils/flops.py; the reference repo publishes no numbers - BASELINE.json
`published` is {} - so roofline fraction is the honest denominator; the
driver-set north star is 0.95).

Timing note: on the tunneled axon platform `block_until_ready` does not
reliably block, so timing brackets a device->host fetch of a dependent
scalar computed from every iteration's output.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _watchdog(seconds: float):
    """The tunneled TPU transport can hang indefinitely; if the benchmark
    makes no progress within the budget, emit a sentinel JSON line so the
    driver still records the run, then hard-exit."""

    def fire():
        print(json.dumps({
            "metric": "images/sec/chip 256x256 encode+quantize+decode (TIMEOUT: device unreachable)",
            "value": 0.0,
            "unit": "img/s",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _watchdog(float(os.environ.get("BENCH_TIMEOUT", "1500")))
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    dtype = os.environ.get("BENCH_DTYPE", "bf16")

    cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs", "sd3unet_gq_0.25.yaml"))
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    if dtype == "bf16":
        for key in ("encoder_config", "decoder_config"):
            # decoder params alias encoder's via ${...}; set on the resolved dicts
            cfg["model"]["params"][key]["params"]["dtype"] = "bfloat16"

    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    module = engine.module

    # params must be jit ARGUMENTS: captured as closure constants they get
    # baked into the compile payload (hundreds of MB), which the tunneled
    # remote-compile transport rejects (HTTP 413)
    def step(params, x, rng):
        z, reg_log = module.apply(
            {"params": params}, x, return_reg_log=True, train=False,
            method="encode", rngs={"sample": rng},
        )
        xrec = module.apply({"params": params}, z, method="decode")
        # dependent scalar forces full execution at fetch time
        return jnp.float32(jnp.sum(xrec[0, 0, 0])) + reg_log["indices"][0, 0, 0, 0]

    fn = jax.jit(step)
    params = jax.tree.map(jnp.asarray, engine.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 256, 256, 3), jnp.float32) * 2 - 1
    rng = jax.random.PRNGKey(2)

    s = np.asarray(fn(params, x, rng))  # compile + warm
    # best of several trials: the tunnel transport has degraded windows that
    # would otherwise masquerade as device throughput
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    best_dt = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + fn(params, x, jax.random.fold_in(rng, i))
        _ = np.asarray(acc)  # host fetch: waits for the whole chain
        best_dt = min(best_dt, time.perf_counter() - t0)
    img_per_s = batch * iters / best_dt

    enc_cfg = cfg["model"]["params"]["encoder_config"]["params"]
    enc_cfg = {k: v for k, v in enc_cfg.items() if k != "dtype"}
    reg_cfg = cfg["model"]["params"]["regularizer_config"]["params"]
    latent = enc_cfg["resolution"] // 2 ** (len(enc_cfg["ch_mult"]) - 1)
    rows = latent * latent * (enc_cfg["z_channels"] // reg_cfg["group"])
    flops_per_img = (
        F.unet_encoder_flops(enc_cfg)
        + F.unet_decoder_flops(enc_cfg)
        + F.gq_search_flops(rows, reg_cfg["group"], reg_cfg["n_samples"])
    )
    # the MXU is the ceiling regardless of io dtype: XLA lowers fp32 convs
    # to multi-pass bf16 (xla_allow_excess_precision), so one roofline serves
    peak = F.TPU_PEAKS["v5e_bf16"]
    roofline_img_per_s = peak / flops_per_img

    watchdog.cancel()
    print(json.dumps({
        "metric": "images/sec/chip 256x256 encode+quantize+decode (sd3unet_gq_0.25, %s, bs=%d)" % (dtype, batch),
        "value": round(img_per_s, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / roofline_img_per_s, 4),
    }))


if __name__ == "__main__":
    main()
