#!/usr/bin/env python
"""Isolated fwd+bwd timings for the encoder/decoder under the fused-train
custom-VJP kernels vs the plain XLA path (GVQ_FUSED_TRAIN toggle).

Usage: python scripts/bench_resample_train.py [bs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config([os.path.join(root, "configs", "sd3unet_gq_0.25.yaml"),
                       os.path.join(root, "configs", "overlays", "bf16_compute.yaml")])
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    module = engine.module
    params = jax.tree.map(jnp.asarray, engine.params)

    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, 256, 256, 3)) * 2 - 1
    z = jax.random.normal(jax.random.PRNGKey(2), (bs, 32, 32, 16))

    def time_fn(fn, *args, iters=20):
        out = np.asarray(fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(iters):
                acc = acc + fn(*args)
            np.asarray(acc)
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    results = {}
    for fused in ("1", "0"):
        os.environ["GVQ_FUSED_TRAIN"] = fused
        tag = "fused" if fused == "1" else "plain"

        def dec_loss(p, z):
            h = module.apply({"params": p}, z, train=True, method="decode")
            return jnp.sum(h.astype(jnp.float32) ** 2)

        def enc_loss(p, x):
            h, _ = module.apply({"params": p}, x, train=True,
                                unregularized=True, method="encode")
            return jnp.sum(h.astype(jnp.float32) ** 2)

        # reduce over EVERY grad leaf: returning a single element lets XLA
        # dead-code-eliminate the other weight gradients entirely
        def _gsum(g):
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

        dec_g = jax.jit(lambda p, z: _gsum(jax.grad(dec_loss)(p, z)))
        enc_g = jax.jit(lambda p, x: _gsum(jax.grad(enc_loss)(p, x)))
        dec_f = jax.jit(lambda p, z: dec_loss(p, z))
        enc_f = jax.jit(lambda p, x: enc_loss(p, x))

        results[f"dec_fwd_{tag}"] = time_fn(dec_f, params, z)
        results[f"dec_fwdbwd_{tag}"] = time_fn(dec_g, params, z)
        results[f"enc_fwd_{tag}"] = time_fn(enc_f, params, x)
        results[f"enc_fwdbwd_{tag}"] = time_fn(enc_g, params, x)
        for k in list(results):
            if k.endswith(tag):
                print(f"{k}: {results[k]:.2f} ms", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
