#!/usr/bin/env python
"""GAN train-step benchmark: ae phase (disc active) + disc phase on the
flagship sd3unet_gq_0.25 at 256x256, reported as img/s and as fractions of
the analytic train-step roofline (utils/flops.py:gan_train_step_flops).

Env knobs:
  BENCH_CONFIG=sd3unet_gq_0.25  (any configs/<name>.yaml, e.g. bsqvit_gq_0.25;
                                 the roofline denominator follows the backbone)
  BENCH_BATCH=8  BENCH_ITERS=20  BENCH_TRIALS=3
  BENCH_DTYPE=fp32|bf16   (bf16 = the configs/overlays/bf16_compute.yaml
                           overlay: engine + loss compute in bfloat16)
  BENCH_PROFILE=/tmp/trace  (capture a jax.profiler trace of a few steps)

Prints one JSON line per phase plus the pair average.  Timing brackets a
host fetch of a dependent log scalar (see bench.py timing note: on the
tunneled axon platform block_until_ready does not reliably block).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run():
    """Run the two-phase benchmark for the env-selected config; returns the
    result dict (also printed as the JSON line by main()).  bench.py's
    measure_train stage calls this directly so the train-step numbers land
    in a driver-visible BENCH_TRAIN.json every round."""
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
    from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    profile_dir = os.environ.get("BENCH_PROFILE")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_name = os.environ.get("BENCH_CONFIG", "sd3unet_gq_0.25")
    bases = [os.path.join(root, "configs", f"{base_name}.yaml")]
    if dtype == "bf16":
        bases.append(os.path.join(root, "configs", "overlays", "bf16_compute.yaml"))
    cfg = load_config(bases)
    cfg["model"]["params"].pop("ckpt_path", None)

    engine = instantiate_from_config(cfg["model"])
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (batch, 256, 256, 3)).astype(np.float32)
    state = builder.init_state(jax.random.PRNGKey(0), {"img": x})
    # put the step past disc_start so both phases run their real graphs
    state = state.replace(step=jnp.int32(engine.loss.disc_start + 10))
    batch_dev = {"img": jnp.asarray(x)}

    def run(step_fn, label):
        nonlocal state
        state, log = step_fn(state, batch_dev)  # compile + warm
        key = next(k for k in log if k.endswith("loss/total") or k.endswith("loss/disc"))
        _ = np.asarray(log[key])
        best = float("inf")
        for _t in range(trials):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(iters):
                state, log = step_fn(state, batch_dev)
                acc = acc + log[key]
            _ = np.asarray(acc)
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        return ms

    ae_fn = lambda s, b: builder.ae_step(s, b, disc_active=True)
    ae_ms = run(ae_fn, "ae")
    disc_ms = run(builder.disc_step, "disc")

    if os.environ.get("BENCH_BREAKDOWN"):
        # sub-phase timings to localise the non-roofline overhead
        import jax as _jax

        def time_chain(fn, *args):
            out = np.asarray(fn(*args))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                acc = jnp.float32(0.0)
                for i in range(iters):
                    acc = acc + fn(*args)
                _ = np.asarray(acc)
                best = min(best, time.perf_counter() - t0)
            return best / iters * 1e3

        logvar = state.loss_params["logvar"]

        @_jax.jit
        def fwd_loss(state, x):
            rng = _jax.random.fold_in(state.rng, 3)
            v, _ = builder._ae_loss(
                (state.engine_params, state.loss_params["logvar"]),
                state, x, rng, False)
            return v

        @_jax.jit
        def grad_no_adapt(state, x):
            rng = _jax.random.fold_in(state.rng, 3)
            g, _ = _jax.grad(builder._ae_loss, has_aux=True)(
                (state.engine_params, state.loss_params["logvar"]),
                state, x, rng, False)
            return g[0]["encoder"]["conv_in"]["bias"][0]

        @_jax.jit
        def grad_adapt(state, x):
            rng = _jax.random.fold_in(state.rng, 3)
            g, _ = _jax.grad(builder._ae_loss, has_aux=True)(
                (state.engine_params, state.loss_params["logvar"]),
                state, x, rng, True)
            return g[0]["encoder"]["conv_in"]["bias"][0]

        zero_grads = _jax.tree.map(jnp.zeros_like, (state.engine_params, logvar))

        @_jax.jit
        def opt_only(state, grads):
            updates, _ = builder.ae_opt.update(
                grads, state.ae_opt_state,
                (state.engine_params, state.loss_params["logvar"]))
            import optax as _optax
            new_engine, _lv = _optax.apply_updates(
                (state.engine_params, state.loss_params["logvar"]), updates)
            return new_engine["encoder"]["conv_in"]["bias"][0]

        x_dev = batch_dev["img"]
        print(json.dumps({
            "ae_fwd_loss_ms": round(time_chain(fwd_loss, state, x_dev), 2),
            "ae_grad_no_adapt_ms": round(time_chain(grad_no_adapt, state, x_dev), 2),
            "ae_grad_adapt_ms": round(time_chain(grad_adapt, state, x_dev), 2),
            "ae_opt_only_ms": round(time_chain(opt_only, state, zero_grads), 2),
        }), flush=True)

    if profile_dir:
        # separate captures so trace_buckets.py can attribute per phase
        with jax.profiler.trace(os.path.join(profile_dir, "ae")):
            for _ in range(3):
                state, log = ae_fn(state, batch_dev)
            _ = np.asarray(log[next(iter(log))])
        with jax.profiler.trace(os.path.join(profile_dir, "disc")):
            for _ in range(3):
                state, log = builder.disc_step(state, batch_dev)
            _ = np.asarray(log[next(iter(log))])

    enc_cfg = {k: v for k, v in
               cfg["model"]["params"]["encoder_config"]["params"].items()
               if k != "dtype"}
    extra = {"ae_step": 0.0, "disc_step": 0.0}
    if "vit" in cfg["model"]["params"]["encoder_config"]["target"].lower():
        fl = F.gan_train_step_flops_from_backbone(
            F.vit_flops(enc_cfg), F.vit_decoder_flops(enc_cfg), img=256,
            ndf=160, n_layers=6)
        # achievable ceiling: attention matmuls at the depth-limited MXU
        # rate + the flash backward's in-kernel softmax recompute
        # (utils/flops.py:vit_train_attention_extra); two trunks
        extra["ae_step"] = 2 * F.vit_train_attention_extra(enc_cfg)
        extra["disc_step"] = 2 * F.vit_train_attention_extra(
            enc_cfg, trainable=False)
    else:
        fl = F.gan_train_step_flops(enc_cfg, img=256, ndf=160, n_layers=6)
        # Achievable ceiling: the FLOP roofline ignores GroupNorm traffic.
        # Round-4 trace calibration (docs/kernels.md): in fwd-only graphs
        # the GN stats+normalize ride the conv fusions' epilogues (~1
        # exposed bandwidth pass over the activations); the ae backward
        # adds unfusable re-reads of x and dy (~2 more passes).  Charged
        # as FLOP-equivalents at peak/HBM_BW bytes-to-flops.
        gn_bytes = F.unet_groupnorm_elems(enc_cfg) * 2  # bf16
        byte_flops = F.TPU_PEAKS["v5e_bf16"] / F.TPU_HBM_BW["v5e"]
        extra["ae_step"] = 3 * gn_bytes * byte_flops
        extra["disc_step"] = 1 * gn_bytes * byte_flops
    extra["pair_avg"] = (extra["ae_step"] + extra["disc_step"]) / 2.0
    peak = F.TPU_PEAKS["v5e_bf16"]
    pair_ms = (ae_ms + disc_ms) / 2.0
    out = {
        "ae_step_ms": round(ae_ms, 2),
        "disc_step_ms": round(disc_ms, 2),
        # pair throughput: one ae + one disc step consumes 2 batches
        "pair_img_per_s": round(2 * batch / ((ae_ms + disc_ms) / 1e3), 2),
    }
    for name, ms, key in (("ae", ae_ms, "ae_step"),
                          ("disc", disc_ms, "disc_step"),
                          ("pair", pair_ms, "pair_avg")):
        roof_ms = fl[key] * batch / peak * 1e3
        out[f"{name}_roofline_frac"] = round(roof_ms / ms, 4)
        if extra[key]:
            ach_ms = (fl[key] + extra[key]) * batch / peak * 1e3
            out[f"{name}_achievable_frac"] = round(ach_ms / ms, 4)
    return {
        "metric": f"GAN train-step pair img/s ({base_name}, {dtype}, bs={batch})",
        "value": out["pair_img_per_s"], "unit": "img/s",
        "vs_baseline": out["pair_roofline_frac"], **out,
    }


def main():
    print(json.dumps(run()))


if __name__ == "__main__":
    main()
