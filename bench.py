#!/usr/bin/env python
"""Headline benchmark: 256x256 encode + 2^16-codebook quantize + decode
images/sec/chip on the flagship sd3unet_gq_0.25 model (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

vs_baseline is the fraction of the analytic single-chip roofline
(utils/flops.py; the reference repo publishes no numbers - BASELINE.json
`published` is {} - so roofline fraction is the honest denominator; the
driver-set north star is 0.95).

Measurement robustness (the round-2 record was lost to a transport flake):
this file is a SUPERVISOR that never imports jax itself. All device work
runs in worker subprocesses (`python bench.py --worker <stage>`), so every
retry gets a full client re-init. Stages:

  probe   - tiny jit + host fetch; retried with backoff to wait out a dead
            tunnel window before burning the compile budget.
  measure - the real benchmark (round-2 logic); >=2 attempts, best kept.

On total failure the sentinel line reports the stage reached and the last
error, instead of a bare zero. SIGTERM/SIGINT also flush the best-so-far
result, so an external kill still lands a record.

Timing note: on the tunneled axon platform `block_until_ready` does not
reliably block, so timing brackets a device->host fetch of a dependent
scalar computed from every iteration's output.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

METRIC = "images/sec/chip 256x256 encode+quantize+decode"


# --------------------------------------------------------------------------
# workers (run in subprocesses; these DO import jax)
# --------------------------------------------------------------------------

def _worker_env_setup():
    # persistent compile cache keeps retry compiles cheap
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(HERE, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _progress(out_path, stage):
    with open(out_path + ".progress", "a") as f:
        f.write(stage + "\n")


def worker_probe(out_path):
    """Tiny jit + fetch proves the device tunnel is alive end-to-end."""
    _worker_env_setup()
    _progress(out_path, "import")
    import jax
    import jax.numpy as jnp
    import numpy as np
    _progress(out_path, "devices")
    devs = jax.devices()
    _progress(out_path, "compile+run")
    y = np.asarray(jax.jit(lambda x: x * 2 + 1)(jnp.ones((128, 128))))
    assert float(y[0, 0]) == 3.0
    with open(out_path, "w") as f:
        json.dump({"ok": True, "platform": str(devs[0].platform)}, f)


def worker_measure_vit(out_path):
    """Secondary official record: the bsqvit_gq_0.25 flagship's e2e
    throughput (VERDICT r3 #5 — the second backbone must be driver-visible,
    not doc-only).  Reported as img/s with BOTH the analytic-roofline
    fraction and the achievable fraction (attention matmuls at the
    D=64-limited MXU rate, utils/flops.py:vit_train_attention_extra)."""
    _worker_env_setup()
    _progress(out_path, "import")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    batch = int(os.environ.get("BENCH_VIT_BATCH", "16"))
    iters = int(os.environ.get("BENCH_VIT_ITERS", "30"))

    _progress(out_path, "build")
    cfg = load_config(os.path.join(HERE, "configs", "bsqvit_gq_0.25.yaml"))
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    enc_p = cfg["model"]["params"]["encoder_config"]["params"]
    dec_p = cfg["model"]["params"]["decoder_config"]["params"]
    enc_p["dtype"] = "bfloat16"
    if isinstance(dec_p, dict):
        dec_p["dtype"] = "bfloat16"

    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    module = engine.module

    def step(params, x, rng):
        z, reg_log = module.apply(
            {"params": params}, x, return_reg_log=True, train=False,
            method="encode", rngs={"sample": rng},
        )
        xrec = module.apply({"params": params}, z, method="decode")
        return jnp.float32(jnp.sum(xrec[0, 0, 0])) + reg_log["indices"].reshape(-1)[0]

    fn = jax.jit(step)
    params = jax.tree.map(jnp.asarray, engine.params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                           jnp.float32) * 2 - 1
    rng = jax.random.PRNGKey(2)
    _progress(out_path, "compile")
    np.asarray(fn(params, x, rng))
    _progress(out_path, "run")
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    best_dt = float("inf")
    for _t in range(trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + fn(params, x, jax.random.fold_in(rng, i))
        _ = np.asarray(acc)
        best_dt = min(best_dt, time.perf_counter() - t0)
    img_per_s = batch * iters / best_dt

    vit_cfg = dict(patch_size=8, image_size=256,
                   width=enc_p.get("width", 768),
                   layers=enc_p.get("layers", 12),
                   z_channels=enc_p.get("z_channels", 16))
    fl = (F.vit_flops(vit_cfg) + F.vit_decoder_flops(vit_cfg)
          + F.gq_search_flops(1024, 16, 65536))
    # attention matmuls cannot exceed min(D,128)/128 of MXU peak; the
    # achievable denominator charges that (docs/kernels.md round 2f)
    extra = 2 * F.vit_train_attention_extra(vit_cfg, trainable=False)
    peak = F.TPU_PEAKS["v5e_bf16"]
    # full hardware ceiling: achievable + the non-matmul hardware floors —
    # LayerNorm HBM traffic (2 trunks, bf16 read+write per site) and the
    # GQ search's K=32 contraction floor.  BOTH denominators live in this
    # artifact so the README headline and the JSON cannot diverge
    # (docs/kernels.md round 5: future targets bind to achievable_frac;
    # hardware_ceiling_frac is the context number).
    byte_flops = peak / F.TPU_HBM_BW["v5e"]
    hw_extra = (extra
                + 2 * F.vit_layernorm_elems(vit_cfg) * 2 * 2 * byte_flops
                + F.gq_search_extra(1024, 16, 65536))
    with open(out_path, "w") as f:
        json.dump({
            "metric": "images/sec/chip 256x256 encode+quantize+decode "
                      "(bsqvit_gq_0.25, bf16, bs=%d)" % batch,
            "value": round(img_per_s, 3),
            "unit": "img/s",
            "vs_baseline": round(img_per_s / (peak / (fl + extra)), 4),
            "roofline_frac": round(img_per_s / (peak / fl), 4),
            "achievable_frac": round(img_per_s / (peak / (fl + extra)), 4),
            "achievable_ms_bs": round((fl + extra) * batch / peak * 1e3, 2),
            "hardware_ceiling_frac": round(
                img_per_s / (peak / (fl + hw_extra)), 4),
            "hardware_ceiling_ms_bs": round(
                (fl + hw_extra) * batch / peak * 1e3, 2),
        }, f)


def worker_measure_train(out_path, config_name):
    """Train-step record (VERDICT r4 #3 — the four train phases must be
    driver-visible, not doc-only): one GAN phase pair (ae + disc) at the
    operating point (bs=16, bf16 overlay) via scripts/bench_train.run()."""
    _worker_env_setup()
    os.environ.setdefault("BENCH_BATCH", "16")
    os.environ.setdefault("BENCH_ITERS", "15")
    os.environ.setdefault("BENCH_TRIALS", "3")
    os.environ["BENCH_CONFIG"] = config_name
    _progress(out_path, "import")
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    import bench_train
    _progress(out_path, "run")
    res = bench_train.run()
    with open(out_path, "w") as f:
        json.dump(res, f)


def worker_measure(out_path):
    """The actual benchmark (e2e path of the reference
    /root/reference/pit/models/autoencoder.py:359-398 at speed)."""
    _worker_env_setup()
    _progress(out_path, "import")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    dtype = os.environ.get("BENCH_DTYPE", "bf16")

    _progress(out_path, "build")
    cfg = load_config(os.path.join(HERE, "configs", "sd3unet_gq_0.25.yaml"))
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    if dtype == "bf16":
        for key in ("encoder_config", "decoder_config"):
            # decoder params alias encoder's via ${...}; set on resolved dicts
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

    _progress(out_path, "compile")
    np.asarray(fn(params, x, rng))  # compile + warm
    _progress(out_path, "run")
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

    with open(out_path, "w") as f:
        json.dump({
            "metric": "%s (sd3unet_gq_0.25, %s, bs=%d)" % (METRIC, dtype, batch),
            "value": round(img_per_s, 3),
            "unit": "img/s",
            "vs_baseline": round(img_per_s / roofline_img_per_s, 4),
        }, f)


# --------------------------------------------------------------------------
# supervisor (never imports jax; cannot hang on the transport)
# --------------------------------------------------------------------------

def _run_worker(stage, timeout):
    """Run one worker attempt in a fresh process (= full client re-init).

    Returns (result_dict_or_None, error_str, last_progress_stage)."""
    fd, out_path = tempfile.mkstemp(prefix="bench_%s_" % stage, suffix=".json")
    os.close(fd)
    os.unlink(out_path)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", stage,
         "--out", out_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    err = None
    try:
        rc = proc.wait(timeout=timeout)
        if rc != 0:
            err = "rc=%d" % rc
    except subprocess.TimeoutExpired:
        err = "timeout%ds" % int(timeout)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
    progress = ""
    try:
        with open(out_path + ".progress") as f:
            lines = [l.strip() for l in f if l.strip()]
            progress = lines[-1] if lines else ""
        os.unlink(out_path + ".progress")
    except OSError:
        pass
    result = None
    if err is None:
        try:
            with open(out_path) as f:
                result = json.load(f)
        except (OSError, ValueError) as e:
            err = "bad-output:%s" % e
    try:
        os.unlink(out_path)
    except OSError:
        pass
    return result, err, progress


class Supervisor:
    def __init__(self):
        self.best = None
        self.stage = "start"
        self.attempts = []  # (stage, err, progress)
        self.done = False

    def emit(self, final=True):
        if self.best is not None:
            line = json.dumps(self.best)
        else:
            fails = ";".join("%s:%s@%s" % a for a in self.attempts[-4:]) or "none"
            line = json.dumps({
                "metric": "%s (FAILED stage=%s attempts=%d last=[%s])"
                          % (METRIC, self.stage, len(self.attempts), fails),
                "value": 0.0,
                "unit": "img/s",
                "vs_baseline": 0.0,
            })
        print(line, flush=True)
        self.done = True

    def on_signal(self, signum, frame):
        # an external kill must still land a record
        if not self.done:
            self.emit()
        os._exit(0 if self.best is not None else 3)

    def run(self):
        # the tunnel's down-windows run on ~hour timescales; the budget must
        # outlast one. An external kill (driver watchdog) still lands the
        # best-so-far via the SIGTERM handler, so a large budget is safe.
        total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "3600"))
        deadline = time.time() + total_budget
        signal.signal(signal.SIGTERM, self.on_signal)
        signal.signal(signal.SIGINT, self.on_signal)

        # stage 1: probe — wait out a dead tunnel window cheaply
        self.stage = "probe"
        probe_deadline = min(deadline - 900, time.time()
                             + float(os.environ.get("BENCH_PROBE_BUDGET", "1500")))
        probe_ok, backoff = False, 10.0
        while time.time() < probe_deadline:
            t_attempt = min(150.0, max(30.0, probe_deadline - time.time()))
            res, err, prog = _run_worker("probe", t_attempt)
            if res is not None:
                probe_ok = True
                break
            self.attempts.append(("probe", err, prog))
            if time.time() + backoff >= probe_deadline:
                break
            time.sleep(backoff)
            backoff = min(backoff * 2, 60.0)
        # even if the probe never came up, still spend the budget on real
        # attempts — fight for the measurement, don't forfeit it

        # stage 2: measure — >=2 attempts; early-exit on a north-star result
        self.stage = "measure"
        target = float(os.environ.get("BENCH_TARGET", "0.95"))
        max_attempts = int(os.environ.get("BENCH_MAX_ATTEMPTS", "4"))
        n = 0
        while n < max_attempts:
            remaining = deadline - time.time()
            if remaining < 120 and (self.best is not None or n >= 1):
                break
            t_attempt = max(120.0, min(900.0, remaining - 30.0))
            res, err, prog = _run_worker("measure", t_attempt)
            n += 1
            if res is not None:
                if self.best is None or res["value"] > self.best["value"]:
                    self.best = res
                if res.get("vs_baseline", 0.0) >= target:
                    break
                # below target: retry only if another full attempt fits
                if deadline - time.time() < 400:
                    break
            else:
                self.attempts.append(("measure", err, prog))
                if not probe_ok and time.time() > deadline - 150:
                    break

        # headline lands FIRST: a kill during the secondary stage must not
        # cost the official record
        self.emit()

        # stage 3: the bsqvit secondary record -> BENCH_VIT.json (never on
        # stdout: the driver contract is ONE headline JSON line).  Only
        # spends budget the headline didn't need.
        self.stage = "measure_vit"
        vit_attempts = int(os.environ.get("BENCH_VIT_ATTEMPTS", "2"))
        vit_best = None
        for _ in range(vit_attempts):
            remaining = deadline - time.time()
            if remaining < 180 or (vit_best is not None):
                break
            res, err, prog = _run_worker("measure_vit",
                                         max(180.0, min(900.0, remaining - 30.0)))
            if res is not None:
                vit_best = res
            else:
                self.attempts.append(("measure_vit", err, prog))
        if vit_best is not None:
            try:
                with open(os.path.join(HERE, "BENCH_VIT.json"), "w") as f:
                    json.dump(vit_best, f)
                    f.write("\n")
                print("bsqvit secondary record -> BENCH_VIT.json: %s img/s "
                      "(%.3f of achievable)" % (vit_best["value"],
                                                vit_best["vs_baseline"]),
                      file=sys.stderr)
            except OSError as e:
                print("BENCH_VIT.json write failed: %s" % e, file=sys.stderr)

        # stage 4: the train-step record -> BENCH_TRAIN.json (VERDICT r4
        # #3).  Per-config worker processes so one config's failure cannot
        # lose the other's result; only spends budget the earlier stages
        # left over.
        self.stage = "measure_train"
        train_out = {}
        for cfg_name in ("sd3unet_gq_0.25", "bsqvit_gq_0.25"):
            remaining = deadline - time.time()
            if remaining < 240:
                break
            res, err, prog = _run_worker("train:" + cfg_name,
                                         max(240.0, min(900.0, remaining - 30.0)))
            if res is not None:
                train_out[cfg_name] = res
            else:
                self.attempts.append(("train:" + cfg_name, err, prog))
                # one retry if budget allows
                remaining = deadline - time.time()
                if remaining >= 300:
                    res, err, prog = _run_worker(
                        "train:" + cfg_name,
                        max(240.0, min(900.0, remaining - 30.0)))
                    if res is not None:
                        train_out[cfg_name] = res
                    else:
                        self.attempts.append(("train:" + cfg_name, err, prog))
        if train_out:
            # keep prior entries for configs that failed this run (stamped
            # stale) so the file never silently loses a config
            path = os.path.join(HERE, "BENCH_TRAIN.json")
            try:
                with open(path) as f:
                    prev = json.load(f)
                for k, v in prev.items():
                    if k not in train_out and isinstance(v, dict):
                        train_out[k] = dict(v, stale=True)
            except (OSError, ValueError):
                pass
            try:
                with open(path, "w") as f:
                    json.dump(train_out, f, indent=1)
                    f.write("\n")
                print("train-step record -> BENCH_TRAIN.json: %s"
                      % ", ".join("%s %.1f img/s" % (k, v.get("value", 0))
                                  for k, v in train_out.items()),
                      file=sys.stderr)
            except OSError as e:
                print("BENCH_TRAIN.json write failed: %s" % e, file=sys.stderr)

        return 0 if self.best is not None else 3


def main():
    if "--worker" in sys.argv:
        stage = sys.argv[sys.argv.index("--worker") + 1]
        out = sys.argv[sys.argv.index("--out") + 1]
        if stage.startswith("train:"):
            worker_measure_train(out, stage.split(":", 1)[1])
            return 0
        {"probe": worker_probe, "measure": worker_measure,
         "measure_vit": worker_measure_vit}[stage](out)
        return 0
    return Supervisor().run()


if __name__ == "__main__":
    sys.exit(main())
