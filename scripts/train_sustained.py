#!/usr/bin/env python
"""Sustained-training demonstration on the real chip (VERDICT r3 #4).

The reference's entire validation story is "trainer.fit runs"
(`/root/reference/main.py:855-861`); this script demonstrates the same
end-to-end on TPU, as ONE reproducible command:

  1. mints a small synthetic-but-structured image folder (gradients +
     shapes — learnable, unlike noise),
  2. trains the flagship sd3unet_gq_0.25 (bf16 compute overlay) through
     the real `main.py` CLI for `--steps` optimizer steps with
     `disc_start` lowered so the run CROSSES the GAN phase boundary,
  3. sends SIGUSR1 mid-run (the reference's melk hook, main.py:849-852)
     and verifies the mid-run checkpoint lands,
  4. kills the run at ~60% of the budget, resumes with `--resume`, and
     lets it finish — exercising Orbax restore + step continuity,
  5. renders the loss/dual-trajectory curves + copies the image-logger
     grids into a committed run report (docs/sustained_run.md).

  python scripts/train_sustained.py --steps 300 --out docs/assets/sustained

The committed artifact under docs/assets/sustained/ was produced by
exactly this command (see docs/sustained_run.md for the run's numbers).
"""

import argparse
import csv
import os
import shutil
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root: str, n: int = 96, size: int = 256, seed: int = 0):
    """Structured synthetic images: smooth 2-color gradients + solid
    rectangles/ellipses.  A tokenizer can genuinely reduce loss on these
    (edges + flat fields + low-frequency ramps), unlike iid noise."""
    import numpy as np
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        c0 = rng.integers(0, 255, 3)
        c1 = rng.integers(0, 255, 3)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
        ang = rng.uniform(0, 1)
        t = (ang * xx + (1 - ang) * yy)[..., None]
        img = (c0 * (1 - t) + c1 * t).astype(np.uint8)
        im = Image.fromarray(img)
        d = ImageDraw.Draw(im)
        for _ in range(int(rng.integers(2, 6))):
            x0, y0 = rng.integers(0, size - 40, 2)
            w, h = rng.integers(20, size // 2, 2)
            col = tuple(int(v) for v in rng.integers(0, 255, 3))
            if rng.uniform() < 0.5:
                d.rectangle([int(x0), int(y0), int(x0 + w), int(y0 + h)], fill=col)
            else:
                d.ellipse([int(x0), int(y0), int(x0 + w), int(y0 + h)], fill=col)
        im.save(os.path.join(root, f"img_{i:04d}.png"))
    return root


def read_csv(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def last_step(csv_path):
    if not os.path.exists(csv_path):
        return -1
    rows = read_csv(csv_path)
    return int(rows[-1]["step"]) if rows else -1


def launch(args_list, log_path):
    f = open(log_path, "ab")
    return subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "main.py")] + args_list,
        stdout=f, stderr=subprocess.STDOUT, cwd=ROOT,
    ), f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd3unet_gq_0.25",
                    help="configs/<name>.yaml; round 5 also runs the "
                         "bsqvit_gq_0.25 flagship (VERDICT r4 #5)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--disc_start", type=int, default=60)
    ap.add_argument("--out", default="docs/assets/sustained")
    ap.add_argument("--workdir", default="/tmp/sustained_run")
    ap.add_argument("--timeout", type=float, default=3600,
                    help="per-segment wall budget (first compile is slow)")
    args = ap.parse_args()

    work = os.path.abspath(args.workdir)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    data_root = make_dataset(os.path.join(work, "data"))
    logroot = os.path.join(work, "logs")

    interrupt_at = max(args.steps * 3 // 5, args.disc_start + 20)
    sigusr1_at = args.disc_start // 2
    overrides = [
        f"data.params.train.params.root={data_root}",
        # a validation split on the same synthetic folder so the resumed
        # segment's post-fit `trainer.test` epoch (the reference's
        # main.py:862-863) has data to run on
        "data.params.validation.target="
        "vqvae_from_gaussian_vae_tpu.data.dataset.SimpleDataset",
        f"data.params.validation.params.root={data_root}",
        "data.params.validation.params.image_size=256",
        f"data.params.batch_size={args.batch}",
        "data.params.num_workers=4",
        f"model.params.loss_config.params.disc_start={args.disc_start}",
        "training.trainer.log_every_n_steps=5",
        f"training.image_logger.batch_frequency={args.disc_start + 40}",
        "training.image_logger.increase_log_steps=false",
        "training.image_logger.max_images=4",
        "training.checkpoint.every_n_train_steps=100000",
    ]
    # main.py's --base is nargs="*": both configs after ONE flag (a second
    # --base would REPLACE the first, not append)
    base_args = ["--base", f"configs/{args.config}.yaml",
                 "configs/overlays/bf16_compute.yaml",
                 "--logdir", logroot, "--name", "sustained", "--no-test",
                 "--max_steps", str(args.steps)] + overrides

    print(f"[sustained] segment 1: 0 -> ~{interrupt_at} (SIGUSR1 @ {sigusr1_at})")
    proc, fh = launch(base_args, os.path.join(work, "segment1.log"))
    t0 = time.time()
    logdir = None
    csv_path = None
    sent_usr1 = False
    usr1_ckpt_mtime = None
    try:
        while proc.poll() is None:
            time.sleep(5)
            if logdir is None:
                runs = sorted(os.listdir(logroot)) if os.path.isdir(logroot) else []
                if runs:
                    logdir = os.path.join(logroot, runs[-1])
                    csv_path = os.path.join(logdir, "metrics.csv")
            step = last_step(csv_path) if csv_path else -1
            if step >= 0 and int(time.time()) % 30 < 5:
                print(f"[sustained] step {step}  ({time.time()-t0:.0f}s)")
            if not sent_usr1 and step >= sigusr1_at:
                print(f"[sustained] step {step}: sending SIGUSR1")
                proc.send_signal(signal.SIGUSR1)
                sent_usr1 = True
                usr1_time = time.time()
            if sent_usr1 and usr1_ckpt_mtime is None:
                last = os.path.join(logdir, "checkpoints", "last")
                if os.path.isdir(last) and os.path.getmtime(last) >= usr1_time - 1:
                    usr1_ckpt_mtime = os.path.getmtime(last)
                    print("[sustained] SIGUSR1 checkpoint landed")
            if step >= interrupt_at:
                # SIGINT -> KeyboardInterrupt -> the trainer's melk handler
                # checkpoints before dying (the reference's crash-ckpt path,
                # main.py:855-861)
                print(f"[sustained] step {step} >= {interrupt_at}: SIGINT segment 1")
                proc.send_signal(signal.SIGINT)
                try:
                    proc.wait(timeout=300)
                except subprocess.TimeoutExpired:
                    proc.kill()
                break
            if time.time() - t0 > args.timeout:
                proc.kill()
                raise SystemExit("segment 1 exceeded budget; see segment1.log")
    finally:
        fh.close()
    assert logdir, "run never created a logdir; see segment1.log"
    assert sent_usr1, "never reached the SIGUSR1 step; see segment1.log"
    assert usr1_ckpt_mtime is not None, "SIGUSR1 checkpoint never landed"
    seg1_last = last_step(csv_path)
    shutil.copy(csv_path, os.path.join(work, "metrics_segment1.csv"))

    print(f"[sustained] segment 2: resume from ~{seg1_last} -> {args.steps}")
    # no --no-test: the resumed segment ends with the post-fit validation
    # epoch (parallel/trainer.py:test — the reference's trainer.test)
    proc, fh = launch(["--resume", logdir,
                       "--max_steps", str(args.steps)],
                      os.path.join(work, "segment2.log"))
    t0 = time.time()
    try:
        while proc.poll() is None:
            time.sleep(5)
            if time.time() - t0 > args.timeout:
                proc.kill()
                raise SystemExit("segment 2 exceeded budget; see segment2.log")
    finally:
        fh.close()
    assert proc.returncode == 0, f"resume segment failed rc={proc.returncode}"
    # the CSV logger starts a fresh file per process: merge both segments
    seg1_rows = read_csv(os.path.join(work, "metrics_segment1.csv"))
    seg2_rows = read_csv(csv_path)
    final = int(seg2_rows[-1]["step"])
    # the CSV logs every log_every_n_steps (5): the last row of a
    # 300-step run is step 295
    assert final >= args.steps - 6, f"resume stopped early at {final}"
    # resume continuity: segment 2 must CONTINUE from the melk checkpoint,
    # not restart from zero
    assert int(seg2_rows[0]["step"]) >= seg1_last - 5, (
        f"resume restarted at {seg2_rows[0]['step']} (segment 1 ended {seg1_last})")
    rows = seg1_rows + [r for r in seg2_rows
                        if int(r["step"]) > int(seg1_rows[-1]["step"])]

    report(args, work, logdir, seg1_last, int(seg2_rows[0]["step"]), rows)


def report(args, work, logdir, seg1_last, seg2_first, rows):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    steps = [int(r["step"]) for r in rows]

    def series(key):
        return ([int(r["step"]) for r in rows if r.get(key)],
                [float(r[key]) for r in rows if r.get(key)])

    panels = [
        ("train/loss/total", "ae total loss", "log"),
        ("train/loss/rec", "reconstruction (L1)", "linear"),
        ("train/loss/disc", "discriminator loss", "linear"),
        ("train/scalars/d_weight", "adaptive d_weight", "linear"),
        ("train/bits-mean", "KL bits/group (target 16)", "linear"),
        ("duals/lam", "dual lambda", "log"),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for ax, (key, title, scale) in zip(axes.flat, panels):
        s, v = series(key)
        if s:
            ax.plot(s, v, lw=1.2)
        ax.axvline(args.disc_start, color="tab:red", ls="--", lw=0.8,
                   label="disc_start")
        ax.axvline(seg1_last, color="tab:green", ls=":", lw=0.8,
                   label="resume point")
        ax.set_title(title, fontsize=10)
        ax.set_yscale(scale)
        ax.legend(fontsize=7)
    fig.suptitle(
        f"{args.config} sustained run on v5e: {steps[-1]} steps, bf16, "
        f"bs={args.batch}, disc_start={args.disc_start}, "
        f"SIGUSR1 + kill/resume @ ~{seg1_last}")
    fig.tight_layout()
    curve_path = os.path.join(out, "curves.png")
    fig.savefig(curve_path, dpi=110)
    print(f"[sustained] wrote {curve_path}")

    # ALL logged grids (round-4's last-3 copy made the report text and the
    # committed artifact disagree — VERDICT r4 #5b)
    copied = []
    img_dir = os.path.join(logdir, "images", "train")
    if os.path.isdir(img_dir):
        for name in sorted(os.listdir(img_dir)):
            shutil.copy(os.path.join(img_dir, name), os.path.join(out, name))
            copied.append(name)
            print(f"[sustained] copied image grid {name}")
    for seg in ("segment1.log", "segment2.log", "metrics_segment1.csv"):
        p = os.path.join(work, seg)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(out, seg))
    shutil.copy(os.path.join(logdir, "metrics.csv"),
                os.path.join(out, "metrics.csv"))

    # machine-written summary with the EXACT numbers, so the prose report
    # cannot drift from the artifact (VERDICT r4 #5c), plus the required
    # disclosure: with no vgg.pth in this image the LPIPS term uses a
    # RANDOMLY-INITIALIZED perceptual net (the harness warns the same,
    # segment1.log)
    val_rows = [r for r in read_csv(os.path.join(logdir, "metrics.csv"))
                if any(k.startswith("val/") and r.get(k) for k in r)]
    with open(os.path.join(out, "run_summary.md"), "w") as f:
        f.write(f"# {args.config} sustained run — machine-written summary\n\n")
        f.write(f"- steps: {steps[-1]} (target {args.steps}), bs={args.batch},"
                f" bf16 overlay, disc_start={args.disc_start}\n")
        # seg2_first is segment 2's OWN first CSV row (the merged series
        # would surface a segment-1 row and misreport the resume point)
        f.write(f"- segment 1 ended (SIGINT/crash-ckpt) at step "
                f"{seg1_last}; segment 2's first logged row is step "
                f"{seg2_first}\n")
        f.write(f"- image grids committed: {', '.join(copied) or 'none'}\n")
        f.write(f"- post-fit validation epoch rows logged: {len(val_rows)}\n")
        f.write("- DISCLOSURE: no vgg.pth in this image, so the LPIPS "
                "perceptual term uses a randomly-initialized VGG (loud "
                "warning in segment1.log); loss curves are internally "
                "consistent but the perceptual term is NOT the "
                "reference-weighted one.\n")
    print(f"[sustained] artifacts in {out}")


if __name__ == "__main__":
    main()
