#!/usr/bin/env python
"""Training CLI (reference `/root/reference/main.py`).

    python main.py --base configs/sd3unet_gq_0.25.yaml [--name run1] \
        [--resume logs/...] [--scale_lr] [--wandb] [--seed 23] \
        [model.params...=... dotlist overrides]

Config layers mirror the reference (`main.py:591-604`): left-to-right
multi --base merge, then dotlist CLI overrides, then ${...} interpolation.
The `training:` section supplies trainer knobs (the reference's `lightning:`
section is also understood for the keys our SPMD trainer has analogs for).
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", metavar="base_config.yaml", default=[])
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="", help="resume from logdir")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--scale_lr", action="store_true", help="lr = n_dev*bs*base_lr")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--projectname", type=str, default="vqvae_from_gaussian_vae_tpu")
    p.add_argument("--max_steps", type=int, default=0, help="override training.trainer.max_steps")
    p.add_argument("--no-test", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first steps into <logdir>/trace")
    p.add_argument("--lpips_weights", type=str, default="",
                   help="path to the reference's vgg.pth LPIPS checkpoint; converted "
                        "and installed into the frozen perceptual loss at init")
    p.add_argument("--matmul_precision", type=str, default="",
                   choices=["", "default", "high", "highest"],
                   help="jax default_matmul_precision — the TPU analog of the "
                        "reference's TF32 toggles (main.py:577-587): 'default' "
                        "= one-bf16-pass fp32 dots (like TF32 on), 'highest' = "
                        "strict fp32 (like TF32 off).  bf16-compute overlays "
                        "are unaffected (bf16 dots have one precision)")
    return p


def _fit_postprocessor(engine, data, cfg, args, logdir):
    """Rectified-flow poster training (the reference trains
    AutoencodingPostEngine through the same main.py harness,
    postprocessor.py:144-162): frozen AE, single optimizer, simple loop."""
    import jax
    import numpy as np

    from vqvae_from_gaussian_vae_tpu.utils.loggers import CSVLogger

    tcfg = cfg.get("training", {}).get("trainer", {})
    max_steps = args.max_steps or tcfg.get("max_steps", 100_000)
    lr = float(cfg["model"].get("base_learning_rate", 1e-4))
    loader = data.train_dataloader()
    it = iter(loader)
    first = next(it)
    engine.init_params(jax.random.PRNGKey(args.seed), example=first["img"])
    step_fn, opt_state = engine.make_train_step(lr)
    params = engine.poster_params
    logger = CSVLogger(logdir)
    step = 0
    batch = first
    while step < max_steps:
        params, opt_state, loss = step_fn(params, opt_state, batch["img"],
                                          jax.random.fold_in(jax.random.PRNGKey(1), step))
        if step % tcfg.get("log_every_n_steps", 50) == 0:
            logger.log({"train/loss": float(loss)}, step)
        step += 1
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
    engine.poster_params = params
    import flax.serialization as ser

    with open(os.path.join(logdir, "poster_params.msgpack"), "wb") as f:
        f.write(ser.to_bytes(params))
    print(f"poster trained for {step} steps; params saved under {logdir}")


def main():
    parser = get_parser()
    args, unknown = parser.parse_known_args()
    assert args.base or args.resume, "need --base config(s) or --resume"

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import maybe_initialize_distributed
    from vqvae_from_gaussian_vae_tpu.parallel.trainer import Trainer
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    maybe_initialize_distributed()

    if args.matmul_precision:
        import jax

        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    resume_dir = ""
    bases = list(args.base)
    if args.resume:
        # resume re-loads the run's own saved configs (`main.py:518-539`)
        resume_dir = args.resume
        cfg_dir = os.path.join(resume_dir, "configs")
        if os.path.isdir(cfg_dir):
            bases = sorted(
                os.path.join(cfg_dir, f) for f in os.listdir(cfg_dir) if f.endswith(".yaml")
            ) + bases

    cfg = load_config(bases, dotlist=unknown)

    if resume_dir:
        logdir = resume_dir
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        cfg_name = os.path.splitext(os.path.basename(bases[0]))[0] if bases else "run"
        name = args.name or cfg_name
        logdir = os.path.join(args.logdir, f"{now}_{name}")
        os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
        import yaml

        with open(os.path.join(logdir, "configs", "merged.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)

    engine = instantiate_from_config(cfg["model"])
    data = instantiate_from_config(cfg["data"])

    from vqvae_from_gaussian_vae_tpu.models.postprocessor import AutoencodingPostEngine

    if isinstance(engine, AutoencodingPostEngine):
        _fit_postprocessor(engine, data, cfg, args, logdir)
        return

    tcfg = cfg.get("training", {})
    # understand reference-style `lightning:` sections too
    lcfg = cfg.get("lightning", {})
    trainer_knobs = {**lcfg.get("trainer", {}), **tcfg.get("trainer", {})}
    ckpt_cfg = tcfg.get("checkpoint") or (lcfg.get("modelcheckpoint", {}) or {}).get("params", {})
    img_cfg = tcfg.get("image_logger") or (
        (lcfg.get("callbacks", {}).get("image_logger", {}) or {}).get("params", {})
    )
    img_cfg = {
        k: v
        for k, v in (img_cfg or {}).items()
        if k in ("batch_frequency", "max_images", "increase_log_steps", "log_first_step",
                 "disabled", "enable_autocast", "log_images_kwargs")
    }

    max_steps = args.max_steps or trainer_knobs.get("max_steps", 1_000_000)
    trainer = Trainer(
        engine,
        data,
        logdir=logdir,
        max_steps=max_steps,
        log_every_n_steps=trainer_knobs.get("log_every_n_steps", 50),
        val_every_n_steps=trainer_knobs.get("val_every_n_steps", 0),
        seed=args.seed if args.seed is not None else trainer_knobs.get("seed", 23),
        mesh_spec=trainer_knobs.get("mesh"),
        accumulate_grad_batches=trainer_knobs.get("accumulate_grad_batches", 1),
        scale_lr=args.scale_lr,
        base_lr=cfg["model"].get("base_learning_rate", 1e-4),
        checkpoint_cfg=ckpt_cfg,
        image_logger_cfg=img_cfg,
        use_wandb=args.wandb,
        wandb_project=args.projectname,
        run_name=os.path.basename(logdir),
        lpips_weights=args.lpips_weights or None,
    )
    print(f"logdir: {logdir}  lr: {trainer.learning_rate}  devices: {trainer.mesh.devices.size}")
    if args.profile:
        from vqvae_from_gaussian_vae_tpu.utils.profiling import trace

        with trace(os.path.join(logdir, "trace")):
            trainer.max_steps = min(trainer.max_steps, 10)
            trainer.fit(resume=bool(resume_dir))
        return
    trainer.fit(resume=bool(resume_dir))
    if not args.no_test:
        # full post-fit evaluation epoch (the reference's trainer.test,
        # main.py:862-863)
        trainer.test()


if __name__ == "__main__":
    main()
