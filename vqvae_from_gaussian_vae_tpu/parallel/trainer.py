"""The training harness: host loop around the jitted SPMD steps.

Replaces the reference's Lightning Trainer + DDPStrategy machinery
(`/root/reference/main.py:693-782`): two-phase alternation by step parity
with disc-start gating (`autoencoder.py:489-505`), LR scaling
(`main.py:820-830`), Orbax checkpoint/resume with periodic + keep-forever
snapshots (`main.py:670-763`), crash checkpointing ("melk",
`main.py:833-861`), SIGUSR1 -> checkpoint (`main.py:849-852`), CSV/W&B
scalar logging and the ImageLogger schedule.
"""

from __future__ import annotations

import logging
import os
import signal
import time
from typing import Dict, Optional

import jax
import numpy as np

from vqvae_from_gaussian_vae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vqvae_from_gaussian_vae_tpu.parallel.train_state import TrainState, make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
from vqvae_from_gaussian_vae_tpu.utils.loggers import CSVLogger, ImageLogger, WandbLogger


class Checkpointer:
    """Orbax-backed TrainState snapshots: rolling `last`, every-N saves, and
    never-deleted keep-every-N snapshots (`main.py:670-763`)."""

    def __init__(self, logdir: str, every_n: int = 5000, keep_every_n: int = 10000):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(os.path.join(logdir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.every_n = every_n
        self.keep_every_n = keep_every_n
        self._ckpt = ocp.PyTreeCheckpointer()

    def save(self, state: TrainState, name: Optional[str] = None, force: bool = False):
        if jax.process_index() != 0:
            return []  # replicated state: host 0 writes (main.py:254-261 role)
        step = int(state.step)
        names = []
        if name is not None:
            names = [name]
        else:
            if force or (self.every_n and step % self.every_n == 0):
                names.append("last")
            if self.keep_every_n and step and step % self.keep_every_n == 0:
                names.append(f"step_{step:08d}")
        for n in names:
            path = os.path.join(self.dir, n)
            self._ckpt.save(path, jax.tree.map(np.asarray, state), force=True)
        return names

    def restore(self, template: TrainState, name: str = "last") -> TrainState:
        path = os.path.join(self.dir, name)
        return self._ckpt.restore(path, item=template)

    def has(self, name: str = "last") -> bool:
        return os.path.exists(os.path.join(self.dir, name))

    def save_best(self, state: TrainState, value: float, monitor: str,
                  top_k: int = 3, mode: str = "min"):
        """Monitor-based top-k checkpoints (the reference's
        ModelCheckpoint(monitor=model.monitor, save_top_k=3),
        `main.py:679-682`).  Keeps the k best snapshots as ``best_step_*``
        dirs plus a ``best.json`` ledger."""
        import json
        import shutil

        if jax.process_index() != 0:
            return None
        ledger_path = os.path.join(self.dir, "best.json")
        ledger = []
        if os.path.exists(ledger_path):
            with open(ledger_path) as f:
                ledger = json.load(f)
        sign = 1.0 if mode == "min" else -1.0
        if len(ledger) >= top_k and sign * value >= max(sign * e["value"] for e in ledger):
            return None
        name = f"best_step_{int(state.step):08d}"
        self._ckpt.save(os.path.join(self.dir, name),
                        jax.tree.map(np.asarray, state), force=True)
        ledger = [e for e in ledger if e["name"] != name]
        ledger.append({"name": name, "value": float(value), "monitor": monitor})
        ledger.sort(key=lambda e: sign * e["value"])
        for e in ledger[top_k:]:
            shutil.rmtree(os.path.join(self.dir, e["name"]), ignore_errors=True)
        ledger = ledger[:top_k]
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=1)
        return name


class Trainer:
    def __init__(
        self,
        engine,
        data_module,
        logdir: str = "logs/run",
        max_steps: int = 1_000_000,
        log_every_n_steps: int = 50,
        val_every_n_steps: int = 0,
        seed: int = 23,
        mesh_spec: Optional[Dict[str, int]] = None,
        scale_lr: bool = False,
        base_lr: float = 1e-4,
        accumulate_grad_batches: int = 1,
        checkpoint_cfg: Optional[Dict] = None,
        image_logger_cfg: Optional[Dict] = None,
        use_wandb: bool = False,
        wandb_project: str = "vqvae_from_gaussian_vae_tpu",
        run_name: str = "run",
        lpips_weights: Optional[str] = None,
    ):
        self.engine = engine
        self.lpips_weights = lpips_weights
        self.data = data_module
        self.logdir = logdir
        self.max_steps = max_steps
        self.log_every = log_every_n_steps
        self.val_every = val_every_n_steps
        self.seed = seed
        os.makedirs(logdir, exist_ok=True)

        self.mesh = make_mesh(mesh_spec)
        n_dev = self.mesh.devices.size
        # LR scaling: accumulate * n_devices * per-device-bs * base_lr
        # (`main.py:820-830`; accumulation is 1 here).  float() guards
        # against YAML 1.1 parsing "1e-4" as a string.
        bs = data_module.batch_size
        base_lr = float(base_lr)
        lr = base_lr * accumulate_grad_batches * n_dev * bs if scale_lr else base_lr
        self.learning_rate = lr
        engine.learning_rate = lr

        ae_opt, disc_opt = make_optimizers(
            lr,
            engine.optimizer_config
            if isinstance(engine.optimizer_config, dict)
            and "target" in engine.optimizer_config
            and engine.optimizer_config["target"].startswith("optax")
            else None,
            accumulate_grad_batches=accumulate_grad_batches,
            lr_g_factor=getattr(engine, "lr_g_factor", 1.0),
            trainable_ae_params=getattr(engine, "trainable_ae_params", None),
            ae_optimizer_args=getattr(engine, "ae_optimizer_args", None),
            trainable_disc_params=getattr(engine, "trainable_disc_params", None),
            disc_optimizer_args=getattr(engine, "disc_optimizer_args", None),
        )
        self.builder = TrainStepBuilder(engine, ae_opt, disc_opt)

        ckpt_cfg = checkpoint_cfg or {}
        self.checkpointer = Checkpointer(
            logdir,
            every_n=ckpt_cfg.get("every_n_train_steps", 5000),
            keep_every_n=ckpt_cfg.get("keep_every_n_train_steps", 10000),
        )
        # monitored top-k selection (main.py:679-682): the engine's monitor
        # attribute, overridable by checkpoint config
        self.monitor = ckpt_cfg.get("monitor", getattr(engine, "monitor", None))
        self.save_top_k = int(ckpt_cfg.get("save_top_k", 3))
        self.monitor_mode = ckpt_cfg.get("mode", "min")
        if self.monitor:
            print(f"Monitoring {self.monitor} as checkpoint metric (top-{self.save_top_k}).")
        self.scalar_logger = CSVLogger(logdir)
        self.wandb = WandbLogger(wandb_project, run_name) if use_wandb else None
        self.image_logger = ImageLogger(**(image_logger_cfg or {}))
        self.state: Optional[TrainState] = None
        self._want_ckpt = False
        try:
            signal.signal(signal.SIGUSR1, self._on_sigusr1)
            # the reference drops into pudb on SIGUSR2 (`main.py:849-852`);
            # in a headless SPMD job a full stack dump is the usable analog
            signal.signal(signal.SIGUSR2, self._on_sigusr2)
        except ValueError:
            pass  # not in main thread

    def _on_sigusr1(self, *_):
        self._want_ckpt = True

    def _on_sigusr2(self, *_):
        import faulthandler

        faulthandler.dump_traceback(all_threads=True)

    # ------------------------------------------------------------- state

    def _install_lpips_weights(self, state: TrainState) -> TrainState:
        """Install pretrained LPIPS weights into the frozen perceptual net
        (the reference auto-downloads vgg.pth at LPIPS(), lpips.py:24-33).
        Configured via ``loss_config.params.lpips_weights`` or the
        ``--lpips_weights`` CLI flag; warns loudly when training would run a
        randomly-initialized perceptual loss."""
        loss = getattr(self.engine, "loss", None)
        if loss is None or not state.loss_params or "perceptual_loss" not in state.loss_params:
            return state
        path = self.lpips_weights or getattr(loss, "lpips_weights", None)
        if path:
            from vqvae_from_gaussian_vae_tpu.losses.lpips import load_lpips_weights

            new_p, missing, unexpected = load_lpips_weights(
                state.loss_params["perceptual_loss"], path
            )
            if missing or unexpected:
                print(f"LPIPS weight load: missing={missing[:5]}... unexpected={unexpected[:5]}...")
            print(f"installed LPIPS weights from {path}")
            return state.replace(
                loss_params={**state.loss_params, "perceptual_loss": new_p}
            )
        if getattr(loss, "perceptual_weight", 0) > 0:
            print(
                "WARNING: perceptual_weight > 0 but no LPIPS weights configured - "
                "training will use a RANDOMLY-INITIALIZED perceptual net. Set "
                "model.params.loss_config.params.lpips_weights (or --lpips_weights) "
                "to the reference's vgg.pth."
            )
        return state

    def _init_or_resume(self, example_batch, resume: bool):
        state = self.builder.init_state(jax.random.PRNGKey(self.seed), example_batch,
                                        self.learning_rate)
        state = self._install_lpips_weights(state)
        if resume and self.checkpointer.has("last"):
            state = self.checkpointer.restore(state)
            print(f"resumed from step {int(state.step)}")
        # replicate over the mesh
        state = jax.tree.map(lambda x: x, state)
        return TrainState(
            step=replicate(self.mesh, state.step),
            engine_params=replicate(self.mesh, state.engine_params),
            loss_params=replicate(self.mesh, state.loss_params),
            ae_opt_state=replicate(self.mesh, state.ae_opt_state),
            disc_opt_state=replicate(self.mesh, state.disc_opt_state),
            duals=replicate(self.mesh, state.duals),
            rng=replicate(self.mesh, state.rng),
        )

    # ------------------------------------------------------------- loop

    def fit(self, resume: bool = False):
        # per-host file sharding (the reference's DistributedSampler role,
        # eval.py:97-107): each process loads its own slice, shard_batch
        # assembles the global array
        shard_kw = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
        loader = self.data.train_dataloader(**shard_kw)
        val_loader = None
        if self.val_every and "validation" in self.data.dataset_configs:
            val_loader = self.data.val_dataloader(**shard_kw)

        it = iter(loader)
        first = next(it)
        self.state = self._init_or_resume(first, resume)
        disc_start = self.engine.disc_start_iter
        if self.engine.loss is not None:
            disc_start = max(disc_start, 0)
        has_disc = self.state.loss_params and "discriminator" in self.state.loss_params

        t0 = time.time()
        imgs_seen = 0
        batch_idx = 0
        batch = first
        try:
            while int(self.state.step) < self.max_steps:
                step = int(self.state.step)
                # two-phase alternation with disc-start forcing
                # (autoencoder.py:489-505)
                optimizer_idx = batch_idx % 2 if has_disc else 0
                if step < disc_start:
                    optimizer_idx = 0
                sharded = shard_batch(self.mesh, {"img": batch["img"]})
                with self.mesh:
                    if optimizer_idx == 0:
                        disc_active = bool(has_disc) and step >= self.engine.loss.disc_start
                        self.state, log = self.builder.ae_step(
                            self.state, sharded, disc_active=disc_active
                        )
                    else:
                        self.state, log = self.builder.disc_step(self.state, sharded)
                imgs_seen += batch["img"].shape[0]
                batch_idx += 1

                if step % self.log_every == 0:
                    scalars = {k: float(v) for k, v in log.items()}
                    # GQ dual-variable trajectories (explicit train state here,
                    # vs the reference's unlogged python floats, gaussian.py:41-43)
                    for dk, dv in (self.state.duals or {}).items():
                        scalars[f"duals/{dk}"] = float(dv)
                    scalars["imgs_per_sec"] = imgs_seen / max(time.time() - t0, 1e-9)
                    scalars["lr"] = self.learning_rate  # LearningRateMonitor analog
                    self.scalar_logger.log(scalars, step)
                    if self.wandb:
                        self.wandb.log(scalars, step)
                if self.image_logger.should_log(step) and jax.process_count() > 1:
                    if not getattr(self, "_warned_img_multiproc", False):
                        self._warned_img_multiproc = True
                        logging.warning(
                            "image logging is disabled under multi-process SPMD "
                            "(the grid forward is host-local and would desync the "
                            "processes); scalar logs remain global"
                        )
                if self.image_logger.should_log(step) and jax.process_count() == 1:
                    # image grids run a host-local forward; under multi-host
                    # SPMD that would desync the processes - scalars (global)
                    # still log everywhere
                    self.engine.params = self.state.engine_params
                    extra = None
                    if has_disc:
                        from vqvae_from_gaussian_vae_tpu.losses.discriminator_loss import (
                            visualize_disc_logits,
                        )

                        n = self.image_logger.max_images
                        x_small = batch["img"][:n]
                        _, xrec, _ = self.engine.forward(x_small)
                        extra = visualize_disc_logits(
                            self.engine.loss, self.state.loss_params, x_small, xrec
                        )
                    grids = self.image_logger.log_images(
                        self.engine, batch, step, self.logdir, extra_images=extra
                    )
                    if self.wandb:
                        self.wandb.log_images(grids, step)
                self.checkpointer.save(self.state)
                if self._want_ckpt:
                    self.checkpointer.save(self.state, name="last", force=True)
                    self._want_ckpt = False
                if val_loader is not None and step and step % self.val_every == 0:
                    self.validate(val_loader)

                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(loader)
                    batch = next(it)
        except BaseException:
            # the reference's melk(): checkpoint on any crash then re-raise
            # (`main.py:833-861`), plus the MULTINODE_HACKS-style diagnostics
            # (`main.py:864-877`)
            import socket

            print(
                f"crash on host {socket.gethostname()} at step "
                f"{int(self.state.step) if self.state is not None else '?'}; "
                f"devices={jax.devices()}; writing last.ckpt"
            )
            if self.state is not None:
                self.checkpointer.save(self.state, name="last", force=True)
            raise
        self.checkpointer.save(self.state, name="last", force=True)
        return self.state

    def validate(self, loader, max_batches: Optional[int] = 50):
        logs = []
        with self.mesh:
            for i, batch in enumerate(loader):
                if max_batches is not None and i >= max_batches:
                    break
                sharded = shard_batch(self.mesh, {"img": batch["img"]})
                logs.append(self.builder.eval_step(self.state, sharded))
        if not logs:
            return {}
        mean = {k: float(np.mean([float(l[k]) for l in logs])) for k in logs[0]}
        self.scalar_logger.log(mean, int(self.state.step))
        if self.wandb:
            self.wandb.log(mean, int(self.state.step))
        print({k: round(v, 5) for k, v in sorted(mean.items())[:8]})
        if self.monitor and self.monitor in mean:
            saved = self.checkpointer.save_best(
                self.state, mean[self.monitor], self.monitor,
                top_k=self.save_top_k, mode=self.monitor_mode,
            )
            if saved:
                print(f"saved {saved} ({self.monitor}={mean[self.monitor]:.5f})")
        return mean

    def test(self, loader=None):
        """Full validation epoch after fit (the reference's `trainer.test`,
        `main.py:862-863`): runs every batch, logs under the same scalar
        keys."""
        if loader is None:
            shard_kw = dict(shard_id=jax.process_index(), num_shards=jax.process_count())
            if "test" in self.data.dataset_configs:
                loader = self.data.test_dataloader(**shard_kw)
            elif "validation" in self.data.dataset_configs:
                loader = self.data.val_dataloader(**shard_kw)
            else:
                return {}
        return self.validate(loader, max_batches=None)
