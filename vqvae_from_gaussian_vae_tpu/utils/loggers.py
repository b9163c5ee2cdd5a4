"""Training observability: CSV/W&B scalar logging + image grids.

Mirrors the reference's logger selection (`/root/reference/main.py:625-666`:
WandbLogger opt-in, CSV fallback) and its ImageLogger callback
(`main.py:309-477`): inputs/reconstructions/diff/diff_boost grids written to
disk every `batch_frequency` steps, plus a 2^n warm-up schedule.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional

import numpy as np


class CSVLogger:
    """Append-mostly CSV; when new metric keys appear (e.g. the first
    discriminator step), the file is rewritten with the widened header."""

    def __init__(self, logdir: str, name: str = "metrics.csv"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, name)
        self._fieldnames = None
        self._rows = []

    def log(self, metrics: Dict[str, float], step: int):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._rows.append(row)
        extra = [k for k in row if not self._fieldnames or k not in self._fieldnames]
        if self._fieldnames is None or extra:
            self._fieldnames = (self._fieldnames or []) + (
                extra if self._fieldnames else list(row)
            )
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
                w.writeheader()
                w.writerows(self._rows)
        else:
            with open(self.path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
                w.writerow(row)


class WandbLogger:
    """Thin optional wrapper; becomes a no-op when wandb is unavailable."""

    def __init__(self, project: str, name: str, config: Optional[dict] = None):
        try:
            import wandb

            self._run = wandb.init(project=project, name=name, config=config)
            self._wandb = wandb
        except Exception as e:  # pragma: no cover - depends on env
            print(f"wandb unavailable ({e}); falling back to no-op logger")
            self._run = None

    def log(self, metrics: Dict[str, float], step: int):
        if self._run is not None:
            self._wandb.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_images(self, images: Dict[str, np.ndarray], step: int, split: str = "train"):
        """Grid upload (the reference ImageLogger's wandb path,
        `main.py:382-392`)."""
        if self._run is None:
            return
        payload = {}
        for key, grid in images.items():
            payload[f"{split}/{key}"] = self._wandb.Image(grid)
        self._wandb.log(payload, step=step)


def _to_uint8_grid(images: np.ndarray, n_rows: int = 2) -> np.ndarray:
    """(N, H, W, C) in [-1, 1] -> one uint8 grid image."""
    n, h, w, c = images.shape
    cols = max(1, (n + n_rows - 1) // n_rows)
    grid = np.full((n_rows * h, cols * w, c), 255, np.uint8)
    imgs = np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    return grid


class ImageLogger:
    """(`main.py:309-477`)."""

    def __init__(
        self,
        batch_frequency: int = 1000,
        max_images: int = 8,
        increase_log_steps: bool = True,
        log_first_step: bool = True,
        disabled: bool = False,
        enable_autocast: bool = False,  # accepted for config parity
        log_images_kwargs: Optional[dict] = None,
        clamp: bool = True,
    ):
        self.batch_frequency = batch_frequency
        self.max_images = max_images
        self.disabled = disabled
        self.log_first_step = log_first_step
        self.log_images_kwargs = log_images_kwargs or {}
        # 2^n warm-up steps below batch_frequency (`main.py:329`)
        self.log_steps = (
            [2**n for n in range(int(np.log2(batch_frequency)) + 1)]
            if increase_log_steps
            else []
        )

    def should_log(self, step: int) -> bool:
        if self.disabled:
            return False
        if step == 0:
            return self.log_first_step
        return step % self.batch_frequency == 0 or step in self.log_steps

    def log_images(self, engine, batch, step: int, logdir: str, split: str = "train",
                   extra_images: Optional[dict] = None):
        out_dir = os.path.join(logdir, "images", split)
        os.makedirs(out_dir, exist_ok=True)
        small = {engine.input_key: batch[engine.input_key][: self.max_images]}
        log = engine.log_images(small, **self.log_images_kwargs)
        if extra_images:
            log.update(extra_images)
        from PIL import Image

        n_rows = self.log_images_kwargs.get("n_rows", 2)
        grids = {}
        for key, imgs in log.items():
            grid = _to_uint8_grid(np.asarray(imgs, dtype=np.float32), n_rows=n_rows)
            fname = f"{key}_gs-{step:06}.png"
            Image.fromarray(grid.squeeze()).save(os.path.join(out_dir, fname))
            grids[key] = grid
        return grids
