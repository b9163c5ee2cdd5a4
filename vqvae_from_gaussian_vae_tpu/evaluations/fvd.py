"""Frechet Video Distance (`/root/reference/pit/evaluations/fvd/fvd_score.py`).

The reference downloads an I3D torchscript model from dropbox
(`fvd_score.py:10-19`) and computes a Frechet distance over its 400-d logits
(and has a stale `transcoder.` import, SURVEY.md 2.4).  No egress here: the
Frechet math is shared with FID; the I3D feature extractor is pluggable -
pass any callable mapping (N, T, H, W, C) video batches to (N, D) features.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from vqvae_from_gaussian_vae_tpu.evaluations.fid import fid_from_features


def fvd_from_features(feats_real: np.ndarray, feats_fake: np.ndarray) -> float:
    return fid_from_features(feats_real, feats_fake)


def compute_fvd(
    videos_real: Iterable,
    videos_fake: Iterable,
    feature_fn: Callable[[np.ndarray], np.ndarray],
) -> float:
    fr = np.concatenate([np.asarray(feature_fn(v)) for v in videos_real])
    ff = np.concatenate([np.asarray(feature_fn(v)) for v in videos_fake])
    return fvd_from_features(fr, ff)
