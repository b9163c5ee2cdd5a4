"""Frechet Video Distance (`/root/reference/pit/evaluations/fvd/fvd_score.py`).

The reference downloads an I3D torchscript model from dropbox
(`fvd_score.py:10-19`) and computes a Frechet distance over its 400-d
pre-softmax logits (and has a stale `transcoder.` import, SURVEY.md 2.4).
Here the extractor is a flax InceptionI3d (`evaluations/i3d.py`) with a
weight converter for the torchscript's state_dict; the Frechet math is
shared with FID.  A custom ``feature_fn`` mapping (N, T, H, W, C) video
batches to (N, D) features can still be supplied.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

from vqvae_from_gaussian_vae_tpu.evaluations.fid import fid_from_features


def fvd_from_features(feats_real: np.ndarray, feats_fake: np.ndarray) -> float:
    return fid_from_features(feats_real, feats_fake)


def compute_fvd(
    videos_real: Iterable,
    videos_fake: Iterable,
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    i3d_variables=None,
) -> float:
    """FVD between two iterables of (N, T, H, W, C) video batches in [-1, 1].

    Without ``feature_fn`` the flax I3D is used (supply converted torchscript
    weights via ``i3d_variables`` for reference-comparable values; with none
    it runs at random init, exercising the pipeline only)."""
    if feature_fn is None:
        from vqvae_from_gaussian_vae_tpu.evaluations.i3d import make_i3d_feature_fn

        feature_fn = make_i3d_feature_fn(i3d_variables)
    fr = np.concatenate([np.asarray(feature_fn(v)) for v in videos_real])
    ff = np.concatenate([np.asarray(feature_fn(v)) for v in videos_fake])
    return fvd_from_features(fr, ff)
