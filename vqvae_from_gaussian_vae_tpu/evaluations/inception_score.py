"""Inception Score (`/root/reference/pit/evaluations/inception_score.py`):
exp(E_x[KL(p(y|x) || p(y))]) over class-probability rows."""

from __future__ import annotations

import numpy as np


def inception_score(probs: np.ndarray, splits: int = 10, eps: float = 1e-16):
    """probs: (N, classes) softmax outputs.  Returns (mean, std) over splits."""
    probs = np.asarray(probs, dtype=np.float64)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + eps) - np.log(marginal + eps))).sum(axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
