"""Inception Score (`/root/reference/pit/evaluations/inception_score.py`):
exp(E_x[KL(p(y|x) || p(y))]) over class-probability rows.

Two entry points:

- ``inception_score``: the standard split-IS (Salimans et al.) over
  per-sample KL rows — what the metric is supposed to compute.
- ``get_inception_score``: bit-compatible with the reference's function,
  which passes a 2-D array to ``scipy.stats.entropy`` with the default
  ``axis=0`` — that normalizes each *class column over samples* and sums
  the KL over samples.  The result equals the standard IS only when the
  class marginal is uniform (the per-class 1/(N*m_c) weight then reduces
  to 1/N); with an imbalanced marginal the two diverge.  Kept for drop-in
  parity; see the PARITY.md defect table.
"""

from __future__ import annotations

import numpy as np


def get_inception_score(logits: np.ndarray) -> float:
    """Reference-compatible IS (`inception_score.py:6-8`): softmax over
    classes, then scipy-entropy semantics along axis 0 (see module doc)."""
    logits = np.asarray(logits, dtype=np.float64)
    prob = np.exp(logits - logits.max(axis=1, keepdims=True))
    prob /= prob.sum(axis=1, keepdims=True)
    marginal = prob.mean(axis=0)
    # scipy.stats.entropy(pk, qk) default axis=0: normalize both operands
    # per column over samples, KL summed over samples -> one value per class.
    pk = prob / prob.sum(axis=0, keepdims=True)
    qk = np.broadcast_to(marginal, prob.shape)
    qk = qk / qk.sum(axis=0, keepdims=True)
    kl_per_class = (pk * (np.log(pk) - np.log(qk))).sum(axis=0)
    return float(np.exp(kl_per_class.mean()))


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
