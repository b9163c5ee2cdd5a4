"""Fixed, training-free Gaussian codebook generation.

The GQ tokenizer's codebook is 2^16 i.i.d. standard-normal draws obtained by
pushing a scrambled Sobol sequence through the inverse normal CDF
(`/root/reference/pit/quantization/gaussian.py:15-19`).  Bit-exact
reproduction matters: checkpoints do NOT store the codebook (the reference
registers it with persistent=False, `gaussian.py:50`), so token indices are
only portable if every implementation regenerates the identical table from
(n_samples, group, seed).

torch's scrambled ``SobolEngine`` uses its own direction numbers and
LMS+shift scrambling driven by torch's RNG; no other library reproduces it
bit-for-bit.  We therefore generate the table with torch (CPU, host-side,
init-time only - never in the compute path) and cache the result as an .npy
asset so the JAX framework runs torch-free once the asset exists.  A golden
test pins the asset against fresh torch generation.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.stats import norm

_ASSET_DIR = os.environ.get(
    "GVQ_CODEBOOK_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets"),
)

# module-level memo: (n, g, seed) -> np.ndarray
_CACHE: dict = {}


def _asset_path(n_samples: int, n_variable: int, seed: int) -> str:
    return os.path.join(_ASSET_DIR, f"prior_samples_n{n_samples}_g{n_variable}_s{seed}.npy")


def _generate_with_torch(n_samples: int, n_variable: int, seed: int) -> np.ndarray:
    import torch  # local import: only used host-side at init/codegen time

    sobol = torch.quasirandom.SobolEngine(n_variable, scramble=True, seed=seed)
    u = sobol.draw(n_samples).numpy()  # float32 in [0,1)
    return norm.ppf(u).astype(np.float32)  # ppf in float64, cast as the reference does


def prior_samples(n_samples: int, n_variable: int, seed: int = 42) -> np.ndarray:
    """Return the (n_samples, n_variable) float32 codebook.

    Loads the cached asset when present; otherwise generates via torch and
    writes the asset (if the asset dir is writable) for future torch-free use.
    """
    key = (n_samples, n_variable, seed)
    if key in _CACHE:
        return _CACHE[key]
    path = _asset_path(n_samples, n_variable, seed)
    if os.path.exists(path):
        table = np.load(path)
    else:
        table = _generate_with_torch(n_samples, n_variable, seed)
        try:
            os.makedirs(_ASSET_DIR, exist_ok=True)
            np.save(path, table)
        except OSError:
            pass
    table = np.ascontiguousarray(table, dtype=np.float32)
    _CACHE[key] = table
    return table


def standard_normal_log_prob(codebook: np.ndarray) -> np.ndarray:
    """log N(c; 0, I) per entry/dim, float32 - the beta-weighted prior term of
    the search score (`/root/reference/pit/quantization/gaussian.py:52`)."""
    c = codebook.astype(np.float32)
    return (-0.5 * c * c - 0.5 * np.log(2.0 * np.pi).astype(np.float32)).astype(np.float32)
