"""Fixed, training-free Gaussian codebook generation — torch-free.

The GQ tokenizer's codebook is 2^16 i.i.d. standard-normal draws obtained by
pushing a scrambled Sobol sequence through the inverse normal CDF
(`/root/reference/pit/quantization/gaussian.py:15-19`).  Bit-exact
reproduction matters: checkpoints do NOT store the codebook (the reference
registers it with persistent=False, `gaussian.py:50`), so token indices are
only portable if every implementation regenerates the identical table from
(n_samples, group, seed).

torch's scrambled ``SobolEngine`` semantics, reimplemented in numpy:

  1. *Direction numbers*: JoeKuo-D6 per-dimension Sobol state, MAXBIT=30.
     Per-dimension init is independent of the engine's total dimension, so we
     ship the unscrambled 256-dim state as ``assets/sobol_state_d256.npy``
     (extracted once from ``SobolEngine(256).sobolstate``) and slice it.
  2. *Scramble* (``torch/quasirandom.py::SobolEngine._scramble``): a digital
     shift plus a lower-triangular linear matrix scramble (LMS).  torch draws
     the random bits with CPU ``torch.randint(2, ...)`` under
     ``Generator().manual_seed(seed)``, whose 32-bit MT19937 word stream is
     reproduced exactly by ``np.random.RandomState(seed).randint(0, 2**32,
     dtype=uint32) % 2`` — shift bits first (dim x MAXBIT), then LMS bits
     (dim x MAXBIT x MAXBIT).  The LMS maps each state word's MSB-first bit
     vector b to L @ b (mod 2) per dimension
     (``aten/src/ATen/native/SobolEngineOpsUtils.h::cdot_pow2``).
  3. *Draw* (``torch._sobol_engine_draw``): Gray-code order — point 0 is the
     shift; point i+1 XORs in ``state[:, rightmost_zero(i)]``; the int64 word
     is converted to float32 and scaled by 2^-30.

Validated bit-exact against torch across (dim, seed, n) combos incl. the
shipped production table; golden tests in ``tests/test_codebook.py`` keep it
pinned.  Everything here is host-side numpy at init/codegen time — never in
the jitted compute path.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.stats import norm

_REPO_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "assets"
)
# GVQ_CODEBOOK_DIR overrides where generated tables are cached; the Sobol
# direction-number state below is package data and always loads from the repo
_ASSET_DIR = os.environ.get("GVQ_CODEBOOK_DIR", _REPO_ASSET_DIR)

MAXBIT = 30  # torch SobolEngine.MAXBIT
_SOBOL_STATE_DIMS = 256

# module-level memo: (n, g, seed) -> np.ndarray
_CACHE: dict = {}


def _asset_path(n_samples: int, n_variable: int, seed: int) -> str:
    return os.path.join(_ASSET_DIR, f"prior_samples_n{n_samples}_g{n_variable}_s{seed}.npy")


def _sobol_state(n_variable: int) -> np.ndarray:
    """Unscrambled (n_variable, MAXBIT) int64 direction-number state."""
    if n_variable > _SOBOL_STATE_DIMS:
        raise ValueError(
            f"shipped Sobol direction numbers cover <= {_SOBOL_STATE_DIMS} dims, "
            f"got {n_variable}; extend assets/sobol_state_d256.npy"
        )
    state = np.load(os.path.join(_REPO_ASSET_DIR, "sobol_state_d256.npy"))
    return state[:n_variable]


def _scramble(state: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """torch SobolEngine._scramble: returns (scrambled_state, shift)."""
    dim = state.shape[0]
    rs = np.random.RandomState(seed)
    # torch draws shift bits first, then LMS bits, from one MT19937 stream
    shift_bits = (
        rs.randint(0, 2**32, size=dim * MAXBIT, dtype=np.uint32).astype(np.int64) % 2
    ).reshape(dim, MAXBIT)
    shift = shift_bits @ (1 << np.arange(MAXBIT, dtype=np.int64))
    ltm = (
        rs.randint(0, 2**32, size=dim * MAXBIT * MAXBIT, dtype=np.uint32).astype(np.int64)
        .reshape(dim, MAXBIT, MAXBIT) % 2
    )
    ltm = np.tril(ltm)
    idx = np.arange(MAXBIT)
    ltm[:, idx, idx] = 1  # unit diagonal keeps the scramble invertible
    # state bits MSB-first: B[d, j, c] = bit (MAXBIT-1-c) of state[d, j]
    bits = (state[:, :, None] >> (MAXBIT - 1 - idx)[None, None, :]) & 1
    # scrambled bit p of word j in dim d = <L[d, p, :], B[d, j, :]> mod 2
    mixed = np.einsum("dpc,djc->djp", ltm, bits) % 2
    scrambled = (mixed * (1 << (MAXBIT - 1 - idx))[None, None, :]).sum(-1)
    return scrambled.astype(np.int64), shift.astype(np.int64)


def _draw(state: np.ndarray, shift: np.ndarray, n: int) -> np.ndarray:
    """Gray-code Sobol draw: (n, dim) float32 in [0, 1), torch-bit-exact."""
    dim = state.shape[0]
    rows = np.empty((n, dim), dtype=np.int64)
    rows[0] = shift
    if n > 1:
        i = np.arange(n - 1, dtype=np.int64)
        # rightmost_zero(i) = trailing ones of i = trailing zeros of i+1
        lsb = (i + 1) & -(i + 1)
        level = np.log2(lsb.astype(np.float64)).astype(np.int64)
        rows[1:] = shift[None, :] ^ np.bitwise_xor.accumulate(state[:, level].T, axis=0)
    return rows.astype(np.float32) * np.float32(2.0 ** -MAXBIT)


def generate(n_samples: int, n_variable: int, seed: int) -> np.ndarray:
    """Generate the (n_samples, n_variable) float32 codebook in pure numpy."""
    if not 0 <= seed < 2**32:
        # np.random.RandomState seeding only mirrors torch manual_seed for
        # 32-bit seeds; every shipped config uses seed=42
        raise ValueError(f"seed must be a 32-bit unsigned int, got {seed}")
    scrambled, shift = _scramble(_sobol_state(n_variable), seed)
    u = _draw(scrambled, shift, n_samples)
    return norm.ppf(u).astype(np.float32)  # ppf in float64, cast as the reference does


def prior_samples(n_samples: int, n_variable: int, seed: int = 42) -> np.ndarray:
    """Return the (n_samples, n_variable) float32 codebook.

    Loads the cached asset when present; otherwise generates in numpy and
    writes the asset (if the asset dir is writable) so future loads are free.
    """
    key = (n_samples, n_variable, seed)
    if key in _CACHE:
        return _CACHE[key]
    path = _asset_path(n_samples, n_variable, seed)
    if os.path.exists(path):
        table = np.load(path)
    else:
        table = generate(n_samples, n_variable, seed)
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
