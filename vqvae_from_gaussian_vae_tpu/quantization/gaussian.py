"""Gaussian-quantization regularizers: the paper's contribution.

Train mode: plain Gaussian VAE sampling plus a three-band KL loss that pushes
each group's KL (in bits) toward log2(n_samples) within ``tolerance``, with
multiplicative dual variables (lam / lam_min / lam_max) adapted every step
from batch KL statistics (`/root/reference/pit/quantization/gaussian.py:
83-119`).

Eval mode: nearest-sample search over the fixed 2^16-entry i.i.d. Gaussian
codebook - argmax_n [log q(c_n|mu,std) - beta*log p(c_n)] - turning the
Gaussian VAE into a VQ-VAE (`gaussian.py:120-159`).  The search runs through
:mod:`..ops.gq_search` (fused Pallas kernel on TPU, blocked XLA elsewhere).

TPU-native deviations from the reference (all documented in SURVEY.md 2.4):
  * The dual variables are explicit train state passed in/out of the pure
    forward (the reference mutates python floats that are never synced
    across ranks nor checkpointed).  Under SPMD the caller updates them from
    psum-reduced KL stats via :func:`update_duals`.
  * RNG is explicit (flax rng stream "sample").
  * Layout is NHWC/blc; see quantization.common.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.ops import codebook as codebook_ops
from vqvae_from_gaussian_vae_tpu.ops.gq_search import gq_search
from vqvae_from_gaussian_vae_tpu.quantization.common import ALL_FORMATS, from_tokens, to_tokens

LOG2E = 1.4426  # the reference's truncated log2(e) constant (gaussian.py:86)


def init_duals() -> Dict[str, jnp.ndarray]:
    return {
        "lam": jnp.float32(1.0),
        "lam_min": jnp.float32(1.0),
        "lam_max": jnp.float32(1.0),
    }


def update_duals(
    duals: Dict[str, jnp.ndarray],
    stats: Dict[str, jnp.ndarray],
    log_n_samples: float,
    tolerance: float,
    lam_factor: float,
    lam_range: Tuple[float, float] = (1e-3, 1e3),
) -> Dict[str, jnp.ndarray]:
    """Multiplicative dual update from KL stats (`gaussian.py:100-115`).

    stats carries "bits-mean"/"bits-min"/"bits-max"; under data parallelism
    the caller should psum-mean/min/max them across the mesh first.
    """
    f = jnp.float32(lam_factor)
    lam = duals["lam"] * jnp.where(stats["bits-mean"] > log_n_samples, f, 1.0 / f)
    lam_max = duals["lam_max"] * jnp.where(
        stats["bits-max"] > log_n_samples + tolerance, f, 1.0 / f
    )
    lam_max = jnp.clip(lam_max, 1.0, lam_range[1])
    lam_min = duals["lam_min"] * jnp.where(
        stats["bits-min"] < log_n_samples - tolerance, 1.0 / f, f
    )
    lam_min = jnp.clip(lam_min, lam_range[0], 1.0)
    return {"lam": lam, "lam_min": lam_min, "lam_max": lam_max}


def _split_posterior(z: jnp.ndarray, logvar_range) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """z (..., 2C) -> mu, logvar (clamped), std (`gaussian.py:77-80`)."""
    mu, logvar = jnp.split(z.astype(jnp.float32), 2, axis=-1)
    logvar = jnp.clip(logvar, logvar_range[0], logvar_range[1])
    std = jnp.exp(0.5 * logvar)
    return mu, logvar, std


class GaussianQuantRegularizer(nn.Module):
    """Per-group GQ regularizer (`gaussian.py:22-178`).

    Grouping note (faithful to the reference): channels are split as
    c -> (group, c//group) row-major, and KL is summed over the *first*
    factor - i.e. each of the ng = c//group bit-groups gathers the strided
    channels {j, ng+j, 2*ng+j, ...}.
    """

    format: str
    n_samples: int
    group: int = 1
    logvar_range: Tuple[float, float] = (-30.0, 20.0)
    tolerance: float = 0.5
    lam_factor: float = 1.01
    seed: int = 42
    beta: float = 1.0
    backend: str = "auto"  # "pallas" | "xla" | "auto"; "cuda"/"torch" accepted as aliases

    def setup(self):
        assert self.format in ALL_FORMATS, self.format
        self.log_n_samples = int(math.log(self.n_samples, 2))
        self._codebook_np = codebook_ops.prior_samples(self.n_samples, self.group, self.seed)

    @property
    def search_backend(self) -> str:
        return {"cuda": "auto", "torch": "xla"}.get(self.backend, self.backend)

    def codebook_array(self) -> jnp.ndarray:
        return jnp.asarray(self._codebook_np)

    def __call__(
        self,
        z: jnp.ndarray,
        train: bool = False,
        duals: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        zt, hw = to_tokens(z, self.format)
        b, l, c2 = zt.shape
        c = c2 // 2
        ng = c // self.group
        mu, logvar, std = _split_posterior(zt, self.logvar_range)
        var = jnp.exp(logvar)

        if train:
            if duals is None:
                duals = init_duals()
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, jnp.float32)
            zhat = mu + eps * std
            # KL in bits per (b, l, bit-group): sum over the strided group axis.
            kl2 = LOG2E * 0.5 * (mu * mu + var - 1.0 - logvar)
            kl2 = kl2.reshape(b, l, self.group, ng).sum(axis=2)
            bits_mean = jnp.mean(kl2)
            bits_min = jnp.min(kl2)
            bits_max = jnp.max(kl2)
            target = float(self.log_n_samples)
            ge = (kl2 > target + self.tolerance).astype(kl2.dtype) * duals["lam_max"]
            eq = (
                (kl2 <= target + self.tolerance).astype(kl2.dtype)
                * (kl2 >= target - self.tolerance).astype(kl2.dtype)
            )
            le = (kl2 < target - self.tolerance).astype(kl2.dtype) * duals["lam_min"]
            kl_loss = jnp.sum((ge + eq + le) * kl2, axis=(1, 2))
            kl_loss = jnp.mean(kl_loss) * duals["lam"]
            zhat = from_tokens(zhat, self.format, hw)
            info = {
                "kl_loss": kl_loss,
                "bits-mean": bits_mean,
                "bits-min": bits_min,
                "bits-max": bits_max,
                "lam": duals["lam"],
            }
            return zhat, info

        # eval: VQ-VAE via nearest-sample search
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, jnp.float32)
        zhat_noquant = mu + eps * std
        # (b, l, c) -> rows (b*l*ng, group) with the strided grouping
        mu_rows = mu.reshape(b, l, self.group, ng).transpose(0, 1, 3, 2).reshape(-1, self.group)
        std_rows = std.reshape(b, l, self.group, ng).transpose(0, 1, 3, 2).reshape(-1, self.group)
        cb = self.codebook_array()
        indices = gq_search(mu_rows, std_rows, cb, beta=self.beta, backend=self.search_backend)
        zhat = jnp.take(cb, indices, axis=0)
        zhat = zhat.reshape(b, l, ng, self.group).transpose(0, 1, 3, 2).reshape(b, l, c)
        indices = indices.reshape(b, l, ng)
        zhat = from_tokens(zhat.astype(jnp.float32), self.format, hw)
        zhat_noquant = from_tokens(zhat_noquant, self.format, hw)
        if hw is not None:
            indices = indices.reshape(b, hw[0], hw[1], ng)
        info = {"indices": indices, "zhat_noquant": zhat_noquant}
        return zhat, info

    def dequant(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices -> zhat via codebook lookup + group interleave
        (`gaussian.py:162-178`)."""
        if self.format in ("bchw", "bhwc"):
            b, h, w, ng = indices.shape
            l, hw = h * w, (h, w)
            flat = indices.reshape(b, l, ng)
        else:
            b, l, ng = indices.shape
            hw, flat = None, indices
        cb = self.codebook_array()
        zhat = jnp.take(cb, flat.reshape(-1), axis=0).astype(jnp.float32)
        zhat = zhat.reshape(b, l, ng, self.group).transpose(0, 1, 3, 2).reshape(b, l, ng * self.group)
        return from_tokens(zhat, self.format, hw)


class GaussianRegularizer(nn.Module):
    """Pure Gaussian-VAE KL regularizer.

    The reference's configs `sd3unet_gaussian_kl_0.64.yaml:28` and
    `sd3unet_gq_0.25_gaussian.yaml:28` name this class but never define it
    (SURVEY.md 2.4); this is the real implementation: reparameterised
    sampling plus the standard KL, emitted under the "kl" key to match
    `regularization_weights: {kl: 0.64}`.
    """

    format: str
    logvar_range: Tuple[float, float] = (-30.0, 20.0)

    def __call__(self, z, train: bool = False, duals=None):
        zt, hw = to_tokens(z, self.format)
        mu, logvar, std = _split_posterior(zt, self.logvar_range)
        var = jnp.exp(logvar)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, jnp.float32)
        zhat = mu + eps * std
        kl = 0.5 * jnp.sum(mu * mu + var - 1.0 - logvar, axis=(1, 2))
        kl = jnp.mean(kl)
        zhat = from_tokens(zhat, self.format, hw)
        if train:
            return zhat, {"kl": kl}
        return zhat, {"kl": kl, "zhat_noquant": zhat}

    def dequant(self, indices):
        raise NotImplementedError("pure Gaussian VAE has no codebook to dequantize from")


class IdentityRegularizer(nn.Module):
    """Pass-through (`gaussian.py:365-370`)."""

    def __call__(self, z, train: bool = False, duals=None):
        return z, {}

    def dequant(self, indices):
        return indices


class GaussianQuantRegularizer2(nn.Module):
    """Dimension-generic GQ variant with straight-through estimation
    (`gaussian.py:181-362`).

    The channel axis (``dim_idx``) is split into ``codebook_num`` contiguous
    sub-codebooks of width ``dim`` after the mu/logvar chunk; training uses
    zhat = zhat_gaussian - sg(zhat_gaussian) + zhat_vq when ``use_ste``.

    Deviation: the reference's lam_max update has a missing assignment on the
    decay branch (`gaussian.py:251`, SURVEY.md 2.4); we implement the intended
    symmetric decay.
    """

    dim: int
    codebook_size: int
    dim_idx: int = -1  # native NHWC: channels last (torch default 1 == channels)
    logvar_range: Tuple[float, float] = (-30.0, 20.0)
    tolerance: float = 0.5
    lam_factor: float = 1.01
    seed: int = 42
    beta: float = 1.0
    use_ste: bool = True
    backend: str = "auto"
    lam_range: Tuple[float, float] = (1e-7, 1e7)

    def setup(self):
        self.log_n_samples = int(math.log(self.codebook_size, 2))
        self._codebook_np = codebook_ops.prior_samples(self.codebook_size, self.dim, self.seed)

    @property
    def search_backend(self) -> str:
        return {"cuda": "auto", "torch": "xla"}.get(self.backend, self.backend)

    def codebook_array(self) -> jnp.ndarray:
        return jnp.asarray(self._codebook_np)

    def _to_rows(self, z):
        z = jnp.moveaxis(z, self.dim_idx, -1)
        assert z.shape[-1] % (self.dim * 2) == 0
        shape = z.shape
        return z.reshape(-1, shape[-1]), shape

    def _from_rows(self, x, shape):
        x = x.reshape(*shape[:-1], -1)
        return jnp.moveaxis(x, -1, self.dim_idx)

    def quant_gaussian(self, z, duals):
        rows, shape = self._to_rows(z)
        codebook_num = shape[-1] // (self.dim * 2)
        mu, logvar, std = _split_posterior(rows, self.logvar_range)
        var = jnp.exp(logvar)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, jnp.float32)
        zhat = mu + eps * std
        kl2 = LOG2E * 0.5 * (mu * mu + var - 1.0 - logvar)
        kl2 = kl2.reshape(-1, codebook_num, self.dim).sum(axis=-1)
        bits_mean, bits_min, bits_max = jnp.mean(kl2), jnp.min(kl2), jnp.max(kl2)
        target = float(self.log_n_samples)
        ge = (kl2 > target + self.tolerance).astype(kl2.dtype) * duals["lam_max"]
        eq = (
            (kl2 <= target + self.tolerance).astype(kl2.dtype)
            * (kl2 >= target - self.tolerance).astype(kl2.dtype)
        )
        le = (kl2 < target - self.tolerance).astype(kl2.dtype) * duals["lam_min"]
        kl_loss = jnp.mean((ge + eq + le) * kl2) * duals["lam"]
        info = {
            "kl_loss": kl_loss,
            "bits-mean": bits_mean,
            "bits-min": bits_min,
            "bits-max": bits_max,
            "lam": duals["lam"],
            "lam-min": duals["lam_min"],
            "lam-max": duals["lam_max"],
            "mu": self._from_rows(mu, shape),
            "std": self._from_rows(std, shape),
            "zhat_noquant": self._from_rows(zhat, shape),
        }
        return self._from_rows(zhat, shape), info

    def quant_vq(self, z):
        rows, shape = self._to_rows(z)
        codebook_num = shape[-1] // (self.dim * 2)
        mu, logvar, std = _split_posterior(rows, self.logvar_range)
        mu_rows = mu.reshape(-1, self.dim)
        std_rows = std.reshape(-1, self.dim)
        cb = self.codebook_array()
        indices = gq_search(mu_rows, std_rows, cb, beta=self.beta, backend=self.search_backend)
        zhat = jnp.take(cb, indices, axis=0)
        zhat = zhat.reshape(-1, codebook_num * self.dim).astype(jnp.float32)
        indices = indices.reshape(-1, codebook_num)
        out_shape = shape[:-1] + (codebook_num * self.dim,)
        zhat = zhat.reshape(*shape[:-1], -1)
        zhat = jnp.moveaxis(zhat, -1, self.dim_idx)
        indices = indices.reshape(*shape[:-1], -1)
        indices = jnp.moveaxis(indices, -1, self.dim_idx)
        del out_shape
        return zhat, {"indices": indices, "zhat_quant": zhat}

    def __call__(self, z, train: bool = False, duals=None):
        if duals is None:
            duals = init_duals()
        zhat_g, info_g = self.quant_gaussian(z, duals)
        zhat_v, info_v = self.quant_vq(jax.lax.stop_gradient(z))
        zhat_v = jax.lax.stop_gradient(zhat_v)
        if self.use_ste:
            zhat = zhat_g - jax.lax.stop_gradient(zhat_g) + zhat_v
        else:
            zhat = zhat_g if train else zhat_v
        info = {**info_g, **info_v}
        return zhat, info

    def dequant(self, indices):
        indices = jnp.moveaxis(indices, self.dim_idx, -1)
        i_shape = indices.shape
        codebook_num = i_shape[-1]
        cb = self.codebook_array()
        zhat = jnp.take(cb, indices.reshape(-1), axis=0).astype(jnp.float32)
        zhat = zhat.reshape(-1, codebook_num * self.dim)
        zhat = zhat.reshape(*i_shape[:-1], -1)
        return jnp.moveaxis(zhat, -1, self.dim_idx)

    @staticmethod
    def update_duals(duals, stats, log_n_samples, tolerance, lam_factor, lam_range=(1e-7, 1e7)):
        return update_duals(duals, stats, log_n_samples, tolerance, lam_factor, lam_range)
