"""TPU-native (JAX/XLA/Pallas) rebuild of the Gaussian-VAE -> VQ-VAE image tokenizer.

A from-scratch framework with the capabilities of
tongdaxu/VQ-VAE-from-Gaussian-VAE (arXiv 2512.06609): a config-driven image
tokenizer where a Gaussian VAE trained under a per-group KL budget of
log2(codebook_size) bits is converted at inference into a VQ-VAE by a
nearest-sample search over a fixed codebook of 2^16 i.i.d. standard-normal
draws.  The search runs as a fused Pallas TPU kernel; training is a single
jitted SPMD step over a `jax.sharding.Mesh`.

Layout (mirrors the reference's layer map, see SURVEY.md):
  utils/        config registry (target/params YAML), helpers        [L0]
  models/       UNet + ViT backbones, AutoencodingEngine             [L1, L3]
  quantization/ GQ / VQ / FSQ / LFQ / BSQ regularizers               [L2]
  ops/          codebook generation + GQ search (XLA and Pallas)     [L2n]
  losses/       LPIPS + PatchGAN discriminator loss                  [L4]
  data/         image-folder pipeline                                [L5]
  parallel/     mesh/sharding helpers, SPMD train step               [L6a]
  evaluations/  PSNR / SSIM / LPIPS / FID metrics                    [L7]
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# This image's axon TPU plugin overrides the JAX_PLATFORMS env var during
# plugin registration; honour an explicit cpu request (tests, the driver's
# virtual-device dry runs) through jax.config, which does win.
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialised; caller controlled it explicitly

# Persistent XLA compilation cache: the full fused-kernel engine takes
# minutes to compile cold (the eval metric graph ~15 min over the remote
# tunnel); with the cache, re-runs of bench/eval/serve start warm.  Opt out
# with GVQ_COMPILE_CACHE=off, redirect with GVQ_COMPILE_CACHE=<dir>.
# CPU-only runs (tests, virtual-mesh dryruns) skip it: XLA:CPU caches AOT
# machine code keyed on the compile host's CPU features, and replaying an
# entry on a host with a different feature set risks SIGILL; CPU compiles
# are cheap enough that the cache buys nothing there.  The gate reads the
# effective platforms config (the TPU plugin registers itself there, e.g.
# "axon,cpu") rather than the env var alone, so a host where no
# accelerator plugin loaded and JAX silently falls back to CPU also stays
# out of the shared cache.
_cache_dir = _os.environ.get("GVQ_COMPILE_CACHE", "")
_plat = (
    _os.environ.get("JAX_PLATFORMS", "").strip()
    or (getattr(_jax.config, "jax_platforms", None) or "")
)
_cpu_only = all(p.strip().lower() in ("", "cpu") for p in _plat.split(","))
if _cache_dir.lower() != "off" and not _cpu_only:
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _cache_dir or _os.path.expanduser("~/.cache/vqvae_gvq_tpu/xla"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax or read-only fs: cold compiles only

from vqvae_from_gaussian_vae_tpu.utils.config import (  # noqa: F401
    instantiate_from_config,
    get_obj_from_str,
    load_config,
)
