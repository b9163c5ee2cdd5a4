"""Config registry: YAML configs naming fully-qualified class paths.

Reimplements the reference's reflective `target:`/`params:` composition
(`/root/reference/pit/util.py:45-62`) plus the subset of OmegaConf behaviour
the shipped configs rely on (`/root/reference/main.py:591-593`):

  * multi-base merge (later files override earlier ones, dict-deep)
  * ``${a.b.c}`` interpolation (e.g. decoder params aliasing encoder params,
    `configs/sd3unet_gq_0.25.yaml:52`)
  * dotlist CLI overrides (``model.params.foo=3``) merged last

No OmegaConf dependency - plain PyYAML + dicts.
"""

from __future__ import annotations

import ast
import copy
import importlib
import re
from typing import Any, Iterable, Mapping

import yaml

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")


def exists(x: Any) -> bool:
    return x is not None


def default(val: Any, d: Any) -> Any:
    if val is not None:
        return val
    return d() if callable(d) else d


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve ``pkg.module.ClassName`` to the class object."""
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


# Reference class paths -> our equivalents, so the reference's shipped YAMLs
# work verbatim against this framework.
_TARGET_ALIASES = {
    "pit.models.autoencoder.AutoencodingEngine": "vqvae_from_gaussian_vae_tpu.models.autoencoder.AutoencodingEngine",
    "pit.modules.unet.Encoder": "vqvae_from_gaussian_vae_tpu.models.unet.Encoder",
    "pit.modules.unet.Decoder": "vqvae_from_gaussian_vae_tpu.models.unet.Decoder",
    "pit.modules.vit.TransformerEncoder": "vqvae_from_gaussian_vae_tpu.models.vit.TransformerEncoder",
    "pit.modules.vit.TransformerDecoder": "vqvae_from_gaussian_vae_tpu.models.vit.TransformerDecoder",
    "pit.quantization.gaussian.GaussianQuantRegularizer": "vqvae_from_gaussian_vae_tpu.quantization.gaussian.GaussianQuantRegularizer",
    "pit.quantization.gaussian.GaussianQuantRegularizer2": "vqvae_from_gaussian_vae_tpu.quantization.gaussian.GaussianQuantRegularizer2",
    # The reference names this class in two configs but never defines it
    # (SURVEY.md 2.4); we provide a real implementation.
    "pit.quantization.gaussian.GaussianRegularizer": "vqvae_from_gaussian_vae_tpu.quantization.gaussian.GaussianRegularizer",
    "pit.quantization.gaussian.IdentityRegularizer": "vqvae_from_gaussian_vae_tpu.quantization.gaussian.IdentityRegularizer",
    "pit.quantization.vq.VQQuantizer": "vqvae_from_gaussian_vae_tpu.quantization.vq.VQQuantizer",
    "pit.quantization.fsq.FSQQuantizer": "vqvae_from_gaussian_vae_tpu.quantization.fsq.FSQQuantizer",
    "pit.quantization.lfq.LFQQuantizer": "vqvae_from_gaussian_vae_tpu.quantization.lfq.LFQQuantizer",
    "pit.quantization.bsq.BSQQuantizer": "vqvae_from_gaussian_vae_tpu.quantization.bsq.BSQQuantizer",
    "pit.modules.losses.discriminator_loss.GeneralLPIPSWithDiscriminator": "vqvae_from_gaussian_vae_tpu.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
    "pit.modules.lpips.model.model.NLayerDiscriminator": "vqvae_from_gaussian_vae_tpu.losses.discriminator.NLayerDiscriminator",
    "pit.data.ImageDataModuleFromConfig": "vqvae_from_gaussian_vae_tpu.data.dataset.ImageDataModuleFromConfig",
    "pit.data.SimpleDataset": "vqvae_from_gaussian_vae_tpu.data.dataset.SimpleDataset",
    "main.ImageLogger": "vqvae_from_gaussian_vae_tpu.utils.loggers.ImageLogger",
    # frozen third-party eval baselines (`pit/models/autoencoder.py:25-217`)
    "pit.models.autoencoder.AutoencoderKLQwenImage": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLQwenImage",
    "pit.models.autoencoder.AutoencoderKLWAN": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLWAN",
    "pit.models.autoencoder.AutoencoderKLFLUX": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLFLUX",
    "pit.models.autoencoder.AutoencoderKLSD3": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLSD3",
    "pit.models.autoencoder.AutoencoderKLEQ": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLEQ",
    "pit.models.autoencoder.AutoencoderKLHYImage2": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLHYImage2",
    "pit.models.autoencoder.AutoencoderKLHYImage3": "vqvae_from_gaussian_vae_tpu.models.third_party.AutoencoderKLHYImage3",
    "pit.models.postprocessor.AutoencodingPostEngine": "vqvae_from_gaussian_vae_tpu.models.postprocessor.AutoencodingPostEngine",
    "pit.models.hyvae.HunyuanVAE2D": "vqvae_from_gaussian_vae_tpu.models.hyvae.HunyuanVAE2D",
}


def resolve_target(target: str) -> str:
    return _TARGET_ALIASES.get(target, target)


def instantiate_from_config(config: Mapping[str, Any], **extra_kwargs: Any) -> Any:
    """Reflectively instantiate ``config['target'](**config['params'])``.

    Mirrors `/root/reference/pit/util.py:45-52` (incl. the legacy sentinel
    strings) while transparently mapping reference (`pit.*`) class paths onto
    this package.
    """
    if "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    cls = get_obj_from_str(resolve_target(config["target"]))
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return cls(**params)


# ---------------------------------------------------------------------------
# YAML loading / merging / interpolation


def _deep_merge(base: Any, override: Any) -> Any:
    if isinstance(base, dict) and isinstance(override, dict):
        out = dict(base)
        for k, v in override.items():
            out[k] = _deep_merge(base[k], v) if k in base else v
        return out
    return override


def _select(root: Mapping[str, Any], dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def _resolve_interp(node: Any, root: Mapping[str, Any], depth: int = 0) -> Any:
    if depth > 16:
        raise RecursionError("config interpolation too deep (cycle?)")
    if isinstance(node, str):
        m = _INTERP_RE.match(node)
        if m:
            return _resolve_interp(_select(root, m.group(1)), root, depth + 1)
        return node
    if isinstance(node, dict):
        return {k: _resolve_interp(v, root, depth) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_interp(v, root, depth) for v in node]
    return node


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return text


def apply_dotlist(cfg: dict, dotlist: Iterable[str]) -> dict:
    """Apply ``a.b.c=value`` overrides (the reference's unknown-CLI-arg merge,
    `/root/reference/main.py:592-593`)."""
    cfg = copy.deepcopy(cfg)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist override must look like key=value, got {item!r}")
        key, value = item.split("=", 1)
        parts = key.lstrip("-").split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg


def load_config(
    bases: Iterable[str] | str,
    dotlist: Iterable[str] = (),
    resolve: bool = True,
) -> dict:
    """Load one or more YAML files, deep-merging left to right, apply dotlist
    overrides, then resolve ``${...}`` interpolations."""
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for path in bases:
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        merged = _deep_merge(merged, cfg)
    if dotlist:
        merged = apply_dotlist(merged, dotlist)
    if resolve:
        merged = _resolve_interp(merged, merged)
    return merged
