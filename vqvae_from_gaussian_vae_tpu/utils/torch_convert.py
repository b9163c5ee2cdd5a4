"""Convert reference PyTorch state_dicts into this framework's param pytrees.

The linen module trees in models/ deliberately mirror the torch attribute
names, so conversion is mechanical:

  * torch ``down.0.block.1.conv1.weight`` -> params path
    ``down_0 / block_1 / conv1 / kernel`` (integer segments fuse into the
    preceding name, matching linen's list auto-naming)
  * Conv2d weight (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
  * Linear weight (O, I)          -> (I, O)
  * GroupNorm/LayerNorm weight    -> ``scale``
  * nn.MultiheadAttention ``in_proj_weight`` (3E, E) -> ``in_proj/kernel``
    (E, 3E); ``out_proj`` like a Linear

Partial loads mirror the reference's ``strict=False`` +- ``ignore_keys``
behaviour (`/root/reference/pit/models/autoencoder.py:318-329`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Tuple

import numpy as np


def torch_key_to_path(key: str) -> List[str]:
    """``down.0.block.1.conv1.weight`` -> ["down_0","block_1","conv1","weight"]."""
    parts = key.split(".")
    out: List[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _adapt(value: np.ndarray, template: np.ndarray, leaf_name: str) -> np.ndarray:
    v = np.asarray(value)
    t_shape = tuple(template.shape)
    if v.ndim == 4 and len(t_shape) == 4:
        if tuple(v.transpose(2, 3, 1, 0).shape) == t_shape:  # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
        elif tuple(v.transpose(0, 2, 3, 1).shape) == t_shape:  # NCHW stat -> NHWC
            v = v.transpose(0, 2, 3, 1)
    elif v.ndim == 5 and len(t_shape) == 5:
        if tuple(v.transpose(2, 3, 4, 1, 0).shape) == t_shape:  # Conv3d OIDHW -> DHWIO
            v = v.transpose(2, 3, 4, 1, 0)
    elif v.ndim == 2 and len(t_shape) == 2 and leaf_name == "kernel":
        v = v.T
    if tuple(v.shape) != t_shape and tuple(np.squeeze(v).shape) == t_shape:
        # broadcast-shaped affine params, e.g. WAN RMS gamma (C,1,1,1) -> (C,)
        v = np.squeeze(v)
    if tuple(v.shape) != t_shape:
        raise ValueError(f"shape mismatch for {leaf_name}: torch {value.shape} -> {v.shape}, expected {t_shape}")
    return v.astype(np.asarray(template).dtype)


def convert_state_dict(
    state_dict: Dict[str, Any],
    params_template: Dict[str, Any],
    prefix_map: Dict[str, str] | None = None,
    ignore_keys: Iterable[str] = (),
    strict: bool = False,
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Map a torch state_dict onto ``params_template``'s structure.

    prefix_map renames leading torch prefixes (e.g. {"encoder.": "encoder."}
    is implicit identity; {"loss.discriminator.": "discriminator."} re-roots).
    Returns (params, missing_paths, unexpected_keys).
    """
    flat_template = _flatten(params_template)
    out = dict(flat_template)
    matched = set()
    unexpected: List[str] = []

    for key, value in state_dict.items():
        if any(key.startswith(ik) for ik in ignore_keys):
            continue
        mapped_key = key
        if prefix_map:
            for src, dst in prefix_map.items():
                if key.startswith(src):
                    mapped_key = dst + key[len(src):]
                    break
            else:
                unexpected.append(key)
                continue
        value = value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        path = torch_key_to_path(mapped_key)
        leaf = path[-1]
        # leaf-name translation, resolved against what the template offers
        parent = tuple(path[:-1])
        candidates = {
            "weight": ("kernel", "scale", "weight", "embedding"),
            "bias": ("bias",),
            "in_proj_weight": ("kernel",),
            "in_proj_bias": ("bias",),
            "gamma": ("gamma", "scale"),
        }.get(leaf, (leaf,))
        if leaf == "in_proj_weight":
            parent = parent + ("in_proj",)
            value = value.T
        elif leaf == "in_proj_bias":
            parent = parent + ("in_proj",)
        target = None
        for cand in candidates:
            if parent + (cand,) in flat_template:
                target = parent + (cand,)
                break
        if target is None and leaf == "weight" and parent in flat_template:
            # torch nn.Embedding stores its table as `<name>.weight` while a
            # flax `self.param("<name>", ...)` leaf is the parent path itself
            # (e.g. the VQ codebook `regularization.embedding.weight` ->
            # `regularization/embedding`, vq.py:36)
            target = parent
        if target is None:
            unexpected.append(key)
            continue
        if leaf == "in_proj_weight":
            # already transposed above; _adapt must not re-transpose
            if tuple(value.shape) != tuple(flat_template[target].shape):
                raise ValueError(f"in_proj shape mismatch {value.shape} vs {flat_template[target].shape}")
            out[target] = value.astype(np.asarray(flat_template[target]).dtype)
        else:
            out[target] = _adapt(value, flat_template[target], target[-1])
        matched.add(target)

    missing = [
        "/".join(p) for p in flat_template if p not in matched
    ]
    if strict and (missing or unexpected):
        raise ValueError(f"strict load failed: missing={missing}, unexpected={unexpected}")
    import jax.numpy as jnp

    out = {k: jnp.asarray(v) for k, v in out.items()}
    return _unflatten(out), missing, unexpected


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a Lightning-style .ckpt (or raw state_dict) saved by the
    reference trainer; returns the flat torch state_dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    return blob.get("state_dict", blob) if isinstance(blob, dict) else blob
