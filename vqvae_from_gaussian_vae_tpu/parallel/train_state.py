"""Explicit train state for the two-optimizer GAN setup.

The reference keeps this implicit in Lightning (two torch optimizers,
`autoencoder.py:567-592`) and in *python floats* for the GQ dual variables -
which are therefore never DDP-synced nor checkpointed (SURVEY.md 2.4).
Here everything is one pytree: params, both optax states, the duals, the
step counter, and the RNG key - so Orbax checkpoints capture training
exactly and SPMD keeps every rank identical by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar, the reference's global_step
    engine_params: Any
    loss_params: Any
    ae_opt_state: Any
    disc_opt_state: Any
    duals: Dict[str, jnp.ndarray]  # GQ dual variables (lam/lam_min/lam_max)
    rng: jax.Array

    def global_step(self) -> int:
        return int(self.step)


def torch_param_name(path) -> str:
    """flax tree path -> reference torch parameter name, so the reference's
    regex param-group configs (`autoencoder.py:549-565`) work nearly
    verbatim: list-index segments un-fuse (``down_0`` -> ``down.0``) and the
    flax leaf names map to torch's ``weight``."""
    import re

    parts = []
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        if key is None:
            key = str(getattr(p, "idx", p))
        key = str(key)
        m = re.fullmatch(r"(.+)_(\d+)", key)
        parts.append(f"{m.group(1)}.{m.group(2)}" if m else key)
    name = ".".join(parts)
    return re.sub(r"\.(kernel|scale)$", ".weight", name)


def _group_label_fn(parameter_names, prefix: str = ""):
    """Labeler for optax.multi_transform: first group whose regex list
    matches (re.match, like the reference's `get_param_groups`,
    `autoencoder.py:553-563`) wins; unmatched params are frozen."""
    import re

    regs = [[re.compile(p) for p in pats] for pats in parameter_names]

    def label(path, _leaf):
        name = prefix + torch_param_name(path)
        for i, pats in enumerate(regs):
            if any(r.match(name) for r in pats):
                return f"g{i}"
        return "frozen"

    return label


def _grouped_transform(factory, base_lr: float, base_kwargs: Dict,
                       parameter_names, optimizer_args, label_of_path):
    """optax.multi_transform over regex param groups: per-group optimizer
    args (a group's ``lr`` overrides the base), unmatched params frozen -
    the reference's `get_param_groups` + per-group torch optimizer args
    (`autoencoder.py:549-592`)."""
    optimizer_args = optimizer_args or [{} for _ in parameter_names]
    assert len(optimizer_args) == len(parameter_names), \
        "optimizer_args must pair 1:1 with trainable param groups"
    transforms = {"frozen": optax.set_to_zero()}
    for i, args in enumerate(optimizer_args):
        args = dict(args or {})
        lr = float(args.pop("lr", base_lr))
        transforms[f"g{i}"] = factory(lr, **{**base_kwargs, **args})

    def param_labels(params):
        return jax.tree_util.tree_map_with_path(label_of_path, params)

    return optax.multi_transform(transforms, param_labels)


def make_optimizers(
    learning_rate: float,
    optimizer_config: Optional[Dict] = None,
    accumulate_grad_batches: int = 1,
    lr_g_factor: float = 1.0,
    trainable_ae_params=None,
    ae_optimizer_args=None,
    trainable_disc_params=None,
    disc_optimizer_args=None,
):
    """Adam by default (the reference's torch.optim.Adam,
    `autoencoder.py:282-284`); target/params configs name optax factories.

    The generator optimizer runs at ``lr_g_factor * learning_rate``
    (`autoencoder.py:582`).  ``trainable_ae_params`` /
    ``trainable_disc_params`` are lists of regex-pattern groups over torch
    param names ("encoder.*", "loss.logvar", "loss.discriminator.*"...);
    params matching no group are frozen, and the paired ``*_optimizer_args``
    dicts supply per-group overrides (`autoencoder.py:549-592`).

    accumulate_grad_batches > 1 wraps both optimizers in optax.MultiSteps
    (the Trainer.accumulate_grad_batches analog, `main.py:820-830`) - each
    optimizer accumulates across its own phase's steps."""
    cfg = optimizer_config or {"target": "optax.adam"}
    import importlib

    module, fn = cfg["target"].rsplit(".", 1)
    factory = getattr(importlib.import_module(module), fn)
    params = dict(cfg.get("params", {}))
    g_lr = float(lr_g_factor if lr_g_factor is not None else 1.0) * learning_rate

    if trainable_ae_params is None:
        ae_opt = factory(g_lr, **params)
    else:
        base_label = _group_label_fn(trainable_ae_params)

        def ae_label(path, leaf):
            # the ae grad tree is (engine_params, logvar); logvar's torch
            # name is "loss.logvar" (it lives on the loss module there)
            if path and getattr(path[0], "idx", None) == 1:
                return _match_name(trainable_ae_params, "loss.logvar")
            return base_label(path[1:], leaf)

        ae_opt = _grouped_transform(
            factory, g_lr, params, trainable_ae_params, ae_optimizer_args, ae_label
        )
    if trainable_disc_params is None:
        disc_opt = factory(learning_rate, **params)
    else:
        disc_opt = _grouped_transform(
            factory, learning_rate, params, trainable_disc_params,
            disc_optimizer_args, _group_label_fn(trainable_disc_params,
                                                 prefix="loss.discriminator."),
        )
    if accumulate_grad_batches > 1:
        ae_opt = optax.MultiSteps(ae_opt, accumulate_grad_batches)
        disc_opt = optax.MultiSteps(disc_opt, accumulate_grad_batches)
    return ae_opt, disc_opt


def _match_name(parameter_names, name: str) -> str:
    import re

    for i, pats in enumerate(parameter_names):
        if any(re.match(p, name) for p in pats):
            return f"g{i}"
    return "frozen"


def init_train_state(
    rng: jax.Array,
    engine_params,
    loss_params,
    ae_opt: optax.GradientTransformation,
    disc_opt: optax.GradientTransformation,
    duals: Optional[Dict[str, jnp.ndarray]] = None,
) -> TrainState:
    from vqvae_from_gaussian_vae_tpu.quantization.gaussian import init_duals

    logvar = loss_params["logvar"] if loss_params is not None else jnp.float32(0.0)
    ae_opt_state = ae_opt.init((engine_params, logvar))
    disc_params = loss_params.get("discriminator") if loss_params else None
    disc_opt_state = disc_opt.init(disc_params) if disc_params is not None else ()
    return TrainState(
        step=jnp.int32(0),
        engine_params=engine_params,
        loss_params=loss_params,
        ae_opt_state=ae_opt_state,
        disc_opt_state=disc_opt_state,
        duals=duals if duals is not None else init_duals(),
        rng=rng,
    )
