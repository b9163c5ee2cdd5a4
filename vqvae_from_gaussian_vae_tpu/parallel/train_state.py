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


def make_optimizers(
    learning_rate: float,
    optimizer_config: Optional[Dict] = None,
    accumulate_grad_batches: int = 1,
):
    """Adam by default (the reference's torch.optim.Adam,
    `autoencoder.py:282-284`); target/params configs name optax factories.
    accumulate_grad_batches > 1 wraps both optimizers in optax.MultiSteps
    (the Trainer.accumulate_grad_batches analog, `main.py:820-830`) - each
    optimizer accumulates across its own phase's steps."""
    cfg = optimizer_config or {"target": "optax.adam"}
    import importlib

    module, fn = cfg["target"].rsplit(".", 1)
    factory = getattr(importlib.import_module(module), fn)
    params = dict(cfg.get("params", {}))
    ae_opt = factory(learning_rate, **params)
    disc_opt = factory(learning_rate, **params)
    if accumulate_grad_batches > 1:
        ae_opt = optax.MultiSteps(ae_opt, accumulate_grad_batches)
        disc_opt = optax.MultiSteps(disc_opt, accumulate_grad_batches)
    return ae_opt, disc_opt


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
