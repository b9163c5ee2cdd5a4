"""Rectified-flow reconstruction enhancer
(`/root/reference/pit/models/postprocessor.py:16-211`).

A frozen autoencoder produces xhat = decode(encode(x)); a trainable velocity
net ("poster", e.g. models.hdit.create_hdit_model) learns the flow from the
noised reconstruction xhat_0 = xhat + sigma*eps toward the original x:

    train: t ~ U;  x_t = t*x + (1-t)*xhat_0;  min ||v(x_t, t) - (x - xhat_0)||^2
    post:  Euler-integrate v from xhat_0 over num_flow_steps  (here a single
           jitted lax.scan instead of the reference's python loop,
           postprocessor.py:121-136)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from vqvae_from_gaussian_vae_tpu.utils.config import default, instantiate_from_config


class AutoencodingPostEngine:
    def __init__(
        self,
        *,
        input_key: str = "img",
        eval_only: bool = False,
        encoder_config: Dict,
        decoder_config: Dict,
        post_config: Dict,
        regularizer_config: Dict,
        optimizer_config: Optional[Dict] = None,
        ckpt_path: Optional[str] = None,
        ckpt_engine=None,
        additional_decode_keys: Optional[List[str]] = None,
        clamp_range: Optional[Sequence[float]] = None,
        num_flow_steps: int = 50,
        mmse_noise_std: float = 0.1,
        seed: int = 0,
        **kwargs,
    ):
        from vqvae_from_gaussian_vae_tpu.models.autoencoder import AutoencodingEngine

        if additional_decode_keys:
            raise NotImplementedError(
                "additional_decode_keys is not supported: decode(z) takes no "
                f"extra batch keys (got {sorted(additional_decode_keys)})"
            )
        if kwargs:
            raise TypeError(
                f"AutoencodingPostEngine got unsupported kwargs: {sorted(kwargs)}"
            )
        self.input_key = input_key
        self.eval_only = eval_only
        self.num_flow_steps = num_flow_steps
        self.mmse_noise_std = mmse_noise_std
        self.eps = 0.0
        self.clamp_range = tuple(clamp_range) if clamp_range is not None else None
        # reference postprocessor.py:54-57: eval_only skips the optimizer
        # config entirely; make_train_step raises on an eval-only engine
        self.optimizer_config = (
            None if eval_only
            else default(optimizer_config, {"target": "optax.adam"}))
        self.learning_rate: Optional[float] = None

        # frozen AE via the standard engine (shares encode/decode/quant API)
        self.ae = AutoencodingEngine(
            input_key=input_key,
            encoder_config=encoder_config,
            decoder_config=decoder_config,
            regularizer_config=regularizer_config,
            loss_config=None,
            clamp_range=clamp_range,
            seed=seed,
        )
        self.poster = instantiate_from_config(post_config)
        self.poster_params = None
        self._rng = jax.random.PRNGKey(seed)
        self._pending_ckpt = default(ckpt_path, ckpt_engine)
        self._jit = {}

    # ------------------------------------------------------------- params

    def init_params(self, rng=None, example=None):
        rng = default(rng, self._rng)
        self.ae.init_params(jax.random.fold_in(rng, 0), example=example)
        x = example if example is not None else self.ae._example_input()
        t = jnp.zeros((x.shape[0],), jnp.float32)
        self.poster_params = self.poster.init(
            {"params": jax.random.fold_in(rng, 1)}, x, t
        )["params"]
        if self._pending_ckpt:
            self.load_checkpoint(self._pending_ckpt)
            self._pending_ckpt = None

    def load_checkpoint(self, path: str, ignore_keys=()):
        """strict=False load of a reference ckpt: AE subtrees route through
        the engine's converter; `poster.` keys map onto the poster params."""
        missing, unexpected = self.ae.load_checkpoint(path, ignore_keys=ignore_keys)
        return missing, unexpected

    # ------------------------------------------------------------- API

    def get_input(self, batch):
        return batch[self.input_key]

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        return self.ae.encode(x, return_reg_log=return_reg_log, unregularized=unregularized)

    def decode(self, z):
        return self.ae.decode(z)

    def quant(self, x):
        return self.ae.quant(x)

    def dequant(self, indices):
        return self.ae.dequant(indices)

    def __call__(self, x_t, t):
        return self.poster.apply({"params": self.poster_params}, x_t, t)

    def create_xhat_0(self, xhat, rng):
        return xhat + jax.random.normal(rng, xhat.shape) * self.mmse_noise_std

    def post(self, xhat, rng=None):
        """Euler flow integration from the noised reconstruction
        (`postprocessor.py:121-136`), as one jitted lax.scan."""
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)

        if "post" not in self._jit:

            def run(poster_params, xhat, rng):
                x0 = xhat + jax.random.normal(rng, xhat.shape) * self.mmse_noise_std
                dt = (1.0 / self.num_flow_steps) * (1.0 - self.eps)

                def step(x_t, i):
                    num_t = (i / self.num_flow_steps) * (1.0 - self.eps) + self.eps
                    t = jnp.full((x_t.shape[0],), num_t, jnp.float32)
                    v = self.poster.apply({"params": poster_params}, x_t, t)
                    return x_t + v * dt, None

                x_fin, _ = jax.lax.scan(
                    step, x0, jnp.arange(self.num_flow_steps, dtype=jnp.float32)
                )
                if self.clamp_range is not None:
                    x_fin = jnp.clip(x_fin, self.clamp_range[0], self.clamp_range[1])
                return x_fin

            self._jit["post"] = jax.jit(run)
        return self._jit["post"](self.poster_params, xhat, rng)

    # ------------------------------------------------------------- training

    def make_train_step(self, learning_rate: float):
        """Jitted rectified-flow step over (poster_params, opt_state)
        (`postprocessor.py:144-162`); the AE stays frozen."""
        if self.eval_only:
            raise RuntimeError(
                "AutoencodingPostEngine was built with eval_only=True; "
                "it has no optimizer to train with")
        opt = optax.adam(learning_rate)
        ae_module, ae_params = self.ae.module, self.ae.params

        def loss_fn(poster_params, x, rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            z = ae_module.apply(
                {"params": ae_params}, x, train=False, method="encode",
                rngs={"sample": r1},
            )
            xhat = ae_module.apply({"params": ae_params}, z, method="decode")
            xhat = jax.lax.stop_gradient(xhat)
            t = jax.random.uniform(r2, (x.shape[0], 1, 1, 1)) * (1.0 - self.eps) + self.eps
            xhat_0 = xhat + jax.random.normal(r3, xhat.shape) * self.mmse_noise_std
            x_t = t * x + (1.0 - t) * xhat_0
            v = self.poster.apply({"params": poster_params}, x_t, t[:, 0, 0, 0])
            return jnp.mean((v - (x - xhat_0)) ** 2)

        @jax.jit
        def train_step(poster_params, opt_state, x, rng):
            loss, grads = jax.value_and_grad(loss_fn)(poster_params, x, rng)
            updates, opt_state = opt.update(grads, opt_state, poster_params)
            poster_params = optax.apply_updates(poster_params, updates)
            return poster_params, opt_state, loss

        opt_state = opt.init(self.poster_params)
        return train_step, opt_state

    def log_images(self, batch, **kwargs):
        x = self.get_input(batch)
        z = self.encode(x)
        xhat = self.decode(z)
        return {"inputs": x, "xhat": xhat, "xhat_post": self.post(xhat)}
