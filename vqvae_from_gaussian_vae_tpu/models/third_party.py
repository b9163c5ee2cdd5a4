"""Frozen third-party VAE wrappers - eval-only baselines exposing the same
encode/decode protocol as the tokenizer engine
(`/root/reference/pit/models/autoencoder.py:25-217`).

The reference pulls diffusers models from the HuggingFace hub at __init__
time (and two of its wrappers hardcode empty checkpoint paths - non-runnable
as-is, SURVEY.md 2.3).  This environment has no egress, so every wrapper
here is built on this framework's own modules and takes an explicit
``ckpt_path`` (converted torch weights); without one it initialises random
weights and warns - the protocol and plumbing stay exercised either way.

All wrappers: encode(x, return_reg_log=False, unregularized=False) ->
(z, {}) with posterior sampling, decode(z) -> image; NHWC in [-1, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models.hyvae import (
    DiagonalGaussianDistribution,
    HunyuanVAE2D,
)


class _FrozenVAEBase:
    def __init__(self, seed: int = 0):
        self._rng = jax.random.PRNGKey(seed)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def load_checkpoint(self, path: str):
        """Late weight load (eval.py --ckpt); delegates to the wrapped
        model's converter."""
        return self.model.load_checkpoint(path)

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        posterior = self.model.encode(x)
        z = posterior.sample(self._next_rng())
        return z, {}

    def decode(self, z):
        return self.model.decode(z)


class AutoencoderKLDiffusers(_FrozenVAEBase):
    """diffusers-AutoencoderKL-layout VAE on this framework's sd3unet
    backbone: Encoder/Decoder + (optional) quant convs, posterior sampling.

    Covers the reference's FLUX / SD3 / EQ wrappers (`autoencoder.py:62-78,
    125-160`), which are all `diffusers.AutoencoderKL` instances differing
    only in weights and latent width.
    """

    def __init__(
        self,
        latent_channels: int = 16,
        ch: int = 128,
        ch_mult: Sequence[int] = (1, 2, 4, 4),
        resolution: int = 256,
        scaling_factor: Optional[float] = None,
        shift_factor: Optional[float] = None,
        ckpt_path: Optional[str] = None,
        seed: int = 0,
    ):
        super().__init__(seed)
        from vqvae_from_gaussian_vae_tpu.models.unet import Decoder, Encoder

        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        common = dict(
            attn_type="vanilla", z_channels=latent_channels, resolution=resolution,
            in_channels=3, out_ch=3, ch=ch, ch_mult=list(ch_mult),
            num_res_blocks=2, attn_resolutions=[], dropout=0.0,
        )
        self.encoder = Encoder(double_z=True, **common)
        self.decoder = Decoder(double_z=True, **common)
        rng = jax.random.PRNGKey(seed)
        x = jnp.zeros((1, 64, 64, 3))
        f = 2 ** (len(ch_mult) - 1)
        z = jnp.zeros((1, 64 // f, 64 // f, latent_channels))
        self.params = {
            "encoder": self.encoder.init(jax.random.fold_in(rng, 0), x)["params"],
            "decoder": self.decoder.init(jax.random.fold_in(rng, 1), z)["params"],
        }
        if ckpt_path:
            self.load_checkpoint(ckpt_path)
        else:
            print(f"WARNING: {type(self).__name__} running with random weights "
                  f"(pass ckpt_path with converted diffusers weights)")
        self._enc = jax.jit(lambda p, x: self.encoder.apply({"params": p["encoder"]}, x))
        self._dec = jax.jit(lambda p, z: self.decoder.apply({"params": p["decoder"]}, z))

    def load_checkpoint(self, path: str):
        from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        params, missing, unexpected = convert_state_dict(sd, self.params)
        self.params = params
        return missing, unexpected

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        moments = self._enc(self.params, x)
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(self._next_rng())
        if self.shift_factor is not None:
            z = z - self.shift_factor
        if self.scaling_factor is not None:
            z = z * self.scaling_factor
        return z, {}

    def decode(self, z):
        if self.scaling_factor is not None:
            z = z / self.scaling_factor
        if self.shift_factor is not None:
            z = z + self.shift_factor
        return self._dec(self.params, z)


class AutoencoderKLFLUX(AutoencoderKLDiffusers):
    """(`autoencoder.py:62-78`): FLUX.1-dev VAE (16ch latents, f=8,
    scaling 0.3611, shift 0.1159)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0):
        super().__init__(latent_channels=16, scaling_factor=0.3611,
                         shift_factor=0.1159, ckpt_path=ckpt_path, seed=seed)


class AutoencoderKLSD3(AutoencoderKLDiffusers):
    """(`autoencoder.py:125-141`): SD3.5-medium VAE (16ch, f=8,
    scaling 1.5305, shift 0.0609)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0):
        super().__init__(latent_channels=16, scaling_factor=1.5305,
                         shift_factor=0.0609, ckpt_path=ckpt_path, seed=seed)


class AutoencoderKLEQ(AutoencoderKLDiffusers):
    """(`autoencoder.py:144-160`): EQ-VAE (4ch SD-style latents)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0):
        super().__init__(latent_channels=4, ckpt_path=ckpt_path, seed=seed)


class AutoencoderKLHYImage2(_FrozenVAEBase):
    """(`autoencoder.py:81-123`): HunyuanImage-2 VAE (f=32, 64ch latents)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0):
        super().__init__(seed)
        self.model = HunyuanVAE2D(
            block_out_channels=[128, 256, 512, 512, 1024, 1024],
            in_channels=3,
            out_channels=3,
            latent_channels=64,
            layers_per_block=2,
            ffactor_spatial=32,
            sample_size=384,
            sample_tsize=96,
            scaling_factor=0.75289,
        )
        self.model.init_params(sample_size=64)
        if ckpt_path:
            self.model.load_checkpoint(ckpt_path)
        else:
            print("WARNING: AutoencoderKLHYImage2 running with random weights")

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        z = self.model.encode(x).sample(self._next_rng())
        return z, {}


class AutoencoderKLQwenImage(_FrozenVAEBase):
    """(`autoencoder.py:25-41`): the Qwen-Image VAE is a causal-3D WAN-style
    autoencoder applied to single frames (``x[:, :, None]``); built on the
    flax WAN backbone (models/wan.py).  Defaults match the published
    Wan2.1 / Qwen-Image VAE config (base 96, z=16, f=8 spatial, 4x temporal)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0, **wan_kwargs):
        super().__init__(seed)
        from vqvae_from_gaussian_vae_tpu.models.wan import AutoencoderKLWan

        self.model = AutoencoderKLWan(seed=seed, **wan_kwargs)
        if ckpt_path:
            self.model.load_checkpoint(ckpt_path)
        else:
            print(f"WARNING: {type(self).__name__} running with random weights "
                  f"(pass ckpt_path with converted diffusers weights)")

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        # single image -> one-frame video, sample, drop the time axis
        posterior = self.model.encode(x[:, None])
        z = posterior.sample(self._next_rng())
        return z[:, 0], {}

    def decode(self, z):
        return self.model.decode(z[:, None])[:, 0]


class AutoencoderKLWAN(AutoencoderKLQwenImage):
    """(`autoencoder.py:43-59`): the Wan2.2-I2V VAE — identical architecture
    and protocol, different pretrained weights."""


class AutoencoderKLHYImage3(_FrozenVAEBase):
    """(`autoencoder.py:162-217`): HunyuanImage-3 conv3D VAE on single
    frames; 2D spatial path via HunyuanVAE2D (f=16, 32ch latents)."""

    def __init__(self, ckpt_path: Optional[str] = None, seed: int = 0):
        super().__init__(seed)
        self.model = HunyuanVAE2D(
            block_out_channels=[128, 256, 512, 1024, 1024],
            in_channels=3,
            out_channels=3,
            latent_channels=32,
            layers_per_block=2,
            ffactor_spatial=16,
            sample_size=384,
            sample_tsize=96,
            scaling_factor=0.562679178327931,
        )
        self.model.init_params(sample_size=64)
        if ckpt_path:
            self.model.load_checkpoint(ckpt_path)
        else:
            print("WARNING: AutoencoderKLHYImage3 running with random weights")

    def encode(self, x, return_reg_log: bool = False, unregularized: bool = False):
        z = self.model.encode(x).sample(self._next_rng())
        return z, {}
