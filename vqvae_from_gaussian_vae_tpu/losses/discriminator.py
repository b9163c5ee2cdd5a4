"""PatchGAN discriminator + ActNorm
(`/root/reference/pit/modules/lpips/model/model.py`, `lpips/util.py:45-128`).

ActNorm's data-dependent initialisation is realised through flax's
data-dependent param init: loc/scale are computed from the batch passed to
``module.init`` (the trainer initialises loss params on the first real
batch).  The torch version initialises lazily on the first training forward -
same statistics, explicit timing here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActNorm(nn.Module):
    """Per-channel affine with batch-statistics init (`util.py:45-105`)."""

    num_features: int

    @nn.compact
    def __call__(self, x):
        def loc_init(rng):
            mean = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
            return (-mean).reshape(1, 1, 1, self.num_features)

        def scale_init(rng):
            # torch .std(): unbiased (ddof=1) over all positions per channel
            n = x.shape[0] * x.shape[1] * x.shape[2]
            var = jnp.var(x.astype(jnp.float32), axis=(0, 1, 2)) * (n / max(n - 1, 1))
            return (1.0 / (jnp.sqrt(var) + 1e-6)).reshape(1, 1, 1, self.num_features)

        loc = self.param("loc", lambda rng: loc_init(rng))
        scale = self.param("scale", lambda rng: scale_init(rng))
        # fp32 affine, emitted at the activation dtype: under the bf16
        # compute overlay the fp32 params must not promote the whole
        # conv->conv chain back to fp32
        return (scale * (x + loc)).astype(x.dtype)


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN (`model.py:20-91`): 4x4 convs, stride-2 pyramid,
    LeakyReLU(0.2), ActNorm (or no norm), 1-channel logit map.

    Conv weights use the reference's weights_init (normal(0, 0.02),
    `model.py:8-17`).  Module names ``main_{i}`` mirror the torch Sequential
    indices for checkpoint conversion.
    """

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train and not self.use_actnorm:
            # BatchNorm's running statistics need a mutable variable
            # collection the two-phase train step does not thread (every
            # shipped config trains with use_actnorm: true, like the
            # reference's YAMLs); fail loudly instead of deep in flax.
            raise NotImplementedError(
                "training the BatchNorm discriminator variant is not wired; "
                "set discriminator_config.params.use_actnorm: true"
            )
        init = nn.initializers.normal(0.02)
        kw, padw = (4, 4), [(1, 1), (1, 1)]
        use_bias = self.use_actnorm  # BatchNorm branch has affine -> no bias

        def conv(i, feats, stride, bias=True):
            return nn.Conv(
                feats, kw, strides=(stride, stride), padding=padw,
                use_bias=bias, kernel_init=init, dtype=self.dtype, name=f"main_{i}",
            )

        layer = 0
        x = conv(layer, self.ndf, 2)(x)
        layer += 2  # conv + leaky-relu
        x = nn.leaky_relu(x, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = conv(layer, self.ndf * nf_mult, 2, bias=use_bias)(x)
            if self.use_actnorm:
                x = ActNorm(self.ndf * nf_mult, name=f"main_{layer + 1}")(x)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"main_{layer + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
            layer += 3  # conv + norm + leaky-relu

        nf_mult = min(2**self.n_layers, 8)
        x = conv(layer, self.ndf * nf_mult, 1, bias=use_bias)(x)
        if self.use_actnorm:
            x = ActNorm(self.ndf * nf_mult, name=f"main_{layer + 1}")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"main_{layer + 1}")(x)
        x = nn.leaky_relu(x, 0.2)
        layer += 3

        return conv(layer, 1, 1)(x)


def hinge_d_loss(logits_real, logits_fake):
    """(`lpips/vqperceptual.py:5-9`)."""
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    """(`lpips/vqperceptual.py:12-17`)."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )
