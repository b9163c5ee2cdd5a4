"""LPIPS + PatchGAN adversarial loss head
(`/root/reference/pit/modules/losses/discriminator_loss.py:17-369`).

One module serves both optimisation phases (the reference's optimizer_idx
protocol): phase 0 is L1 + LPIPS -> learned-logvar NLL (sum/batch, not mean,
`:357-369`) + adaptive-weighted generator loss + weighted regularizer terms;
phase 1 is the hinge/vanilla discriminator loss on detached images.

JAX-specific split: the adaptive discriminator weight needs two VJPs w.r.t.
the decoder's final projection (`:211-220`); that runs in
parallel/train_step.py (`adaptive_d_weight`) because it closes over engine
params.  This module takes the resulting ``d_weight`` as an input; in eval it
defaults to 1.0 after disc_start exactly like the reference (`:283-284`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.losses.discriminator import hinge_d_loss, vanilla_d_loss
from vqvae_from_gaussian_vae_tpu.losses.lpips import LPIPS
from vqvae_from_gaussian_vae_tpu.utils.config import default, instantiate_from_config


class GeneralLPIPSWithDiscriminator(nn.Module):
    disc_start: int
    logvar_init: float = 0.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    # path to the reference's combined LPIPS checkpoint (vgg.pth,
    # lpips/util.py:9); converted and installed by the Trainer at init so
    # training uses the pretrained perceptual net (the reference
    # auto-downloads it, lpips/loss/lpips.py:24-33 — no egress here)
    lpips_weights: Optional[str] = None
    disc_loss: str = "hinge"
    scale_input_to_tgt_size: bool = False
    dims: int = 2
    learn_logvar: bool = False
    regularization_weights: Optional[Dict[str, float]] = None
    additional_log_keys: Optional[List[str]] = None
    discriminator_config: Optional[Dict] = None
    vf_weight: float = 0.1
    adaptive_vf: bool = True
    cos_margin: float = 0.5
    distmat_margin: float = 0.25
    distmat_weight: float = 1.0
    cos_weight: float = 1.0
    # compute dtype for the LPIPS VGG trunk and the PatchGAN conv stacks
    # (params/optimizer state stay fp32).  The reference trains pure fp32;
    # the bf16_compute overlay sets this so the loss path's convs — which
    # run up to 5x (LPIPS) / 4x (disc) per ae step, utils/flops.py — hit
    # full MXU rate alongside the bf16 engine.
    dtype: Any = jnp.float32

    def setup(self):
        assert self.disc_loss in ("hinge", "vanilla")
        self.perceptual_loss = LPIPS(dtype=self.dtype)
        self.logvar = self.param(
            "logvar", nn.initializers.constant(self.logvar_init), ()
        )
        disc_cfg = default(
            self.discriminator_config,
            {
                "target": "vqvae_from_gaussian_vae_tpu.losses.discriminator.NLayerDiscriminator",
                "params": {
                    "input_nc": self.disc_in_channels,
                    "n_layers": self.disc_num_layers,
                    "use_actnorm": False,
                },
            },
        )
        if (disc_cfg["target"].endswith("NLayerDiscriminator")
                and "dtype" not in disc_cfg.get("params", {})):
            disc_cfg = {**disc_cfg,
                        "params": {**disc_cfg.get("params", {}), "dtype": self.dtype}}
        self.discriminator = instantiate_from_config(disc_cfg)
        self._disc_loss_fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        self._reg_weights = dict(self.regularization_weights or {})
        self._log_keys = set(self.additional_log_keys or []) | set(self._reg_weights)

    # the reference's forward_keys contract (discriminator_loss.py:88-95)
    forward_keys = (
        "optimizer_idx",
        "global_step",
        "last_layer",
        "enc_last_layer",
        "split",
        "regularization_log",
    )

    # ------------------------------------------------------------ pieces

    def rec_loss(self, inputs, reconstructions):
        """L1 + perceptual (discriminator_loss.py:253-269).

        dims > 2 is the reference's video branch (`:255-264`): frames are
        folded into the batch for LPIPS — here (B, T, H, W, C) -> (B*T, H,
        W, C) — and the per-frame distances broadcast back over T.
        """
        rec = jnp.abs(inputs - reconstructions)
        if self.perceptual_weight > 0:
            if self.dims > 2:
                b, t = inputs.shape[0], inputs.shape[1]
                flat = lambda v: v.reshape((b * t,) + v.shape[2:])
                p = self.perceptual_loss(flat(inputs), flat(reconstructions))
                p = p.reshape((b, t) + p.shape[1:])
            else:
                p = self.perceptual_loss(inputs, reconstructions)
            rec = rec + self.perceptual_weight * p
        return rec

    def nll_loss(self, rec_loss, weights=None):
        """Learned-logvar NLL; sum over elements / batch (`:357-369`)."""
        nll = rec_loss / jnp.exp(self.logvar) + self.logvar
        weighted = nll if weights is None else weights * nll
        batch = nll.shape[0]
        return jnp.sum(nll) / batch, jnp.sum(weighted) / batch

    def nll_from_images(self, inputs, reconstructions, weights=None):
        return self.nll_loss(self.rec_loss(inputs, reconstructions), weights)

    def g_loss(self, reconstructions, train: bool = False):
        """Generator loss -E[D(xrec)] (`:277-278`)."""
        return -jnp.mean(self.discriminator(reconstructions, train=train))

    def d_loss(self, inputs, reconstructions, train: bool = False):
        # ONE forward over [x; xrec] instead of two (reference runs them
        # separately, `discriminator_loss.py:339-346`): per-sample math is
        # identical (ActNorm/conv have no cross-batch coupling), the convs
        # run at 2x batch, and — on a data mesh — GSPMD emits ONE wgrad
        # all-reduce instead of two (measured: the split form all-reduced
        # every disc param twice, 767 MB/step vs 384 MB at sd3unet scale)
        # interleave (stack axis=1 + merge) instead of concatenate: each
        # device's shard stays [x_i, xrec_i, ...] so GSPMD needs no
        # resharding all-to-all (a plain axis-0 concat of two batch-sharded
        # arrays does)
        both = jnp.stack([jax.lax.stop_gradient(inputs),
                          jax.lax.stop_gradient(reconstructions)], axis=1)
        both = both.reshape((-1,) + inputs.shape[1:])
        logits = self.discriminator(both, train=train)
        pair = logits.reshape((inputs.shape[0], 2) + logits.shape[1:])
        logits_real, logits_fake = pair[:, 0], pair[:, 1]
        return self._disc_loss_fn(logits_real, logits_fake), logits_real, logits_fake

    def vf_loss(self, regularization_log):
        """VA-VAE alignment losses (`:290-302`): distance-matrix + cosine
        margins between latent projections and foundation features (NHWC)."""
        zp = regularization_log["zp"]
        aux = regularization_log["aux_feature"]
        zf = zp.reshape(zp.shape[0], -1, zp.shape[-1])
        af = aux.reshape(aux.shape[0], -1, aux.shape[-1])
        zn = zf / jnp.clip(jnp.linalg.norm(zf, axis=-1, keepdims=True), 1e-12)
        an = af / jnp.clip(jnp.linalg.norm(af, axis=-1, keepdims=True), 1e-12)
        z_sim = jnp.einsum("bic,bjc->bij", zn, zn)
        a_sim = jnp.einsum("bic,bjc->bij", an, an)
        diff = jnp.abs(z_sim - a_sim)
        vf1 = jnp.mean(nn.relu(diff - self.distmat_margin))
        cos = jnp.sum(zn * an, axis=-1)
        vf2 = jnp.mean(nn.relu(1.0 - self.cos_margin - cos))
        return vf1 * self.distmat_weight + vf2 * self.cos_weight

    def disc_logits(self, inputs, reconstructions):
        """Raw patch-logit maps for visualisation (`:108-119`)."""
        lr = self.discriminator(jax.lax.stop_gradient(inputs))
        lf = self.discriminator(jax.lax.stop_gradient(reconstructions))
        return lr, lf

    def init_all(self, inputs, reconstructions):
        """Init-only path touching every parameter.  The discriminator runs
        first on the real inputs so ActNorm's data-dependent init sees the
        same statistics as the reference's first lazy train forward."""
        d, _, _ = self.d_loss(inputs, reconstructions, train=True)
        nll, _ = self.nll_from_images(inputs, reconstructions)
        return d + nll + self.g_loss(reconstructions)

    # ------------------------------------------------------------ forward

    def __call__(
        self,
        inputs,
        reconstructions,
        *,
        regularization_log: Dict[str, jnp.ndarray],
        optimizer_idx: int,
        global_step: Union[int, jnp.ndarray],
        split: str = "train",
        weights=None,
        d_weight=None,
        vf_weight=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        if optimizer_idx == 0:
            rec = self.rec_loss(inputs, reconstructions)
            nll, weighted_nll = self.nll_loss(rec, weights)

            disc_on = jnp.asarray(global_step >= self.disc_start) | jnp.asarray(not train)
            g = jnp.where(disc_on, self.g_loss(reconstructions, train=train), 0.0)
            if d_weight is None:
                # eval: 1.0 once the disc is active; pre-start: 0 (`:280-287`)
                d_weight = jnp.where(disc_on, 1.0 if not train else 0.0, 0.0)
            d_weight = jnp.where(disc_on, d_weight, 0.0)

            log: Dict[str, jnp.ndarray] = {}
            loss = weighted_nll + d_weight * self.disc_factor * g

            if "zp" in regularization_log and "aux_feature" in regularization_log:
                vf = self.vf_loss(regularization_log)
                if vf_weight is None:
                    vf_weight = self.vf_weight if not self.adaptive_vf else 0.0
                loss = loss + vf_weight * vf
                log[f"{split}/loss/vf"] = jax.lax.stop_gradient(vf)

            for k, v in regularization_log.items():
                if k in self._reg_weights:
                    loss = loss + self._reg_weights[k] * v
                if k in self._log_keys and jnp.ndim(v) == 0:
                    log[f"{split}/{k}"] = jax.lax.stop_gradient(v)
            log.update(
                {
                    f"{split}/loss/total": jax.lax.stop_gradient(loss),
                    f"{split}/loss/nll": jax.lax.stop_gradient(nll),
                    f"{split}/loss/rec": jax.lax.stop_gradient(jnp.mean(rec)),
                    f"{split}/loss/g": jax.lax.stop_gradient(jnp.mean(g)),
                    f"{split}/scalars/logvar": jax.lax.stop_gradient(self.logvar),
                    f"{split}/scalars/d_weight": jax.lax.stop_gradient(jnp.mean(d_weight)),
                }
            )
            return loss, log

        if optimizer_idx == 1:
            d, logits_real, logits_fake = self.d_loss(inputs, reconstructions, train=train)
            disc_on = jnp.asarray(global_step >= self.disc_start) | jnp.asarray(not train)
            d = jnp.where(disc_on, self.disc_factor * d, 0.0)
            log = {
                f"{split}/loss/disc": jax.lax.stop_gradient(d),
                f"{split}/logits/real": jax.lax.stop_gradient(jnp.mean(logits_real)),
                f"{split}/logits/fake": jax.lax.stop_gradient(jnp.mean(logits_fake)),
            }
            return d, log

        raise NotImplementedError(f"Unknown optimizer_idx {optimizer_idx}")


def visualize_disc_logits(loss_module, loss_params, inputs, reconstructions):
    """Colormapped real/fake patch-logit grids blended over the images
    (the reference's `log_images`, discriminator_loss.py:108-209) - host
    side, returns {"vis_logits", "vis_logits_blended"} in [-1, 1] NHWC."""
    import numpy as np
    from matplotlib import colormaps

    lr, lf = loss_module.apply(
        {"params": loss_params}, inputs, reconstructions, method="disc_logits"
    )
    lr, lf = np.asarray(lr, np.float32), np.asarray(lf, np.float32)
    if lr.ndim < 4 or lr.size == 0 or lf.size == 0:
        # n_layers=6 PatchGAN on small inputs (<=128px) can collapse the
        # logit map to zero spatial size - nothing to visualize.
        return {}
    high = max(np.abs(lr).max(), np.abs(lf).max(), 1e-6)
    cmap = colormaps["PiYG"]

    def upsample(logits, target_hw):
        reps_h = -(-target_hw[0] // logits.shape[1])
        reps_w = -(-target_hw[1] // logits.shape[2])
        up = np.repeat(np.repeat(logits, reps_h, 1), reps_w, 2)
        return up[:, : target_hw[0], : target_hw[1]]

    hw = inputs.shape[1:3]
    lr_up = upsample(lr, hw)[..., 0]
    lf_up = upsample(lf, hw)[..., 0]

    def colorize(logits):
        return cmap((logits + high) / (2 * high))[..., :3]  # (B, H, W, 3)

    vis = np.concatenate([colorize(lr_up), colorize(lf_up)], axis=1)
    imgs = np.concatenate(
        [np.asarray(inputs, np.float32), np.asarray(reconstructions, np.float32)], axis=1
    )
    imgs01 = np.clip((imgs + 1) / 2, 0, 1)
    alpha = np.concatenate(
        [np.abs(lr_up), np.abs(lf_up)], axis=1
    )[..., None] / high * 0.8
    blended = alpha * vis + (1 - alpha) * imgs01
    return {
        "vis_logits": 2.0 * vis - 1.0,
        "vis_logits_blended": 2.0 * blended - 1.0,
    }
