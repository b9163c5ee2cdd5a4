"""FLUX refinement pipeline + token-decoder engines
(`/root/reference/pit/modules/flux/xflux_pipeline.py`,
`pit/models/autoencoder.py:710-858`).

`FluxPipeline` is the XFluxPipelineClean analog: flux-dev DiT (+LoRA) with a
latent-conditioned ControlNet and the FLUX VAE.  Text conditioning runs
through real T5/CLIP encoders (models/conditioner.py HFEmbedder over
transformers-flax) when local checkpoint paths are supplied (t5_path /
clip_path - no egress in this image, nothing downloads implicitly);
otherwise embeddings are passed in as arrays (zeros by default).  The Redux
image embedder stays an array input (hub-only SigLIP assets).

`AutoencodingFluxEngine.dequant` re-generates images from tokens: decode ->
feed the dequantized latents to the ControlNet -> 25-step guided denoise ->
FLUX-VAE decode (the reference's generative "token decoder",
`autoencoder.py:758-784`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models import flux as F
from vqvae_from_gaussian_vae_tpu.models.autoencoder import AutoencodingEngine
from vqvae_from_gaussian_vae_tpu.models.third_party import AutoencoderKLFLUX


class FluxPipeline:
    def __init__(
        self,
        model_type: str = "flux-dev",
        control_channels: int = 16,
        lora_rank: int = 0,
        controlnet_depth: int = 2,
        ip_context_dim: int = 0,
        ip_weights: Optional[str] = None,
        clip_embeddings_dim: int = 768,
        clip_extra_context_tokens: int = 4,
        flux_params: Optional[F.FluxParams] = None,
        flux_weights: Optional[str] = None,
        controlnet_weights: Optional[str] = None,
        ae_weights: Optional[str] = None,
        t5_path: Optional[str] = None,
        clip_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.params_cfg = flux_params or F.flux_dev_params()
        self.model = F.Flux(self.params_cfg, lora_rank=lora_rank,
                            ip_context_dim=ip_context_dim)
        # IP-adapter image-prompt projection (`xflux_pipeline.py` ip path):
        # CLIP image embedding -> N extra context tokens fed to every block
        self.image_proj_model = (
            F.ImageProjModel(cross_attention_dim=ip_context_dim,
                             clip_embeddings_dim=clip_embeddings_dim,
                             clip_extra_context_tokens=clip_extra_context_tokens)
            if ip_context_dim else None
        )
        self.image_proj_params = None
        self._ip_weights = ip_weights
        self.controlnet = F.ControlNetFlux(self.params_cfg, control_channels,
                                           controlnet_depth)
        self.ae = AutoencoderKLFLUX(ckpt_path=ae_weights, seed=seed)
        self.model_params = None
        self.controlnet_params = None
        self._weights = (flux_weights, controlnet_weights)
        self._rng = jax.random.PRNGKey(seed)
        # optional text conditioners (local transformers-flax checkpoints);
        # without them, conditioning stays embeddings-as-inputs
        from vqvae_from_gaussian_vae_tpu.models.conditioner import HFEmbedder

        self.t5 = HFEmbedder(t5_path, max_length=512) if t5_path else None
        self.clip = HFEmbedder(clip_path, max_length=77) if clip_path else None

    def init_params(self, height: int = 256, width: int = 256, txt_len: int = 512):
        rng = self._rng
        b = 1
        hl, wl = 2 * math.ceil(height / 16), 2 * math.ceil(width / 16)
        img = jnp.zeros((b, (hl // 2) * (wl // 2), 64), jnp.bfloat16)
        img_ids = F.make_img_ids(hl, wl, b)
        txt = jnp.zeros((b, txt_len, self.params_cfg.context_in_dim), jnp.bfloat16)
        txt_ids = jnp.zeros((b, txt_len, 3))
        t = jnp.zeros((b,))
        y = jnp.zeros((b, self.params_cfg.vec_in_dim), jnp.bfloat16)
        g = jnp.ones((b,))
        self.model_params = self.model.init(
            jax.random.fold_in(rng, 0), img, img_ids, txt, txt_ids, t, y, None, g
        )["params"]
        cond = jnp.zeros((b, hl, wl, self.controlnet.control_channels), jnp.bfloat16)
        self.controlnet_params = self.controlnet.init(
            jax.random.fold_in(rng, 1), img, img_ids, cond, txt, txt_ids, t, y, g
        )["params"]
        if self.image_proj_model is not None:
            dummy = jnp.zeros((1, self.image_proj_model.clip_embeddings_dim), jnp.bfloat16)
            self.image_proj_params = self.image_proj_model.init(
                jax.random.fold_in(rng, 2), dummy)["params"]
            if self._ip_weights:
                from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
                    convert_state_dict, load_torch_checkpoint,
                )

                sd = load_torch_checkpoint(self._ip_weights)
                proj_sd = {k[len("image_proj."):]: v for k, v in sd.items()
                           if k.startswith("image_proj.")} or sd
                self.image_proj_params, _, _ = convert_state_dict(
                    proj_sd, self.image_proj_params)
        fw, cw = self._weights
        for path, attr in ((fw, "model_params"), (cw, "controlnet_params")):
            if path:
                from vqvae_from_gaussian_vae_tpu.utils.torch_convert import (
                    convert_state_dict,
                    load_torch_checkpoint,
                )

                sd = load_torch_checkpoint(path)
                converted, missing, _ = convert_state_dict(sd, getattr(self, attr))
                setattr(self, attr, converted)
                if missing:
                    print(f"{attr}: missing {len(missing)} keys")
        if not fw:
            print("WARNING: FluxPipeline running with random flux-dev weights")

    def __call__(
        self,
        controlnet_image: jnp.ndarray,  # (B, h_lat, w_lat, C) dequantized latents
        width: int,
        height: int,
        prompt: Optional[str] = None,
        neg_prompt: str = "",
        inp_txt: Optional[jnp.ndarray] = None,
        inp_vec: Optional[jnp.ndarray] = None,
        neg_inp_txt: Optional[jnp.ndarray] = None,
        neg_inp_vec: Optional[jnp.ndarray] = None,
        guidance: float = 4.0,
        num_steps: int = 25,
        seed: int = 42,
        true_gs: float = 1.0,
        control_weight: float = 1.0,
        timestep_to_start_cfg: int = 5,
        txt_len: int = 512,
        image_prompt_embeds: Optional[jnp.ndarray] = None,  # (B, clip_dim)
        neg_image_prompt_embeds: Optional[jnp.ndarray] = None,
        ip_scale: float = 1.0,
        neg_ip_scale: float = 1.0,
    ) -> jnp.ndarray:
        assert self.model_params is not None, "call init_params() first"
        b = controlnet_image.shape[0]
        p = self.params_cfg
        if prompt is not None and (self.t5 is None or self.clip is None):
            raise ValueError(
                "prompt= needs both t5_path and clip_path conditioners "
                "configured; pass embeddings via inp_txt/inp_vec instead"
            )
        if prompt is not None:
            # the reference's HFEmbedder path (`xflux_pipeline.py` prompt
            # encoding): T5 sequence embeddings + pooled CLIP vector
            inp_txt = jnp.tile(self.t5([prompt]), (b, 1, 1)) if inp_txt is None else inp_txt
            inp_vec = jnp.tile(self.clip([prompt]), (b, 1)) if inp_vec is None else inp_vec
            if neg_inp_txt is None:
                neg_inp_txt = jnp.tile(self.t5([neg_prompt]), (b, 1, 1))
            if neg_inp_vec is None:
                neg_inp_vec = jnp.tile(self.clip([neg_prompt]), (b, 1))
        # conditioning defaults: zero embeddings (no Redux/T5/CLIP assets)
        txt = inp_txt if inp_txt is not None else jnp.zeros((b, txt_len, p.context_in_dim))
        vec = inp_vec if inp_vec is not None else jnp.zeros((b, p.vec_in_dim))
        neg_txt = neg_inp_txt if neg_inp_txt is not None else jnp.zeros_like(txt)
        neg_vec = neg_inp_vec if neg_inp_vec is not None else jnp.zeros_like(vec)
        txt_ids = jnp.zeros((b, txt.shape[1], 3))

        noise = F.get_noise(jax.random.PRNGKey(seed), b, height, width)
        hl, wl = noise.shape[1], noise.shape[2]
        img = F.pack_latents(noise).astype(jnp.bfloat16)
        img_ids = F.make_img_ids(hl, wl, b)
        timesteps = F.get_schedule(num_steps, img.shape[1])

        image_proj = neg_image_proj = None
        if image_prompt_embeds is not None:
            assert self.image_proj_model is not None, \
                "image prompts need ip_context_dim > 0 at pipeline construction"
            proj = lambda e: self.image_proj_model.apply(
                {"params": self.image_proj_params}, e.astype(jnp.bfloat16))
            image_proj = proj(image_prompt_embeds)
            neg_image_proj = proj(
                neg_image_prompt_embeds
                if neg_image_prompt_embeds is not None
                else jnp.zeros_like(image_prompt_embeds))
        model_apply = lambda **kw: self.model.apply({"params": self.model_params}, **kw)
        ctrl_apply = lambda **kw: self.controlnet.apply(
            {"params": self.controlnet_params}, **kw
        )
        x = F.denoise_controlnet(
            model_apply, ctrl_apply,
            img, img_ids,
            txt.astype(jnp.bfloat16), txt_ids, vec.astype(jnp.bfloat16),
            neg_txt.astype(jnp.bfloat16), txt_ids, neg_vec.astype(jnp.bfloat16),
            controlnet_cond=controlnet_image.astype(jnp.bfloat16),
            timesteps=timesteps,
            guidance=guidance,
            true_gs=true_gs,
            controlnet_gs=control_weight,
            timestep_to_start_cfg=timestep_to_start_cfg,
            image_proj=image_proj,
            neg_image_proj=neg_image_proj,
            ip_scale=ip_scale,
            neg_ip_scale=neg_ip_scale,
        )
        latents = F.unpack_latents(x.astype(jnp.float32), height, width)
        return self.ae.decode(latents)


class AutoencodingFluxEngine(AutoencodingEngine):
    """(`autoencoder.py:710-784`): tokenizer whose dequant re-generates the
    image through FLUX + ControlNet conditioned on the decoded latents."""

    def __init__(self, *, controlnet_path: Optional[str] = None,
                 lora_path: Optional[str] = None, flux_path: Optional[str] = None,
                 num_steps: int = 25, guidance: float = 4.0, **kwargs):
        super().__init__(**kwargs)
        self.controlnet_path = controlnet_path
        self.lora_path = lora_path
        self.flux_path = flux_path
        self.num_steps = num_steps
        self.guidance = guidance
        self.control_channels = self.encoder_config["params"]["z_channels"]
        self.xflux_pipeline: Optional[FluxPipeline] = None

    def load_flux_pipeline(self):
        self.xflux_pipeline = FluxPipeline(
            control_channels=self.control_channels,
            lora_rank=128 if self.lora_path else 0,
            flux_weights=self.flux_path or self.lora_path,
            controlnet_weights=self.controlnet_path,
        )
        self.xflux_pipeline.init_params()

    def dequant(self, indices):
        if self.xflux_pipeline is None:
            self.load_flux_pipeline()
        zhat = self.module.apply(
            {"params": self.params}, indices,
            method=lambda m, i: m.regularization.dequant(i),
        )
        rec = self.decode(zhat)
        b, h, w, _ = rec.shape
        # latent control features upsampled to the FLUX latent grid
        # (`autoencoder.py:763`): target spatial = image/8
        scale = (w // zhat.shape[2]) // 8
        control = jnp.repeat(jnp.repeat(zhat, scale, axis=1), scale, axis=2) if scale > 1 else zhat
        result = self.xflux_pipeline(
            controlnet_image=control,
            width=w,
            height=h,
            guidance=self.guidance,
            num_steps=self.num_steps,
            seed=42,
            true_gs=1.0,
            control_weight=1.0,
            timestep_to_start_cfg=5,
        )
        if self.module.clamp_range is not None:
            result = jnp.clip(result, *self.module.clamp_range)
        return result


class AutoencodingFluxLoraEngine(AutoencodingFluxEngine):
    """(`autoencoder.py:787-858`): LoRA-only variant (no ControlNet path
    required; the LoRA ranks live inside the flux params)."""

    def __init__(self, *, lora_path: Optional[str] = None, **kwargs):
        super().__init__(lora_path=lora_path, **kwargs)
