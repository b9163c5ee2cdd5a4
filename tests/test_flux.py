"""FLUX stack tests on a tiny configuration (architecture + pipeline
mechanics; real weights are hub assets absent from this image)."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models import flux as F

TINY = F.FluxParams(
    in_channels=64,
    vec_in_dim=16,
    context_in_dim=32,
    hidden_size=64,
    mlp_ratio=2.0,
    num_heads=4,
    depth=2,
    depth_single_blocks=2,
    axes_dim=(4, 6, 6),
    theta=10000,
    qkv_bias=True,
    guidance_embed=True,
)


def _inputs(b=1, tokens=16, txt_len=8):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, tokens, 64)), jnp.float32)
    img_ids = F.make_img_ids(8, 8, b)
    txt = jnp.asarray(rng.standard_normal((b, txt_len, 32)), jnp.float32)
    txt_ids = jnp.zeros((b, txt_len, 3))
    t = jnp.full((b,), 0.5)
    y = jnp.asarray(rng.standard_normal((b, 16)), jnp.float32)
    g = jnp.full((b,), 4.0)
    return img, img_ids, txt, txt_ids, t, y, g


def test_flux_forward_shapes():
    model = F.Flux(TINY, remat=False)
    img, img_ids, txt, txt_ids, t, y, g = _inputs()
    params = model.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids, t, y, None, g)["params"]
    out = model.apply({"params": params}, img, img_ids, txt, txt_ids, t, y, None, g)
    assert out.shape == (1, 16, 64)
    # zero-init final layer -> exactly zero velocity at init
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.0, atol=1e-6)
    # LoRA variant adds zero-init deltas: same output, more params
    lora = F.Flux(TINY, lora_rank=4, remat=False)
    lparams = lora.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids, t, y, None, g)["params"]
    n = len(jax.tree.leaves(params))
    nl = len(jax.tree.leaves(lparams))
    assert nl > n


def test_controlnet_residuals_zero_init():
    cn = F.ControlNetFlux(TINY, control_channels=8, controlnet_depth=2)
    img, img_ids, txt, txt_ids, t, y, g = _inputs()
    cond = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 8)), jnp.float32)
    params = cn.init(jax.random.PRNGKey(0), img, img_ids, cond, txt, txt_ids, t, y, g)["params"]
    res = cn.apply({"params": params}, img, img_ids, cond, txt, txt_ids, t, y, g)
    assert len(res) == 2
    assert res[0].shape == (1, 16, TINY.hidden_size)
    # zero-init controlnet output projections
    for r in res:
        np.testing.assert_allclose(np.asarray(r, np.float32), 0.0, atol=1e-6)


def test_pack_unpack_roundtrip_and_schedule():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    packed = F.pack_latents(z)
    assert packed.shape == (2, 16, 64)
    # unpack(height=64,width=64) -> latent grid 8x8
    z2 = F.unpack_latents(packed, 64, 64)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=0)

    ts = F.get_schedule(8, 256)
    assert len(ts) == 9
    assert ts[0] == 1.0 and ts[-1] == 0.0
    assert all(a > b for a, b in zip(ts[:-1], ts[1:]))

    # rope application preserves norms per pair (q/k are token-major
    # (B, L, H, D); pe broadcasts over the head axis)
    q = jnp.asarray(rng.standard_normal((1, 4, 2, 8)), jnp.float32)
    ids = F.make_img_ids(8, 2, 1)  # 4 tokens
    pe = F.embed_nd(ids, (4, 2, 2), 10000)
    assert pe[0].shape == (1, 4, 1, 4)
    q2, _ = F.apply_rope(q, q, pe)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q2), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )


def test_flux_attention_flash_matches_einsum(monkeypatch):
    """The packed flash route of F.attention (bf16, L%128==0) agrees with
    the einsum SDPA path on the same (B, L, H, D) inputs + RoPE."""
    b, l, h, d = 2, 128, 4, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    ids = F.make_img_ids(32, 16, b)  # (32/2)*(16/2) = 128 tokens
    pe = F.embed_nd(ids, (4, 6, 6), 10000)

    monkeypatch.setenv("GVQ_DISABLE_FUSED_KERNELS", "1")
    ref = F.attention(q, k, v, pe)
    monkeypatch.delenv("GVQ_DISABLE_FUSED_KERNELS")
    monkeypatch.setenv("GVQ_FLASH_INTERPRET", "1")
    out = F.attention(q, k, v, pe)
    assert out.shape == ref.shape == (b, l, h * d)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_flux_pipeline_end_to_end_tiny():
    from vqvae_from_gaussian_vae_tpu.models.flux_pipeline import FluxPipeline

    pipe = FluxPipeline(control_channels=4, flux_params=TINY, controlnet_depth=1)
    # shrink the FLUX VAE too
    from vqvae_from_gaussian_vae_tpu.models.third_party import AutoencoderKLDiffusers

    pipe.ae = AutoencoderKLDiffusers(latent_channels=16, ch=32, ch_mult=[1, 2],
                                     resolution=32, scaling_factor=0.3611,
                                     shift_factor=0.1159)
    pipe.init_params(height=32, width=32, txt_len=8)
    control = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 4, 4)), jnp.float32
    )
    out = pipe(control, width=32, height=32, num_steps=2, txt_len=8)
    # FLUX latent grid for 32px is 4x4 (2*ceil(32/16)); tiny AE has f=2
    assert out.ndim == 4 and out.shape[0] == 1 and out.shape[3] == 3
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_hf_conditioners_tiny():
    """HFEmbedder (`conditioner.py:6` analog) on tiny injected flax T5/CLIP
    models; the pipeline's prompt path consumes their outputs."""
    from transformers import (CLIPTextConfig, FlaxCLIPTextModel, FlaxT5EncoderModel,
                              T5Config)

    from vqvae_from_gaussian_vae_tpu.models.conditioner import HFEmbedder

    t5 = FlaxT5EncoderModel(T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64,
                                     num_layers=2, num_heads=4))
    clip = FlaxCLIPTextModel(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77))

    t5_emb = HFEmbedder(model=t5, is_clip=False, max_length=8)
    clip_emb = HFEmbedder(model=clip, is_clip=True, max_length=8)
    ids = np.random.default_rng(0).integers(0, 100, (2, 8))
    seq = t5_emb.embed_ids(ids)
    vec = clip_emb.embed_ids(ids)
    assert seq.shape == (2, 8, 32)          # last_hidden_state
    assert vec.shape == (2, 32)             # pooler_output
    assert np.isfinite(np.asarray(seq)).all() and np.isfinite(np.asarray(vec)).all()
    with pytest.raises(AssertionError):
        t5_emb(["no tokenizer injected"])


def test_flux_prompt_requires_both_conditioners():
    from vqvae_from_gaussian_vae_tpu.models.flux_pipeline import FluxPipeline
    from vqvae_from_gaussian_vae_tpu.models.third_party import AutoencoderKLDiffusers

    pipe = FluxPipeline(control_channels=4, flux_params=TINY, controlnet_depth=1)
    pipe.ae = AutoencoderKLDiffusers(latent_channels=16, ch=32, ch_mult=[1, 2],
                                     resolution=32, scaling_factor=0.3611,
                                     shift_factor=0.1159)
    pipe.init_params(height=32, width=32, txt_len=8)
    control = jnp.zeros((1, 4, 4, 4))
    with pytest.raises(ValueError, match="t5_path and clip_path"):
        pipe(control, width=32, height=32, num_steps=1, txt_len=8, prompt="a cat")
