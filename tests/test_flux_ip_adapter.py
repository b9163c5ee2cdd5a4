"""IP-adapter parity vs the reference torch processors
(`/root/reference/pit/modules/flux/modules/layers.py:221-299` double,
`:391-449` single, `:574-594` ImageProjModel): tiny-shape numeric parity on
identical converted weights, plus the zero-init no-op property."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vqvae_from_gaussian_vae_tpu.models import flux as F

sys.path.append("/root/reference")

H, HEADS, CTX = 64, 4, 32
HD = H // HEADS


def _torch_pe(ids, axes_dim, theta=10000):
    from pit.modules.flux.modules.layers import EmbedND

    return EmbedND(dim=HD, theta=theta, axes_dim=list(axes_dim))(ids)


def _t2j(t):
    return np.asarray(t.detach().numpy())


def _dense(sd, key):
    out = {"kernel": _t2j(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t2j(sd[f"{key}.bias"])
    return out


def _convert_double(sd, ip=True):
    params = {}
    for s in ("img", "txt"):
        params[f"{s}_mod"] = {"lin": _dense(sd, f"{s}_mod.lin")}
        params[f"{s}_attn_qkv"] = _dense(sd, f"{s}_attn.qkv")
        params[f"{s}_attn_norm"] = {
            "query_norm": {"scale": _t2j(sd[f"{s}_attn.norm.query_norm.scale"])},
            "key_norm": {"scale": _t2j(sd[f"{s}_attn.norm.key_norm.scale"])},
        }
        params[f"{s}_attn_proj"] = _dense(sd, f"{s}_attn.proj")
        params[f"{s}_mlp_0"] = _dense(sd, f"{s}_mlp.0")
        params[f"{s}_mlp_2"] = _dense(sd, f"{s}_mlp.2")
    if ip:
        for kv in ("k", "v"):
            params[f"ip_adapter_double_stream_{kv}_proj"] = _dense(
                sd, f"processor.ip_adapter_double_stream_{kv}_proj")
    return params


def _convert_single(sd, ip=True):
    params = {
        "modulation": {"lin": _dense(sd, "modulation.lin")},
        "linear1": _dense(sd, "linear1"),
        "linear2": _dense(sd, "linear2"),
        "norm": {
            "query_norm": {"scale": _t2j(sd["norm.query_norm.scale"])},
            "key_norm": {"scale": _t2j(sd["norm.key_norm.scale"])},
        },
    }
    if ip:
        for kv in ("k", "v"):
            params[f"ip_adapter_single_stream_{kv}_proj"] = _dense(
                sd, f"processor.ip_adapter_single_stream_{kv}_proj")
    return params


def _randomize_ip(proc, seed=5):
    """Zero-init adapters are no-ops; give them real weights for the test."""
    g = torch.Generator().manual_seed(seed)
    for p in proc.parameters():
        p.data.copy_(torch.randn(p.shape, generator=g) * 0.05)


def _inputs(b=2, l_img=16, l_txt=8, l_ip=4, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((b, l_img, H)).astype(np.float32)
    txt = rng.standard_normal((b, l_txt, H)).astype(np.float32)
    vec = rng.standard_normal((b, H)).astype(np.float32)
    image_proj = rng.standard_normal((b, l_ip, CTX)).astype(np.float32)
    img_ids = np.asarray(F.make_img_ids(8, 8, b), np.float32)  # (h//2)*(w//2) = 16 ids
    txt_ids = np.zeros((b, l_txt, 3), np.float32)
    ids = np.concatenate([txt_ids, img_ids], axis=1)
    return img, txt, vec, image_proj, ids


AXES = (4, 6, 6)  # sums to HD=16


def test_ip_double_stream_block_parity():
    from pit.modules.flux.modules.layers import (
        DoubleStreamBlock as TDouble, IPDoubleStreamBlockProcessor,
    )

    torch.manual_seed(0)
    tblock = TDouble(H, HEADS, mlp_ratio=2.0, qkv_bias=True).eval()
    proc = IPDoubleStreamBlockProcessor(CTX, H)
    _randomize_ip(proc)
    tblock.set_processor(proc)

    img, txt, vec, image_proj, ids = _inputs()
    tpe = _torch_pe(torch.from_numpy(ids), AXES)
    with torch.no_grad():
        t_img, t_txt = tblock(
            torch.from_numpy(img), torch.from_numpy(txt), torch.from_numpy(vec),
            tpe, image_proj=torch.from_numpy(image_proj), ip_scale=0.7)

    jblock = F.DoubleStreamBlock(H, HEADS, mlp_ratio=2.0, qkv_bias=True,
                                 dtype=jnp.float32, ip_context_dim=CTX)
    jparams = _convert_double(tblock.state_dict())
    jpe = F.embed_nd(jnp.asarray(ids), AXES, 10000)
    j_img, j_txt = jblock.apply({"params": jparams}, jnp.asarray(img),
                                jnp.asarray(txt), jnp.asarray(vec), jpe,
                                jnp.asarray(image_proj), 0.7)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=2e-4, rtol=1e-3)


def test_ip_single_stream_block_parity():
    from pit.modules.flux.modules.layers import (
        SingleStreamBlock as TSingle, IPSingleStreamBlockProcessor,
    )

    torch.manual_seed(1)
    tblock = TSingle(H, HEADS, mlp_ratio=2.0).eval()
    proc = IPSingleStreamBlockProcessor(CTX, H)
    _randomize_ip(proc, seed=6)
    tblock.set_processor(proc)

    img, txt, vec, image_proj, ids = _inputs()
    x = np.concatenate([txt, img], axis=1)
    tpe = _torch_pe(torch.from_numpy(ids), AXES)
    with torch.no_grad():
        t_out = tblock(torch.from_numpy(x), torch.from_numpy(vec), tpe,
                       image_proj=torch.from_numpy(image_proj), ip_scale=0.7)

    jblock = F.SingleStreamBlock(H, HEADS, mlp_ratio=2.0, dtype=jnp.float32,
                                 ip_context_dim=CTX)
    jparams = _convert_single(tblock.state_dict())
    jpe = F.embed_nd(jnp.asarray(ids), AXES, 10000)
    j_out = jblock.apply({"params": jparams}, jnp.asarray(x), jnp.asarray(vec),
                         jpe, jnp.asarray(image_proj), 0.7)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4, rtol=1e-3)


def test_image_proj_model_parity():
    from pit.modules.flux.modules.layers import ImageProjModel as TProj

    torch.manual_seed(2)
    tproj = TProj(cross_attention_dim=48, clip_embeddings_dim=CTX,
                  clip_extra_context_tokens=4).eval()
    x = np.random.default_rng(3).standard_normal((2, CTX)).astype(np.float32)
    with torch.no_grad():
        t_out = tproj(torch.from_numpy(x))

    jproj = F.ImageProjModel(cross_attention_dim=48, clip_embeddings_dim=CTX,
                             clip_extra_context_tokens=4, dtype=jnp.float32)
    sd = tproj.state_dict()
    jparams = {"proj": _dense(sd, "proj"),
               "norm": {"scale": _t2j(sd["norm.weight"]), "bias": _t2j(sd["norm.bias"])}}
    j_out = jproj.apply({"params": jparams}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5, rtol=1e-5)


def test_ip_zero_init_is_noop_and_flux_threads_ip():
    """Fresh (zero-init) adapters change nothing (`layers.py:237-243`), and
    the full Flux model accepts image_proj/ip_scale."""
    from tests.test_flux import TINY, _inputs as flux_inputs

    import dataclasses

    model = F.Flux(TINY, remat=False, ip_context_dim=CTX)
    img, img_ids, txt, txt_ids, t, y, g = flux_inputs()
    rng = np.random.default_rng(9)
    image_proj = jnp.asarray(rng.standard_normal((1, 4, CTX)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids, t, y,
                        None, g, image_proj, 1.0)["params"]
    # adapter params exist on every block
    assert "ip_adapter_double_stream_k_proj" in params["double_blocks_0"]
    assert "ip_adapter_single_stream_v_proj" in params["single_blocks_0"]
    out_with = model.apply({"params": params}, img, img_ids, txt, txt_ids, t, y,
                           None, g, image_proj, 1.0)
    out_without = model.apply({"params": params}, img, img_ids, txt, txt_ids, t, y,
                              None, g)
    np.testing.assert_allclose(np.asarray(out_with), np.asarray(out_without), atol=1e-6)


def test_flux_pipeline_image_prompt_end_to_end_tiny():
    """The pipeline path: ImageProjModel projects a CLIP image embedding and
    the denoise loop threads it (reference `xflux_pipeline.py:36-112`)."""
    from tests.test_flux import TINY
    from vqvae_from_gaussian_vae_tpu.models.flux_pipeline import FluxPipeline
    from vqvae_from_gaussian_vae_tpu.models.third_party import AutoencoderKLDiffusers

    pipe = FluxPipeline(control_channels=4, flux_params=TINY, controlnet_depth=1,
                        ip_context_dim=CTX, clip_embeddings_dim=24,
                        clip_extra_context_tokens=2)
    pipe.ae = AutoencoderKLDiffusers(latent_channels=16, ch=32, ch_mult=[1, 2],
                                     resolution=32, scaling_factor=0.3611,
                                     shift_factor=0.1159)
    pipe.init_params(height=32, width=32, txt_len=8)
    assert pipe.image_proj_params is not None
    rng = np.random.default_rng(4)
    control = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    embeds = jnp.asarray(rng.standard_normal((1, 24)), jnp.float32)
    out = pipe(control, width=32, height=32, num_steps=2, txt_len=8,
               image_prompt_embeds=embeds, ip_scale=0.6)
    assert out.ndim == 4 and out.shape[0] == 1 and out.shape[3] == 3
    assert np.isfinite(np.asarray(out, np.float32)).all()
