"""Attention zoo, video datasets, GQ2 torch parity, flops estimator."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

PKG = "vqvae_from_gaussian_vae_tpu"


def test_attention_zoo_shapes():
    from vqvae_from_gaussian_vae_tpu.models.attention import (
        BasicTransformerBlock,
        CrossAttention,
        SpatialTransformer,
    )

    rng = {"params": jax.random.PRNGKey(0)}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32)), jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 7, 24)), jnp.float32)

    ca = CrossAttention(query_dim=32, context_dim=24, heads=4, dim_head=8)
    v = ca.init(rng, x, ctx)
    out = ca.apply(v, x, ctx)
    assert out.shape == x.shape

    blk = BasicTransformerBlock(dim=32, n_heads=4, d_head=8, context_dim=24)
    v = blk.init(rng, x, ctx)
    assert blk.apply(v, x, ctx).shape == x.shape

    img = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 32)), jnp.float32)
    st = SpatialTransformer(in_channels=32, n_heads=4, d_head=8, depth=2)
    v = st.init(rng, img)
    out = st.apply(v, img)
    assert out.shape == img.shape
    # zero-init out-proj -> identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_attention_zoo_dormant_classes():
    """The reference's dormant SD classes (`attention.py:178,234,599,750`)
    are ported: SelfAttention, SpatialSelfAttention,
    BasicTransformerSingleLayerBlock, SimpleTransformer."""
    from vqvae_from_gaussian_vae_tpu.models.attention import (
        BasicTransformerSingleLayerBlock,
        SelfAttention,
        SimpleTransformer,
        SpatialSelfAttention,
    )

    rng = {"params": jax.random.PRNGKey(0)}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32)), jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 7, 24)), jnp.float32)

    sa = SelfAttention(dim=32, num_heads=4)
    v = sa.init(rng, x)
    assert sa.apply(v, x).shape == x.shape
    # packed qkv Linear like timm: one (32, 96) kernel
    assert v["params"]["qkv"]["kernel"].shape == (32, 96)

    img = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 8, 32)), jnp.float32)
    ssa = SpatialSelfAttention(in_channels=32)
    v = ssa.init(rng, img)
    assert ssa.apply(v, img).shape == img.shape

    blk = BasicTransformerSingleLayerBlock(dim=32, n_heads=4, d_head=8, context_dim=24)
    v = blk.init(rng, x, ctx)
    assert blk.apply(v, x, ctx).shape == x.shape

    tr = SimpleTransformer(dim=32, depth=2, heads=4, dim_head=8, context_dim=24)
    v = tr.init(rng, x, ctx)
    assert tr.apply(v, x, ctx).shape == x.shape
    assert "layers_1" in v["params"]


def test_video_dataset_gif(tmp_path):
    from PIL import Image

    from vqvae_from_gaussian_vae_tpu.data.video import ImageDataset, VideoDataset

    rng = np.random.default_rng(0)
    frames = [Image.fromarray(rng.integers(0, 255, (24, 30, 3), dtype=np.uint8)) for _ in range(6)]
    gif = tmp_path / "clip.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:])

    ds = VideoDataset(str(tmp_path), image_size=16, num_frames=4)
    item = ds[0]
    assert item["video"].shape == (4, 16, 16, 3)
    assert item["img"].shape == (16, 16, 3)
    assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0

    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(tmp_path / "a.png")
    ids = ImageDataset(str(tmp_path), image_size=16, num_frames=3)
    item = ids[0]
    assert item["video"].shape == (3, 16, 16, 3)


def test_gq2_matches_torch_reference():
    """GaussianQuantRegularizer2: losses + vq indices vs the reference."""
    from pit.quantization.gaussian import GaussianQuantRegularizer2 as TorchGQ2

    from vqvae_from_gaussian_vae_tpu.quantization.gaussian import GaussianQuantRegularizer2

    tmod = TorchGQ2(dim=16, codebook_size=1024, dim_idx=1, backend="torch").train()
    z = np.random.default_rng(5).standard_normal((2, 32, 4, 4)).astype(np.float32)
    tzhat, tinfo = tmod(torch.from_numpy(z))

    # ours is channel-last: move torch's dim_idx=1 to -1
    jmod = GaussianQuantRegularizer2(dim=16, codebook_size=1024, dim_idx=-1, backend="xla")
    zj = jnp.asarray(z.transpose(0, 2, 3, 1))
    variables = jmod.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, zj, train=True
    )
    jzhat, jinfo = jmod.apply(
        variables, zj, train=True, rngs={"sample": jax.random.PRNGKey(2)}
    )
    np.testing.assert_allclose(float(jinfo["kl_loss"]), float(tinfo["kl_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(jinfo["bits-mean"]), float(tinfo["bits-mean"]), rtol=1e-4)
    match = (
        np.asarray(jinfo["indices"]).transpose(0, 3, 1, 2) == tinfo["indices"].numpy()
    ).mean()
    assert match > 0.99, match
    # dequant round-trips the vq branch exactly
    j2 = jmod.apply(variables, jinfo["indices"], method="dequant")
    np.testing.assert_allclose(
        np.asarray(j2), np.asarray(jinfo["zhat_quant"]), atol=1e-6
    )


def test_flops_estimator_sanity():
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    cfg = dict(ch=128, ch_mult=[1, 2, 4, 4], resolution=256, num_res_blocks=2,
               attn_resolutions=[32], z_channels=16, double_z=True, in_channels=3, out_ch=3)
    enc = F.unet_encoder_flops(cfg)
    dec = F.unet_decoder_flops(cfg)
    # conv VAEs of this size are hundreds of GFLOPs per 256px image
    assert 1e11 < enc < 1e12, enc
    assert 1e11 < dec < 2e12, dec
    assert dec > enc  # decoder has num_res_blocks+1 blocks and full-res tail
    assert F.gq_search_flops(1024, 16, 65536) == 2 * 1024 * 32 * 65536
    vit = F.vit_flops(dict(patch_size=8, image_size=256, width=768, layers=12, mlp_ratio=4))
    assert 1e11 < vit < 1e12, vit


def test_vit_attention_achievable_extra():
    """Depth-limited attention charge (utils/flops.py): with m = layers *
    2 L^2 w and r = 128/D, forward extra = (r-1)m, backward adds (2r-1)m.
    D=128 heads pay only the flash-bwd recompute; D>=128 never pays the
    depth penalty."""
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    bsq = dict(patch_size=8, image_size=256, width=768, layers=12, heads=12)
    l = (256 // 8) ** 2
    m = 12 * 2.0 * l * l * 768
    # D=64 -> r=2: fwd 2rm vs 2m charged, bwd 5rm vs 4m charged
    assert F.vit_train_attention_extra(bsq, trainable=False) == 2 * m
    assert F.vit_train_attention_extra(bsq) == 2 * m + 6 * m
    wide = dict(bsq, heads=6)  # D = 128: full rate on both MXU axes
    assert F.vit_train_attention_extra(wide, trainable=False) == 0.0
    assert F.vit_train_attention_extra(wide) == m  # recompute only


def test_unet_groupnorm_elems():
    """GN traffic counter: a single-level, single-block toy is countable
    by hand — enc: 1 resblock (r^2(cin+cout)) + 2 mid (2 * 2 r^2 c) +
    norm_out; dec: 2 mid + (n+1)=2 resblocks + norm_out."""
    from vqvae_from_gaussian_vae_tpu.utils import flops as F

    cfg = dict(ch=32, ch_mult=[1], resolution=8, num_res_blocks=1,
               attn_resolutions=[], z_channels=4)
    r2 = 64
    enc = r2 * (32 + 32) + 2 * (2 * r2 * 32) + r2 * 32
    dec = 2 * (2 * r2 * 32) + 2 * (r2 * (32 + 32)) + r2 * 32
    assert F.unet_groupnorm_elems(cfg) == enc + dec
    # flagship shape: hundreds of MB per image in bf16
    big = dict(ch=128, ch_mult=[1, 2, 4, 4], resolution=256,
               num_res_blocks=2, attn_resolutions=[32], z_channels=16)
    elems = F.unet_groupnorm_elems(big)
    assert 1e8 < elems < 3e8, elems


def test_engine_rejects_unsupported_ctor_surface():
    """Accept-and-ignore audit: stored-but-unread ctor kwargs must raise.

    The reference threads additional_decode_keys into decode(z, **extra)
    (reference autoencoder.py:430,607); this engine's decode is positional
    so a silent drop would change training behavior invisibly.
    """
    import pytest
    from vqvae_from_gaussian_vae_tpu.models.autoencoder import AutoencodingEngine
    from vqvae_from_gaussian_vae_tpu.models.postprocessor import AutoencodingPostEngine

    enc = {"target": f"{PKG}.models.unet.Encoder",
           "params": {"ch": 8, "ch_mult": [1], "num_res_blocks": 1,
                      "attn_resolutions": [], "in_channels": 3,
                      "out_ch": 3, "resolution": 16, "z_channels": 4,
                      "double_z": True}}
    dec = {"target": f"{PKG}.models.unet.Decoder", "params": dict(enc["params"])}
    reg = {"target": f"{PKG}.quantization.gaussian.IdentityRegularizer", "params": {}}
    common = dict(encoder_config=enc, decoder_config=dec, regularizer_config=reg)

    with pytest.raises(NotImplementedError, match="additional_decode_keys"):
        AutoencodingEngine(additional_decode_keys=["mask"], **common)
    with pytest.raises(TypeError, match="unsupported kwargs"):
        AutoencodingEngine(no_such_option=1, **common)
    # never instantiated: the ctor raises before building the poster
    post = {"target": f"{PKG}.models.hdit.create_hdit_model", "params": {}}
    with pytest.raises(NotImplementedError, match="additional_decode_keys"):
        AutoencodingPostEngine(post_config=post,
                               additional_decode_keys=["mask"], **common)
    with pytest.raises(TypeError, match="unsupported kwargs"):
        AutoencodingPostEngine(post_config=post, no_such_option=1, **common)
