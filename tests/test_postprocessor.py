"""Flow-matching postprocessor + HDiT denoiser tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu import instantiate_from_config

PKG = "vqvae_from_gaussian_vae_tpu"


def _post_engine():
    cfg = {
        "target": f"{PKG}.models.postprocessor.AutoencodingPostEngine",
        "params": {
            "input_key": "img",
            "num_flow_steps": 4,
            "mmse_noise_std": 0.1,
            "clamp_range": [-1, 1],
            "post_config": {
                "target": f"{PKG}.models.hdit.create_hdit_model",
                "params": {
                    "patch_size": 4,
                    "widths": [32, 64],
                    "depths": [1, 1],
                    "windows": [4, 0],
                    "mapping_width": 32,
                },
            },
            "regularizer_config": {
                "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
                "params": {"format": "bchw", "group": 4, "n_samples": 256,
                           "seed": 7, "backend": "xla"},
            },
            "encoder_config": {
                "target": f"{PKG}.models.unet.Encoder",
                "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                           "resolution": 32, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
            "decoder_config": {
                "target": f"{PKG}.models.unet.Decoder",
                "params": {"attn_type": "vanilla", "double_z": True, "z_channels": 4,
                           "resolution": 32, "in_channels": 3, "out_ch": 3, "ch": 32,
                           "ch_mult": [1, 2], "num_res_blocks": 1,
                           "attn_resolutions": [], "dropout": 0.0},
            },
        },
    }
    return instantiate_from_config(cfg)


def test_hdit_shapes_and_time_conditioning():
    from vqvae_from_gaussian_vae_tpu.models.hdit import create_hdit_model

    net = create_hdit_model(patch_size=4, widths=[32, 64], depths=[1, 1],
                            windows=[4, 0], mapping_width=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    t = jnp.asarray([0.1, 0.9])
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    v1 = net.apply({"params": params}, x, t)
    assert v1.shape == x.shape
    # zero-init output head -> exactly zero at init
    np.testing.assert_allclose(np.asarray(v1), 0.0, atol=1e-7)


def test_hdit_flash_matches_einsum(monkeypatch):
    """HDiTBlock's token-major SDPA routes through the packed flash kernel
    on the bf16 path — parity vs the einsum fallback for both the
    shifted-window branch (window 16 -> 256-token windows) and the global
    bottleneck branch."""
    from vqvae_from_gaussian_vae_tpu.models.hdit import HDiTBlock

    rng = np.random.default_rng(3)
    for window, grid in ((16, (32, 32)), (0, (16, 8))):
        l = grid[0] * grid[1]
        blk = HDiTBlock(width=128, heads=2, window=window, shift=bool(window),
                        dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, l, 128)), jnp.bfloat16)
        cond = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x, cond, grid)["params"]
        # attn_out is zero-init (AdaLN residual convention); randomise it so
        # the attention contribution actually reaches the output
        params = jax.tree.map(lambda p: p, params)
        params["attn_out"]["kernel"] = jnp.asarray(
            rng.standard_normal(params["attn_out"]["kernel"].shape) * 0.1,
            jnp.float32)

        monkeypatch.setenv("GVQ_DISABLE_FUSED_KERNELS", "1")
        ref = blk.apply({"params": params}, x, cond, grid)
        monkeypatch.delenv("GVQ_DISABLE_FUSED_KERNELS")
        monkeypatch.setenv("GVQ_FLASH_INTERPRET", "1")
        out = blk.apply({"params": params}, x, cond, grid)
        monkeypatch.delenv("GVQ_FLASH_INTERPRET")
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)


def test_post_engine_train_and_sample():
    eng = _post_engine()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    eng.init_params(jax.random.PRNGKey(0), example=x)

    # shared AE API works through the post engine
    z, reg_log = eng.encode(x, return_reg_log=True)
    xhat = eng.decode(z)
    assert xhat.shape == x.shape
    x2 = eng.dequant(reg_log["indices"])
    assert x2.shape == x.shape

    # training reduces the flow-matching loss on a fixed batch
    step, opt_state = eng.make_train_step(2e-3)
    params = eng.poster_params
    ae_before = jax.tree.map(np.asarray, eng.ae.params["encoder"])
    losses = []
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, x, jax.random.PRNGKey(i % 3))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    eng.poster_params = params
    # the AE stayed frozen
    for b, a in zip(jax.tree.leaves(ae_before), jax.tree.leaves(eng.ae.params["encoder"])):
        np.testing.assert_array_equal(b, np.asarray(a))

    # Euler sampler runs and respects the clamp
    xpost = eng.post(xhat, rng=jax.random.PRNGKey(5))
    assert xpost.shape == x.shape
    assert float(jnp.max(jnp.abs(xpost))) <= 1.0 + 1e-6
    logs = eng.log_images({"img": x})
    assert set(logs) == {"inputs", "xhat", "xhat_post"}
