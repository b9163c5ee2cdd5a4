"""SPMD training-step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder

PKG = "vqvae_from_gaussian_vae_tpu"


def _tiny_engine():
    model_cfg = {
        "target": f"{PKG}.models.autoencoder.AutoencodingEngine",
        "params": {
            "input_key": "img",
            "loss_config": {
                "target": f"{PKG}.losses.discriminator_loss.GeneralLPIPSWithDiscriminator",
                "params": {
                    "perceptual_weight": 1.0,
                    "disc_start": 3,
                    "disc_weight": 0.75,
                    "learn_logvar": True,
                    "regularization_weights": {"kl_loss": 0.1},
                    "additional_log_keys": ["bits-mean"],
                    "discriminator_config": {
                        "target": f"{PKG}.losses.discriminator.NLayerDiscriminator",
                        "params": {"input_nc": 3, "ndf": 8, "n_layers": 2, "use_actnorm": True},
                    },
                },
            },
            "regularizer_config": {
                "target": f"{PKG}.quantization.gaussian.GaussianQuantRegularizer",
                "params": {"format": "bchw", "group": 4, "n_samples": 256,
                           "seed": 7, "backend": "xla"},
            },
            "encoder_config": {
                "target": f"{PKG}.models.unet.Encoder",
                "params": {
                    "attn_type": "vanilla", "double_z": True, "z_channels": 4,
                    "resolution": 32, "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [],
                    "dropout": 0.0,
                },
            },
            "decoder_config": {
                "target": f"{PKG}.models.unet.Decoder",
                "params": {
                    "attn_type": "vanilla", "double_z": True, "z_channels": 4,
                    "resolution": 32, "in_channels": 3, "out_ch": 3, "ch": 32,
                    "ch_mult": [1, 2], "num_res_blocks": 1, "attn_resolutions": [],
                    "dropout": 0.0,
                },
            },
        },
    }
    return instantiate_from_config(model_cfg)


def _batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    return {"img": rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)}


def test_train_loop_on_8_device_mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    engine = _tiny_engine()
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)

    mesh = make_mesh({"data": -1})
    assert mesh.shape["data"] == 8

    state = builder.init_state(jax.random.PRNGKey(0), _batch())
    state = state.replace(
        engine_params=replicate(mesh, state.engine_params),
        loss_params=replicate(mesh, state.loss_params),
        ae_opt_state=replicate(mesh, state.ae_opt_state),
        disc_opt_state=replicate(mesh, state.disc_opt_state),
        duals=replicate(mesh, state.duals),
        rng=jax.device_put(state.rng, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
        step=jax.device_put(state.step, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
    )

    lam_before = float(state.duals["lam"])
    logs = []
    with mesh:
        for i in range(6):
            batch = shard_batch(mesh, _batch(seed=i + 1))
            step = int(state.step)
            disc_active = step >= 3
            if i % 2 == 0:
                state, log = builder.ae_step(state, batch, disc_active=disc_active)
            else:
                state, log = builder.disc_step(state, batch)
            logs.append({k: float(v) for k, v in log.items()})

    assert int(state.step) == 6
    # ae losses present + finite
    assert np.isfinite(logs[0]["train/loss/total"])
    assert "train/kl_loss" in logs[0] and "train/bits-mean" in logs[0]
    # pre-disc-start ae step has d_weight 0; post-start it is adaptive > 0
    assert logs[0]["train/scalars/d_weight"] == 0.0
    assert logs[4]["train/scalars/d_weight"] > 0.0
    # disc phase logs
    assert "train/loss/disc" in logs[1]
    assert logs[1]["train/loss/disc"] == 0.0  # gated pre-start
    assert logs[5]["train/loss/disc"] > 0.0
    # GQ duals moved (multiplicative updates applied from global stats)
    assert float(state.duals["lam"]) != lam_before

    # eval step produces both phase logs
    ev = builder.eval_step(state, shard_batch(mesh, _batch(seed=99)))
    assert "val/loss/rec" in ev and "val/loss/disc" in ev
    assert np.isfinite(float(ev["val/loss/total"]))


def test_ae_step_changes_params_and_respects_frozen_lpips():
    engine = _tiny_engine()
    ae_opt, disc_opt = make_optimizers(1e-3)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    state = builder.init_state(jax.random.PRNGKey(1), _batch())

    enc_before = np.asarray(
        jax.tree.leaves(state.engine_params["encoder"])[0]
    ).copy()
    lpips_before = jax.tree.map(np.asarray, state.loss_params["perceptual_loss"])
    disc_before = jax.tree.map(np.asarray, state.loss_params["discriminator"])
    logvar_before = float(state.loss_params["logvar"])

    state, _ = builder.ae_step(state, _batch(seed=5), disc_active=False)

    enc_after = np.asarray(jax.tree.leaves(state.engine_params["encoder"])[0])
    assert not np.allclose(enc_before, enc_after)
    assert float(state.loss_params["logvar"]) != logvar_before  # learn_logvar
    # LPIPS and discriminator untouched by the ae optimizer
    for b, a in zip(jax.tree.leaves(lpips_before), jax.tree.leaves(state.loss_params["perceptual_loss"])):
        np.testing.assert_array_equal(b, np.asarray(a))
    for b, a in zip(jax.tree.leaves(disc_before), jax.tree.leaves(state.loss_params["discriminator"])):
        np.testing.assert_array_equal(b, np.asarray(a))

    disc_state_before = jax.tree.map(np.asarray, state.loss_params["discriminator"])
    state, _ = builder.disc_step(state, _batch(seed=6))
    # pre-disc-start the disc loss is 0 -> no movement; after start it moves
    for b, a in zip(jax.tree.leaves(disc_state_before), jax.tree.leaves(state.loss_params["discriminator"])):
        np.testing.assert_array_equal(b, np.asarray(a))


def test_param_groups_freeze_and_lr_factor():
    """trainable_ae_params regex groups: a frozen subtree stays bit-identical
    over steps while matched groups move; lr overrides apply per group
    (reference get_param_groups + lr_g_factor, autoencoder.py:549-592)."""
    engine = _tiny_engine()
    engine.trainable_ae_params = [["decoder.*"], ["loss.logvar"]]
    engine.ae_optimizer_args = [{}, {"lr": 0.0}]
    ae_opt, disc_opt = make_optimizers(
        1e-3,
        lr_g_factor=engine.lr_g_factor,
        trainable_ae_params=engine.trainable_ae_params,
        ae_optimizer_args=engine.ae_optimizer_args,
    )
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    state = builder.init_state(jax.random.PRNGKey(0), _batch())
    enc0 = jax.tree.map(np.asarray, state.engine_params["encoder"])
    dec0 = jax.tree.map(np.asarray, state.engine_params["decoder"])
    logvar0 = float(state.loss_params["logvar"])
    for i in range(3):
        state, _ = builder.ae_step(state, _batch(seed=i), disc_active=False)
    # frozen: encoder (matched no group) and logvar (group lr 0.0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.engine_params["encoder"], enc0,
    )
    assert float(state.loss_params["logvar"]) == logvar0
    # trained: decoder moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.engine_params["decoder"], dec0,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_lr_g_factor_scales_generator_updates():
    """lr_g_factor multiplies only the generator LR (autoencoder.py:582)."""
    import copy

    results = []
    for factor in (1.0, 0.5):
        engine = _tiny_engine()
        engine.lr_g_factor = factor
        ae_opt, disc_opt = make_optimizers(1e-3, lr_g_factor=factor)
        builder = TrainStepBuilder(engine, ae_opt, disc_opt)
        state = builder.init_state(jax.random.PRNGKey(0), _batch())
        p0 = np.asarray(state.engine_params["decoder"]["conv_out"]["bias"])
        state, _ = builder.ae_step(state, _batch(seed=1), disc_active=False)
        p1 = np.asarray(state.engine_params["decoder"]["conv_out"]["bias"])
        results.append(np.abs(p1 - p0).max())
    # adam's first step is +-lr * sign-ish: halving lr halves the step
    np.testing.assert_allclose(results[1], results[0] * 0.5, rtol=1e-3)


def _replicated_state(builder, mesh, seed=0):
    state = builder.init_state(jax.random.PRNGKey(seed), _batch())
    P = jax.sharding.PartitionSpec
    return state.replace(
        engine_params=replicate(mesh, state.engine_params),
        loss_params=replicate(mesh, state.loss_params),
        ae_opt_state=replicate(mesh, state.ae_opt_state),
        disc_opt_state=replicate(mesh, state.disc_opt_state),
        duals=replicate(mesh, state.duals),
        rng=jax.device_put(state.rng, jax.sharding.NamedSharding(mesh, P())),
        step=jax.device_put(state.step, jax.sharding.NamedSharding(mesh, P())),
    )


def test_bf16_grad_allreduce_knob():
    """grad_allreduce_dtype=bf16 reduces DP gradient partial sums in bf16.

    Mechanism check (docs/architecture.md disc-phase mitigation): a plain
    astype AFTER jax.grad cannot move the GSPMD all-reduce to bf16 — the
    partitioner resolves the partial sum at the wgrad dot, in fp32.  The
    knob routes grads through an explicit-sharding `unreduced` region, so
    the cast happens before the cross-chip sum.  On CPU the backend's
    AllReducePromotion pass widens the wire dtype back to f32, so this test
    pins the *semantics* (bf16-rounded gradients; params move, stay close
    to the fp32-reduce trajectory) and the TPU wire dtype is AOT-verified
    separately (scripts/audit_collectives.py --overlap, v5e topology).
    """
    import pytest

    engine = _tiny_engine()
    ae_opt, disc_opt = make_optimizers(1e-3)
    mesh = make_mesh({"data": -1})

    with pytest.raises(ValueError):
        TrainStepBuilder(engine, ae_opt, disc_opt,
                         grad_allreduce_dtype="bfloat16")

    plain = TrainStepBuilder(engine, ae_opt, disc_opt)
    knob = TrainStepBuilder(engine, ae_opt, disc_opt,
                            grad_allreduce_dtype="bfloat16", mesh=mesh,
                            grad_allreduce_phases=("ae", "disc"))
    s0 = _replicated_state(plain, mesh, seed=3)
    s0 = s0.replace(step=jnp.int32(100))  # disc active
    # the steps donate their state arg: give each call its own copy
    copies = [jax.tree.map(lambda a: jnp.array(a), s0) for _ in range(3)]
    with mesh:
        batch = shard_batch(mesh, _batch(seed=11))
        sp, logp = plain.disc_step(copies[0], batch)
        sk, logk = knob.disc_step(copies[1], batch)
        # identical inputs: the only difference is the grad reduce dtype
        dp = jax.tree.leaves(sp.loss_params["discriminator"])
        dk = jax.tree.leaves(sk.loss_params["discriminator"])
        diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                 for a, b in zip(dp, dk)]
        assert any(d > 0 for d in diffs), "knob was a no-op"
        # Adam normalizes per-param scale; bf16 grad rounding (~0.4% rel)
        # must keep the update within a small fraction of the lr
        assert max(diffs) < 1e-3 * 0.5
        assert np.isfinite(float(logk["train/loss/disc"]))
        # ae phase wired too
        sa, loga = knob.ae_step(copies[2], batch, disc_active=True)
        assert np.isfinite(float(loga["train/loss/total"]))


def test_bf16_grad_allreduce_knob_skips_bf16_compute_phases():
    """Under bf16 loss compute the backend already reduces bf16 wgrad
    partials (AOT audit, docs/architecture.md); stacking the knob would
    double the wire bytes — the builder must warn and skip those phases."""
    import warnings

    engine = _tiny_engine()
    # the overlay's loss-path dtype knob (losses/discriminator_loss.py)
    object.__setattr__(engine.loss, "dtype", jnp.bfloat16)
    ae_opt, disc_opt = make_optimizers(1e-3)
    mesh = make_mesh({"data": -1})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        b = TrainStepBuilder(engine, ae_opt, disc_opt,
                             grad_allreduce_dtype="bfloat16", mesh=mesh,
                             grad_allreduce_phases=("ae", "disc"))
    assert b.grad_allreduce_phases == ()
    assert any("double the wire bytes" in str(x.message) for x in w)
