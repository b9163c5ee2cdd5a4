"""2-D (data x model) mesh: tensor-parallel param sharding compiles, runs a
full two-phase training step, and matches the replicated result."""

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    tensor_parallel_params,
)
from vqvae_from_gaussian_vae_tpu.parallel.train_state import make_optimizers
from vqvae_from_gaussian_vae_tpu.parallel.train_step import TrainStepBuilder
from tests.test_train_step import _batch, _tiny_engine


def test_tensor_parallel_sharding_places_large_kernels():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    engine = _tiny_engine()
    engine.init_params(jax.random.PRNGKey(0), example=jnp.zeros((1, 32, 32, 3)))
    params = tensor_parallel_params(mesh, engine.params, min_size=1024)
    specs = {
        jax.tree_util.keystr(path): leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    sharded = [k for k, s in specs.items() if any(a == MODEL_AXIS for a in s)]
    assert sharded, "no kernel got a model-axis sharding"
    assert any("conv" in k for k in sharded)


def test_dp_tp_train_step_matches_replicated():
    engine = _tiny_engine()
    ae_opt, disc_opt = make_optimizers(1e-4)
    builder = TrainStepBuilder(engine, ae_opt, disc_opt)
    state0 = builder.init_state(jax.random.PRNGKey(0), _batch())
    batch = _batch(seed=3)

    # replicated 8-way dp baseline
    mesh_dp = make_mesh({"data": -1})
    with mesh_dp:
        s_dp = state0.replace(
            engine_params=replicate(mesh_dp, state0.engine_params),
            loss_params=replicate(mesh_dp, state0.loss_params),
            ae_opt_state=replicate(mesh_dp, state0.ae_opt_state),
            disc_opt_state=replicate(mesh_dp, state0.disc_opt_state),
            duals=replicate(mesh_dp, state0.duals),
            rng=replicate(mesh_dp, state0.rng),
            step=replicate(mesh_dp, state0.step),
        )
        s_dp, log_dp = builder.ae_step(s_dp, shard_batch(mesh_dp, batch), disc_active=True)

    # 4x2 dp x tp
    engine2 = _tiny_engine()
    builder2 = TrainStepBuilder(engine2, *make_optimizers(1e-4))
    state1 = builder2.init_state(jax.random.PRNGKey(0), _batch())
    mesh_tp = make_mesh({"data": 4, "model": 2})
    with mesh_tp:
        tp_params = tensor_parallel_params(mesh_tp, state1.engine_params, min_size=1024)
        s_tp = state1.replace(
            engine_params=tp_params,
            loss_params=replicate(mesh_tp, state1.loss_params),
            ae_opt_state=replicate(mesh_tp, state1.ae_opt_state),
            disc_opt_state=replicate(mesh_tp, state1.disc_opt_state),
            duals=replicate(mesh_tp, state1.duals),
            rng=replicate(mesh_tp, state1.rng),
            step=replicate(mesh_tp, state1.step),
        )
        s_tp, log_tp = builder2.ae_step(s_tp, shard_batch(mesh_tp, batch), disc_active=True)

    np.testing.assert_allclose(
        float(log_dp["train/loss/total"]), float(log_tp["train/loss/total"]), rtol=2e-4
    )
    # updated params agree between the two layouts
    a = jax.tree.leaves(s_dp.engine_params)[0]
    b = jax.tree.leaves(s_tp.engine_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flux_megatron_tp_matches_replicated():
    """FLUX Megatron TP (the 12B model family that actually needs the model
    axis): column/row-sharded block kernels on a 2x4 (data x model) mesh
    reproduce the replicated forward, with every big block kernel split."""
    from vqvae_from_gaussian_vae_tpu.models import flux as F
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import (
        MODEL_AXIS,
        batch_sharding,
        megatron_params,
    )

    p = F.FluxParams(
        in_channels=32, vec_in_dim=16, context_in_dim=32, hidden_size=64,
        mlp_ratio=2.0, num_heads=4, depth=2, depth_single_blocks=2,
        axes_dim=(4, 6, 6), qkv_bias=True, guidance_embed=False,
    )
    model = F.Flux(p, remat=False)
    rng = np.random.default_rng(1)
    b = 2
    img = jnp.asarray(rng.standard_normal((b, 16, 32)), jnp.float32)
    img_ids = F.make_img_ids(8, 8, b)
    txt = jnp.asarray(rng.standard_normal((b, 8, 32)), jnp.float32)
    txt_ids = jnp.zeros((b, 8, 3))
    t = jnp.full((b,), 0.5)
    y = jnp.asarray(rng.standard_normal((b, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids, t, y)["params"]
    # the final layer is zero-init (velocity 0 at t=0): randomise it so the
    # parity check is non-trivial
    key = jax.random.PRNGKey(7)
    params["final_layer"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.fold_in(key, x.size), x.shape, x.dtype) * 0.02,
        params["final_layer"],
    )

    def fwd(prm, *args):
        return model.apply({"params": prm}, *args)

    ref = fwd(params, img, img_ids, txt, txt_ids, t, y)

    mesh = make_mesh({"data": 2, "model": 4})
    with mesh:
        tp_params = megatron_params(mesh, params)
        specs = {
            jax.tree_util.keystr(path): leaf.sharding.spec
            for path, leaf in jax.tree_util.tree_flatten_with_path(tp_params)[0]
        }
        col = [k for k, s in specs.items()
               if "kernel" in k and len(s) == 2 and s[1] == MODEL_AXIS]
        row = [k for k, s in specs.items()
               if "kernel" in k and len(s) == 2 and s[0] == MODEL_AXIS]
        assert any("attn_qkv" in k for k in col) and any("linear1" in k for k in col)
        assert any("attn_proj" in k for k in row) and any("linear2" in k for k in row)
        assert any("mlp_0" in k for k in col) and any("mlp_2" in k for k in row)

        bsh = batch_sharding(mesh)
        sharded_in = [jax.device_put(a, bsh) for a in (img, img_ids, txt, txt_ids, t, y)]
        jitted = jax.jit(fwd)
        # the Megatron pairing must lower to all-reduces (one per pair),
        # not to a full re-gather of the sharded parameters
        hlo = jitted.lower(tp_params, *sharded_in).compile().as_text()
        assert "all-reduce" in hlo
        out = jitted(tp_params, *sharded_in)

    # bf16 block compute: tp changes the reduction order, tolerance at
    # bf16-rounding level of the O(1) activations
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=5e-2, rtol=5e-2
    )


def test_flux_dev_params_split_fits_v5e():
    """At full flux-dev scale (11.9B params — too big for one v5e chip) the
    Megatron rules split >=99% of parameters: tp=2 per-chip weights fit a
    16 GB chip in bf16.  Analytic via eval_shape (no memory is allocated)."""
    from vqvae_from_gaussian_vae_tpu.models import flux as F
    from vqvae_from_gaussian_vae_tpu.parallel.mesh import (
        FLUX_COLUMN_PARALLEL,
        FLUX_ROW_PARALLEL,
    )

    p = F.flux_dev_params()
    model = F.Flux(p, remat=False)
    b, L, T = 1, 1024, 512
    args = (jnp.zeros((b, L, 64)), jnp.zeros((b, L, 3)),
            jnp.zeros((b, T, 4096)), jnp.zeros((b, T, 3)),
            jnp.zeros((b,)), jnp.zeros((b, 768)), None, jnp.zeros((b,)))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args))["params"]
    total = split = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        names = [q.key for q in path if hasattr(q, "key")]
        parent, leafname = "/".join(names[:-1]), names[-1]
        n = int(np.prod(leaf.shape))
        total += n
        col = any(parent.endswith(c) for c in FLUX_COLUMN_PARALLEL)
        r = any(parent.endswith(s) for s in FLUX_ROW_PARALLEL)
        if (col and leafname in ("kernel", "bias")) or (r and leafname == "kernel"):
            assert n % 2 == 0 and (leaf.shape[-1] if col else leaf.shape[0]) % 2 == 0
            split += n
    assert total > 11e9
    assert split / total >= 0.99
    per_chip_tp2_gb = ((total - split) + split // 2) * 2 / 2**30
    assert per_chip_tp2_gb < 12.0  # 16 GB v5e HBM minus activation headroom
