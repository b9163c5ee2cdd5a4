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
