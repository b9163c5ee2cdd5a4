"""ops/layer_norm.py (fused Pallas LayerNorm) vs flax nn.LayerNorm:
forward + full gradient parity, fp32 and bf16, interpret mode on CPU and
the real kernel on TPU.  models/vit.py's FusedLayerNorm wrapper must keep
nn.LayerNorm's parameter tree (checkpoint compatibility)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.layer_norm import layer_norm, layer_norm_add

INTERPRET = jax.default_backend() != "tpu"


def _data(dtype=jnp.float32, shape=(4, 64, 256)):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 2 + 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.3 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.1
    return x.astype(dtype), g, b


def _ref(x, g, b):
    return nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": g, "bias": b}}, x.astype(jnp.float32))


def test_fused_ln_forward_and_grads_match_flax():
    x, g, b = _data()
    y_ref = _ref(x, g, b)
    y = layer_norm(x, g, b, 1e-5, INTERPRET)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    def loss(fn):
        return lambda x, g, b: jnp.sum(jnp.sin(fn(x, g, b)))

    g_ref = jax.grad(loss(_ref), argnums=(0, 1, 2))(x, g, b)
    g_fused = jax.grad(loss(lambda x, g, b: layer_norm(x, g, b, 1e-5, INTERPRET)),
                       argnums=(0, 1, 2))(x, g, b)
    for a, c in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)


def test_fused_ln_bf16_path():
    x, g, b = _data(jnp.bfloat16)
    y = layer_norm(x, g, b, 1e-5, INTERPRET)
    assert y.dtype == jnp.bfloat16
    y_ref = _ref(x, g, b)
    assert float(jnp.abs(y.astype(jnp.float32) - y_ref).max()) < 0.05


def test_fused_ln_module_param_tree_matches_nn_layernorm():
    from vqvae_from_gaussian_vae_tpu.models.vit import FusedLayerNorm

    x = jnp.ones((2, 8, 256))
    p_f = FusedLayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)["params"]
    p_n = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_f) == jax.tree.structure(p_n)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(p_f), jax.tree.leaves(p_n)))
    # fallback path on CPU matches nn.LayerNorm numerics
    y_f = FusedLayerNorm(epsilon=1e-5).apply({"params": p_f}, x)
    y_n = nn.LayerNorm(epsilon=1e-5).apply({"params": p_n}, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_n), atol=1e-6)


def test_fused_ln_shards_over_rows():
    """custom_partitioning: rows shard over the mesh, scale/bias replicate,
    and the backward's parameter grads psum — numeric parity with the
    single-device path on an 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(devs.reshape(8), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 256))
    d = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 256))
    g = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.3 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(3), (256,)) * 0.1
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ds = jax.device_put(d, NamedSharding(mesh, P("data")))

    def loss(x, d, g, b):
        s, y = layer_norm_add(x, d, g, b, 1e-5, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(s))

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    got = f(xs, ds, g, b)
    want = f(x, d, g, b)
    for a, c in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-5)
    # fwd stays row-sharded (dim0 of the flattened rows = the batch dim)
    y = jax.jit(lambda x, g, b: layer_norm(x, g, b, 1e-5, True))(xs, g, b)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(layer_norm(x, g, b, 1e-5, True)), atol=1e-6)
