"""GSPMD partitioning of the fused resample kernels on an 8-device mesh.

Without custom_partitioning a pallas custom call is opaque to the
partitioner, which replicates it (every device computes the FULL batch).
The kernels declare a Shardy sharding rule + partition callbacks
(ops/upsample_conv.py, ops/downsample_conv.py) so the batch dim shards:
these tests check (a) numeric parity with the single-device path and
(b) that the outputs STAY batch-sharded (no forced replication).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqvae_from_gaussian_vae_tpu.ops.downsample_conv import downsample_conv3x3_gn
from vqvae_from_gaussian_vae_tpu.ops.upsample_conv import upsample_nearest_conv3x3_gn

# these are 8-way GSPMD partitioning checks: they need the virtual CPU
# mesh; the on-chip suite (GVQ_TEST_TPU=1) runs single-device, where
# there is nothing to shard over
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


@pytest.mark.parametrize("op,with_add", [
    (upsample_nearest_conv3x3_gn, False),
    (upsample_nearest_conv3x3_gn, True),
    (downsample_conv3x3_gn, False),
    (downsample_conv3x3_gn, True),
])
def test_fused_kernel_shards_over_batch(op, with_add):
    mesh = _mesh()
    n = mesh.shape["data"]
    assert n == 8
    x = _rand((n, 8, 8, 16), 0)
    add = _rand((n, 8, 8, 16), 1) if with_add else None
    w = _rand((3, 3, 16, 16), 2, 0.1)
    b = _rand((16,), 3, 0.1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    adds = None if add is None else jax.device_put(
        add, NamedSharding(mesh, P("data")))

    @jax.jit
    def f(x, add, w, b):
        return op(x, w, b, add=add, interpret=True)

    y, stats = f(xs, adds, w, b)
    y_ref, stats_ref = op(x, w, b, add=add, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(stats_ref),
                               atol=1e-3, rtol=1e-5)
    # the batch dim must stay sharded — replication would mean every chip
    # computed the full batch
    assert y.sharding.spec[0] == "data", y.sharding
    # per-shard batch of 1: addressable shard shape check
    shard = y.addressable_shards[0]
    assert shard.data.shape[0] == 1, shard.data.shape


def test_fused_upsample_grad_under_mesh():
    from vqvae_from_gaussian_vae_tpu.ops.upsample_conv import (
        upsample_nearest_conv3x3_gn_vjp,
    )

    mesh = _mesh()
    n = mesh.shape["data"]
    x = _rand((n, 4, 4, 8), 0)
    w = _rand((3, 3, 8, 8), 1, 0.1)
    b = _rand((8,), 2, 0.1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def loss(x, w, b):
        y, stats = upsample_nearest_conv3x3_gn_vjp(x, w, b)
        return jnp.sum(y ** 2) + jnp.sum(stats ** 2) * 1e-4

    g_sharded = jax.grad(loss, argnums=(0, 1, 2))(xs, w, b)
    g_single = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_sharded, g_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)
