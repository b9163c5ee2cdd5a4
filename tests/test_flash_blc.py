"""Parity of ops/flash_blc.py (layout-native packed flash attention) vs
the einsum oracle: forward and all three input gradients, across head
counts (incl. the hpb=H fallback when no head group reaches 128 lanes).

The kernels run in Pallas interpret mode on CPU and as real Mosaic
kernels on TPU (same code path; `interpret` flag only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.flash_blc import (
    flash_attention_blc, flash_attention_qkv)

INTERPRET = jax.default_backend() == "cpu"


def _einsum_ref(q, k, v, num_heads):
    b, l, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, l, num_heads, d)
    kh = k.reshape(b, l, num_heads, d)
    vh = v.reshape(b, l, num_heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32) * d**-0.5
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, l, c)


def _inputs(b, l, c, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return [jax.random.normal(k, (b, l, c), dtype) for k in ks]


@pytest.mark.parametrize(
    "b,l,h,d",
    [
        (2, 256, 4, 64),    # hpb=2 head groups
        (1, 384, 12, 64),   # L = 3*128, 6 groups
        (2, 256, 1, 128),   # hpb=1 (single head, lane-aligned)
        (1, 256, 3, 64),    # no 128-lane group divides H=3 -> hpb=H fallback
    ],
)
def test_forward_matches_einsum(b, l, h, d):
    q, k, v = _inputs(b, l, h * d)
    sm = d**-0.5
    out = flash_attention_blc(q, k, v, sm, h, INTERPRET)
    ref = _einsum_ref(q, k, v, h)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_gradients_match_einsum():
    b, l, h, d = 2, 256, 4, 64
    q, k, v = _inputs(b, l, h * d)
    sm = d**-0.5

    def loss(f):
        return lambda q, k, v: (f(q, k, v).astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(loss(lambda q, k, v: _einsum_ref(q, k, v, h)),
                     argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(
        loss(lambda q, k, v: flash_attention_blc(q, k, v, sm, h, INTERPRET)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))
        assert err / scale < 2e-2, f"d{name}: rel err {err / scale}"


def test_pipe_depth_2_matches_einsum():
    """The bwd's 2-deep head pipeline (the shipped default after the
    round-4 measurement; the fwd's 2-deep variant measured slower and was
    deleted) only reorders instructions — fwd output and all three
    gradients must match the einsum reference.  h=12 -> bwd hpb >= 3
    exercises the depth-2 branch; h=2 below covers the depth-1 fallback."""
    b, l, h, d = 2, 256, 12, 64
    q, k, v = _inputs(b, l, h * d)
    sm = d**-0.5
    out = flash_attention_blc(q, k, v, sm, h, INTERPRET)
    ref = _einsum_ref(q, k, v, h)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)

    def loss(f):
        return lambda q, k, v: (f(q, k, v).astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(loss(lambda q, k, v: _einsum_ref(q, k, v, h)),
                     argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(
        loss(lambda q, k, v: flash_attention_blc(q, k, v, sm, h, INTERPRET)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))
        assert err / scale < 2e-2, f"d{name}: rel err {err / scale}"


def test_bwd_depth1_fallback_matches_einsum():
    """hpb=2 (< 3 heads per block) takes the bwd's depth-1 loop."""
    b, l, h, d = 2, 256, 2, 64
    q, k, v = _inputs(b, l, h * d)
    sm = d**-0.5

    def loss(f):
        return lambda q, k, v: (f(q, k, v).astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(loss(lambda q, k, v: _einsum_ref(q, k, v, h)),
                     argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(
        loss(lambda q, k, v: flash_attention_blc(q, k, v, sm, h, INTERPRET)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip("qkv", g_ref, g_ker):
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))
        assert err / scale < 2e-2, f"d{name}: rel err {err / scale}"


@pytest.mark.parametrize(
    "b,l,h,d",
    [
        (2, 256, 4, 64),    # hpb=2 head groups -> non-trivial k/v offsets
        (1, 384, 12, 64),   # 6 groups
        (1, 256, 3, 64),    # hpb=H fallback
    ],
)
def test_packed_qkv_matches_split(b, l, h, d):
    """flash_attention_qkv on the packed (B, L, 3C) array == split +
    flash_attention_blc == the einsum oracle (fwd and dqkv)."""
    qkv = jax.random.normal(jax.random.PRNGKey(7), (b, l, 3 * h * d),
                            jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sm = d**-0.5
    out_p = flash_attention_qkv(qkv, sm, h, INTERPRET)
    out_s = flash_attention_blc(q, k, v, sm, h, INTERPRET)
    np.testing.assert_array_equal(np.asarray(out_p, np.float32),
                                  np.asarray(out_s, np.float32))
    ref = _einsum_ref(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    def loss(f):
        return lambda a: (f(a).astype(jnp.float32) ** 2).mean()

    g_p = jax.grad(loss(
        lambda a: flash_attention_qkv(a, sm, h, INTERPRET)))(qkv)
    g_ref = jax.grad(loss(lambda a: _einsum_ref(
        *jnp.split(a, 3, axis=-1), h)))(qkv)
    scale = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32)))) + 1e-9
    err = float(jnp.max(jnp.abs(
        g_p.astype(jnp.float32) - g_ref.astype(jnp.float32))))
    assert err / scale < 2e-2, f"dqkv rel err {err / scale}"


def test_packed_qkv_mesh_batch_sharding():
    """The packed entry shards over batch on a data mesh like the split
    entry (its own Shardy rule carries the 3C factor)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    b, l, h, d = 8, 256, 4, 64
    qkv = jax.random.normal(jax.random.PRNGKey(8), (b, l, 3 * h * d),
                            jnp.bfloat16)
    sm = d**-0.5
    fa = lambda a: flash_attention_qkv(a, sm, h, INTERPRET)
    single = jax.jit(fa)(qkv)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qs = jax.device_put(qkv, sh)
    with mesh:
        out = jax.jit(fa)(qs)
    assert out.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(single, np.float32))


def test_fp32_forward():
    """fp32 operands are the exact-parity path: the kernel forces
    full-precision MXU passes, so the oracle einsum must run at highest
    matmul precision too (on TPU the default truncates fp32 dots to one
    bf16 pass, which is what the bf16 speed path is for)."""
    b, l, h, d = 1, 256, 4, 64
    q, k, v = _inputs(b, l, h * d, jnp.float32)
    out = flash_attention_blc(q, k, v, d**-0.5, h, INTERPRET)
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda q, k, v: _einsum_ref(q, k, v, h))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_attention_module_flash_matches_einsum_fallback(monkeypatch):
    """MultiheadAttention's flash path (interpret mode off-TPU via
    GVQ_FLASH_INTERPRET) and its einsum fallback (flash=False) agree on
    the same params."""
    from vqvae_from_gaussian_vae_tpu.models.vit import MultiheadAttention

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 128))
    mod_flash = MultiheadAttention(d_model=128, n_head=2, flash=True)
    mod_plain = MultiheadAttention(d_model=128, n_head=2, flash=False)
    params = mod_flash.init(jax.random.PRNGKey(2), x)
    # param tree matches the nn.Dense layout the converters expect
    leaves = params["params"]
    assert set(leaves) == {"in_proj", "out_proj"}
    assert leaves["in_proj"]["kernel"].shape == (128, 384)
    assert leaves["out_proj"]["kernel"].shape == (128, 128)

    monkeypatch.setenv("GVQ_FLASH_INTERPRET", "1")
    # fp32 comparison: pin everything to full matmul precision so the
    # einsum branch matches the kernel's forced-HIGHEST fp32 path on TPU
    with jax.default_matmul_precision("highest"):
        out_flash = jax.jit(mod_flash.apply)(params, x)
        out_plain = jax.jit(mod_plain.apply)(params, x)
    assert out_flash.shape == x.shape
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_plain),
                               atol=2e-5)


def test_unet_attnblock_flash_matches_einsum(monkeypatch):
    """The UNet's single-head AttnBlock routes its bf16 SDPA through the
    packed flash kernel (n_head=1); parity vs the einsum branch."""
    from vqvae_from_gaussian_vae_tpu.models.unet import AttnBlock

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 128),
                          jnp.bfloat16)
    mod = AttnBlock(in_channels=128, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(4), x)

    monkeypatch.setenv("GVQ_DISABLE_FUSED_KERNELS", "1")
    ref = mod.apply(params, x)
    monkeypatch.delenv("GVQ_DISABLE_FUSED_KERNELS")
    monkeypatch.setenv("GVQ_FLASH_INTERPRET", "1")
    out = mod.apply(params, x)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_mesh_batch_sharding():
    """On a data mesh the kernel shards over batch with no collectives and
    matches the single-device result bit-exactly (grads included)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    b, l, h, d = 8, 256, 4, 64
    q, k, v = _inputs(b, l, h * d)
    sm = d**-0.5
    fa = lambda q, k, v: flash_attention_blc(q, k, v, sm, h, INTERPRET)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data", None, None))
    qs, ks_, vs = (jax.device_put(a, sh) for a in (q, k, v))
    single = jax.jit(fa)(q, k, v)
    with mesh:
        out = jax.jit(fa)(qs, ks_, vs)
        g = jax.jit(jax.grad(
            lambda q: (fa(q, ks_, vs).astype(jnp.float32) ** 2).mean()))(qs)
    assert out.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(single, np.float32))
    g1 = jax.jit(jax.grad(
        lambda q: (fa(q, k, v).astype(jnp.float32) ** 2).mean()))(q)
    np.testing.assert_array_equal(np.asarray(g, np.float32),
                                  np.asarray(g1, np.float32))
