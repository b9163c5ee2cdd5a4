"""Parity of ops/flash_attention.py (lean-dq VJP rebind) vs the stock
pallas flash attention and the einsum oracle.

The Pallas TPU kernels have no CPU interpret path in the upstream module,
so the kernel-vs-kernel checks only run on real TPU; the CPU job covers
the wrapper's tracing (shapes/dtypes) via eval_shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_from_gaussian_vae_tpu.ops.flash_attention import (
    BlockSizes, flash_attention)

B, H, L, D = 2, 4, 512, 64


def _inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return [jax.random.normal(k, (B, H, L, D), jnp.bfloat16) for k in ks]


def _blocks():
    return BlockSizes(
        block_q=256, block_k_major=512, block_k=512, block_b=1,
        block_q_major_dkv=256, block_k_major_dkv=512,
        block_k_dkv=512, block_q_dkv=256,
        block_k_major_dq=512, block_k_dq=512, block_q_dq=256,
    )


def test_lean_flash_traces():
    q, k, v, _ = _inputs()
    out = jax.eval_shape(lambda q, k, v: flash_attention(q, k, v, D ** -0.5,
                                                         _blocks()), q, k, v)
    assert out.shape == (B, H, L, D) and out.dtype == jnp.bfloat16


@pytest.mark.skipif(jax.default_backend() in ("cpu",),
                    reason="Pallas TPU kernels need a TPU backend")
def test_lean_flash_matches_upstream_and_einsum():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as upstream)

    q, k, v, do = _inputs()
    sm = D ** -0.5
    bs = _blocks()
    # the STOCK upstream kernel has no precision guard: under the on-chip
    # suite's jax_default_matmul_precision=highest pin its bf16 dots
    # lower to fp32-contract tpu.matmuls Mosaic rejects — trace the
    # oracle at default precision (ours guards internally, _prec_guard)
    with jax.default_matmul_precision("default"):
        o_up, vjp_up = jax.vjp(
            lambda q, k, v: upstream(q, k, v, causal=False, sm_scale=sm,
                                     block_sizes=bs), q, k, v)
        grads_up = vjp_up(do)  # bwd traces here: keep it inside the guard
    o_ln, vjp_ln = jax.vjp(lambda q, k, v: flash_attention(q, k, v, sm, bs),
                           q, k, v)
    np.testing.assert_array_equal(np.asarray(o_up), np.asarray(o_ln))
    for a, b in zip(grads_up, vjp_ln(do)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm
    p = jax.nn.softmax(attn, -1).astype(v.dtype)
    o_ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    assert float(jnp.abs(o_ref.astype(jnp.float32)
                         - o_ln.astype(jnp.float32)).max()) < 2e-2
