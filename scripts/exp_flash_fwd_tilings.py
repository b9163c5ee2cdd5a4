#!/usr/bin/env python
"""Microbench: flash FWD kernel (real body, ops/flash_blc.py:_fwd_kernel)
at explicit (heads-per-block, block_q) tilings, bsqvit shape.

Round-5 motivation: killing the packed backward's dqkv concat needs a
group-interleaved QKV layout whose granularity the FORWARD must share —
i.e. the fwd would run at hpb=4 instead of the measured-fastest hpb=12.
This lab prices that constraint before any layout surgery.

    python scripts/exp_flash_fwd_tilings.py            # default combos
    python scripts/exp_flash_fwd_tilings.py 12:256 4:256 2:256
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_from_gaussian_vae_tpu.ops import flash_blc as F

B, L, H, D = 16, 1024, 12, 64
SCALE = D ** -0.5


def run(hpb, block_q):
    c = H * D
    cg = hpb * D
    grid = (B, H // hpb, L // block_q)

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        del qi
        return (bi, 0, gi)

    f = pl.pallas_call(
        functools.partial(F._fwd_kernel, sm_scale=SCALE, heads=hpb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec((1, block_q, cg), q_map),
                      pl.BlockSpec((1, L, cg), kv_map),
                      pl.BlockSpec((1, L, cg), kv_map)],
            out_specs=pl.BlockSpec((1, block_q, cg), q_map),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        name=f"exp_flash_fwd_h{hpb}_bq{block_q}",
    )
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    LAYERS = int(os.environ.get("EXP_LAYERS", "12"))

    @jax.jit
    def chain(q, k, v):
        for _ in range(LAYERS):
            q = f(q, k, v)
        return jnp.float32(jnp.sum(q[0, 0]))

    np.asarray(chain(q, k, v))
    best = float("inf")
    iters = 10
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = acc + chain(q, k, v)
        np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / iters / LAYERS)
    qh = q.reshape(B, L, H, D).astype(jnp.float32)
    kh = k.reshape(B, L, H, D).astype(jnp.float32)
    vh = v.reshape(B, L, H, D).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * SCALE
    ref = jnp.einsum("bhqk,bkhd->bqhd",
                     jax.nn.softmax(s, -1), vh).reshape(B, L, c)
    err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - ref)))
    print(f"hpb={hpb:2d} bq={block_q:4d}: {best*1e6:8.1f} us/layer  "
          f"max_err {err:.3e}", flush=True)
    return best


if __name__ == "__main__":
    combos = [(12, 256), (4, 256), (6, 256), (2, 256), (4, 512), (12, 512)]
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    for hpb, bq in combos:
        try:
            run(hpb, bq)
        except Exception as e:
            print(f"hpb={hpb} bq={bq}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
