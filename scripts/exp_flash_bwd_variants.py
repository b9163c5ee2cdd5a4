#!/usr/bin/env python
"""Microbench: flash BWD kernel tilings at the bsqvit shape.

The shipped backward picks its (heads-per-block, block_q) by a VMEM
budget search (ops/flash_blc.py:_bwd_impl) that walks groups widest
first; with the 2-deep pipeline's extra live tile the search lands on
hpb=6/bq=128 and never *tries* hpb=4/bq=256 or hpb=2/bq=512.  This lab
times explicit (hpb, bq, pipe) combos of the SAME kernel body on random
data and parity-checks dq/dk/dv against the einsum VJP, so the shipped
search can be re-pinned on measurements rather than the estimate.

Run on the idle chip:
    python scripts/exp_flash_bwd_variants.py            # default combos
    python scripts/exp_flash_bwd_variants.py 6:128:2 4:256:2 2:512:2

ROUND-4 RESULTS (v5e, B=16 L=1024 H=12 D=64 bf16, us/layer, best of 3;
standalone numbers carry ~16% chain-serialization overhead vs in vivo):

    hpb= 6 bq= 128 p2:  1915.5     hpb= 2 bq= 512 p2:  1905.2
    hpb= 6 bq= 128 p1:  1973.8     hpb= 6 bq= 256 p1:  1810.6
    hpb= 4 bq= 256 p2:  1830.5     hpb= 4 bq= 128 p2:  1936.6
    hpb= 4 bq= 256 p1:  1846.8     hpb= 2 bq= 256 p2:  1936.1

Standalone and in-vivo DISAGREE on the top pick ((6,256,p1) standalone
vs (4,256,p2) in bench_train: ae 196.2 ms vs 199.9) — the shipped
search is pinned on the in-vivo order: bq=256 first, then widest group,
2-deep pipeline (ops/flash_blc.py:_bwd_impl).  Always arbitrate tiling
changes with bench_train, not this lab alone.
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


def _control_kernel(q_ref, k_ref, v_ref, o_ref, z_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, dk_scratch, dv_scratch,
                    *, sm_scale, heads, num_q_blocks, pipe_depth=2):
    """matonly-style bwd control: the SAME five matmuls and DMAs as the
    real kernel, with the softmax recompute (exp, z read-combine, di,
    ds elementwise) deleted — the kernel-structure floor.  Wrong math by
    construction; timing only."""
    import collections

    from jax import lax
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, dk_scratch.dtype)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, dv_scratch.dtype)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    d = q.shape[-1] // heads

    def _probs_ds(h):
        sl = slice(h * d, (h + 1) * d)
        s = lax.dot_general(q[:, sl], k[:, sl], F._TRANS_B,
                            preferred_element_type=jnp.float32)
        dp = lax.dot_general(do[:, sl], v[:, sl], F._TRANS_B,
                             preferred_element_type=jnp.float32)
        return s.astype(do.dtype), dp.astype(q.dtype)

    def _emit(h, pb, dsb):
        sl = slice(h * d, (h + 1) * d)
        dv_scratch[:, sl] += lax.dot_general(
            pb, do[:, sl], F._TRANS_A, preferred_element_type=jnp.float32)
        dk_scratch[:, sl] += lax.dot_general(
            dsb, q[:, sl], F._TRANS_A, preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = lax.dot(
            dsb, k[:, sl], preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)

    depth = max(1, min(pipe_depth, heads - 1))
    buf = collections.deque((h, _probs_ds(h)) for h in range(depth))
    for h in range(depth, heads):
        cur = (h, _probs_ds(h))
        eh, pd = buf.popleft()
        _emit(eh, *pd)
        buf.append(cur)
    for eh, pd in buf:
        _emit(eh, *pd)

    @pl.when(q_idx == num_q_blocks - 1)
    def _flush():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def run(hpb, block_q, pipe_depth, control=False):
    c = H * D
    esize = 2
    fwd_hpb = F._fwd_hpb(L, H, D, esize)
    cg = hpb * D
    nq = L // block_q
    grid = (B, H // hpb, nq)

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        del qi
        return (bi, 0, gi)

    q_spec = pl.BlockSpec((1, block_q, cg), q_map)
    kv_spec = pl.BlockSpec((1, L, cg), kv_map)
    n_groups_fwd = H // fwd_hpb
    z_width = 128 * n_groups_fwd
    z_spec = pl.BlockSpec((1, block_q, z_width), lambda bi, gi, qi: (bi, qi, 0))

    if control:
        body = functools.partial(_control_kernel, sm_scale=SCALE, heads=hpb,
                                 num_q_blocks=nq, pipe_depth=pipe_depth)
    else:
        body = functools.partial(F._bwd_kernel, sm_scale=SCALE, heads=hpb,
                                 num_q_blocks=nq, num_groups=H // hpb,
                                 fwd_hpb=fwd_hpb, pipe_depth=pipe_depth)
    kernel = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, z_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            scratch_shapes=[
                pltpu.VMEM((L, cg), jnp.float32),
                pltpu.VMEM((L, cg), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, L, c), jnp.bfloat16)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        name=f"exp_flash_bwd_h{hpb}_bq{block_q}_p{pipe_depth}",
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    o, z = F._fwd_res_call(q, k, v, SCALE, H, False)

    LAYERS = int(os.environ.get("EXP_LAYERS", "8"))

    @jax.jit
    def chain(q, k, v, o, z, do):
        acc = jnp.float32(0)
        for i in range(LAYERS):
            dq, dk, dv = kernel(q, k, v, o, z, do)
            acc = acc + jnp.float32(dq[0, 0, 0]) + jnp.float32(dk[0, 0, 0]) \
                + jnp.float32(dv[0, 0, 0])
            do = (do + dq * 1e-6).astype(do.dtype)  # serialize layers
        return acc

    np.asarray(chain(q, k, v, o, z, do))
    best = float("inf")
    iters = 10
    for _ in range(3):
        t0 = time.perf_counter()
        a = jnp.float32(0)
        for _ in range(iters):
            a = a + chain(q, k, v, o, z, do)
        np.asarray(a)
        best = min(best, (time.perf_counter() - t0) / iters / LAYERS)

    if control:
        print(f"hpb={hpb:2d} bq={block_q:4d} p{pipe_depth} CONTROL(no-softmax):"
              f" {best*1e6:8.1f} us/layer", flush=True)
        return best
    # parity vs einsum VJP
    dq, dk, dv = kernel(q, k, v, o, z, do)
    rq, rk, rv = F._einsum_bwd(q, k, v, do, SCALE, H)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
              for a, b in ((dq, rq), (dk, rk), (dv, rv)))
    print(f"hpb={hpb:2d} bq={block_q:4d} p{pipe_depth}: {best*1e6:8.1f} us/layer"
          f"  max_err {err:.3e}", flush=True)
    return best


if __name__ == "__main__":
    combos = [(6, 128, 2), (6, 128, 1), (4, 256, 2), (4, 256, 1),
              (2, 512, 2), (6, 256, 1), (4, 128, 2), (2, 256, 2)]
    if len(sys.argv) > 1:
        combos = []
        for a in sys.argv[1:]:
            parts = a.split(":")
            combos.append((int(parts[0]), int(parts[1]), int(parts[2]),
                           len(parts) > 3 and parts[3] == "control"))
    for combo in combos:
        try:
            run(*combo)
        except Exception as e:
            print(f"{combo}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
