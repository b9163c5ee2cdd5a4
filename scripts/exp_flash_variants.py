#!/usr/bin/env python
"""Microbench: flash fwd kernel VPU-diet variants at the bsqvit shape.

Round-3 hypothesis: with the head-pipelined fwd the steady state is
VPU-bound (per-head softmax ~0.86 us > 0.68 us matmul slot), so the lever
is VPU work per element.  Candidates:

  base      current _fwd_kernel (per-row max, exp, convert)
  nomax     drop the max-reduce pass; exp(s - C) with a static clamp
            shift (sum rides the matmul, normalization fixes the shift)
  exp2      exp2((s - m) * log2e) in case Mosaic's exp2 is cheaper
  tilemax   one scalar max per (bq, L) tile instead of per row
  matonly   CONTROL: no softmax at all — the kernel-structure floor
  chunk     split-L static-shift exp (finer MXU/VPU interleave)
  sbf16     bf16 score tile off the MXU

Each variant runs the full 12-head kernel at (B=16, L=1024, H=12, D=64)
bf16 and reports us/layer.  Run on the real chip:
    python scripts/exp_flash_variants.py base:1 matonly:1 nomax:1 ...

ROUND-4 RESULTS (v5e, idle chip, docs/kernels.md round 4):
  - `matonly` measures within noise of `base` — the softmax is ALREADY
    hidden behind the head pipeline at depth 1; there is no VPU meat
    left for the diet variants to win, and none of them beat base.
  - pipe depth 2 measured SLOWER than 1 (760.7 vs 825.9 us/layer):
    the extra live (bq, L) tile costs more scheduling slack than the
    wider VPU window buys.  The shipped kernel default is depth 1.
  - `sbf16` is illegal: Mosaic requires 32-bit matmul accumulators
    ('tpu.matmul' op Expected matmul acc to be 32-bit).
  - `chunk` crashed the TPU worker process on this stack (kernel
    fault) — excluded from the default combo list; investigate before
    ever shipping anything chunk-shaped.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, H, D = 16, 1024, 12, 64
BQ = 256
SCALE = D ** -0.5  # 1/8, pow2 -> folds into q
LOG2E = 1.4426950408889634


def make_kernel(variant, pipe_depth):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        d = q.shape[-1] // H
        pad = (-d) % 128
        ones = jnp.ones((k.shape[0], pad), v.dtype)

        def _probs(h):
            sl = slice(h * d, (h + 1) * d)
            qh = q[:, sl] * q.dtype.type(SCALE)
            if variant == "chunk":
                # two L-halves: exp of chunk 0 overlaps the QK^T matmul of
                # chunk 1 *within* the head (finer MXU/VPU interleave than
                # the cross-head pipeline alone); static clamp shift like
                # nomax so no cross-chunk max dependency
                half = k.shape[0] // 2
                ps = []
                for ci in range(2):
                    kc = k[ci * half:(ci + 1) * half, sl]
                    sc = lax.dot_general(qh, kc, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                    ps.append(jnp.exp(jnp.minimum(sc, 30.0) - 30.0)
                              .astype(v.dtype))
                return jnp.concatenate(ps, axis=1), None
            if variant == "sbf16":
                # bf16 score tile straight off the MXU: half the VPU read
                # bytes for max/exp at ~3 digits of score precision
                s = lax.dot_general(qh, k[:, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
                m = jnp.max(s, axis=1)[:, None]
                return jnp.exp((s - m).astype(jnp.float32)).astype(v.dtype), None
            s = lax.dot_general(qh, k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            if variant == "matonly":
                # control: NO softmax — measures the pure matmul+convert
                # floor of the kernel structure (output is garbage)
                return s.astype(v.dtype), None
            if variant == "nomax":
                # no reduce pass: shift by a static bound; rows clip only
                # if a score exceeds +30 (LN'd tokenizer scores are O(10))
                p = jnp.exp(jnp.minimum(s, 30.0) - 30.0)
                return p.astype(v.dtype), None
            if variant == "tilemax":
                m = jnp.max(s)
                p = jnp.exp(s - m)
                return p.astype(v.dtype), None
            m = jnp.max(s, axis=1)[:, None]
            if variant == "exp2":
                p = jnp.exp2((s - m) * LOG2E)
            else:
                p = jnp.exp(s - m)
            return p.astype(v.dtype), None

        def _emit(h, p, _aux):
            sl = slice(h * d, (h + 1) * d)
            vh = jnp.concatenate([v[:, sl], ones], axis=1)
            o = lax.dot(p, vh, preferred_element_type=jnp.float32)
            inv_sum = 1.0 / o[:, d:d + 1]
            o_ref[0, :, sl] = (o[:, :d] * inv_sum).astype(o_ref.dtype)

        import collections
        depth = min(pipe_depth, H - 1)
        buf = collections.deque(
            (h, _probs(h)) for h in range(depth))
        for h in range(depth, H):
            cur = (h, _probs(h))
            eh, (p, aux) = buf.popleft()
            _emit(eh, p, aux)
            buf.append(cur)
        for eh, (p, aux) in buf:
            _emit(eh, p, aux)

    return kernel


def run(variant, pipe_depth=2):
    kernel = make_kernel(variant, pipe_depth)
    grid = (B, 1, L // BQ)
    c = H * D

    def q_map(bi, gi, qi):
        return (bi, qi, gi)

    def kv_map(bi, gi, qi):
        return (bi, 0, gi)

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec((1, BQ, c), q_map),
                      pl.BlockSpec((1, L, c), kv_map),
                      pl.BlockSpec((1, L, c), kv_map)],
            out_specs=pl.BlockSpec((1, BQ, c), q_map),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        name=f"exp_flash_{variant}_p{pipe_depth}",
    )
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, c)), jnp.bfloat16)

    # chain LAYERS applications inside one jit so per-call dispatch noise
    # (0.5+ ms over the tunnel) amortizes away; q feeds forward like a
    # residual stream
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
    # numeric check vs einsum reference
    qh = q.reshape(B, L, H, D).astype(jnp.float32)
    kh = k.reshape(B, L, H, D).astype(jnp.float32)
    vh = v.reshape(B, L, H, D).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * SCALE
    ref = jnp.einsum("bhqk,bkhd->bqhd",
                     jax.nn.softmax(s, -1), vh).reshape(B, L, c)
    err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - ref)))
    print(f"{variant:8s} p{pipe_depth}: {best*1e6:8.1f} us/layer  "
          f"max_err {err:.3e}", flush=True)
    return best


if __name__ == "__main__":
    import sys as _sys
    # default combo set: safe variants only (chunk crashes the TPU worker,
    # sbf16 fails Mosaic verification — see module docstring)
    combos = [("base", 1), ("matonly", 1), ("nomax", 1), ("exp2", 1),
              ("tilemax", 1), ("base", 2)]
    if len(_sys.argv) > 1:
        combos = [(v, int(p)) for v, p in
                  (a.rsplit(":", 1) for a in _sys.argv[1:])]
    for v, p in combos:
        run(v, p)
