#!/usr/bin/env python
"""Lab: can fusing LayerNorm into the consumer matmul's prologue beat the
shipped LN-kernel + XLA-matmul pair?  (VERDICT r4 #7.)

The shipped path (ops/layer_norm.py + XLA dot) costs one LN kernel at the
HBM bandwidth floor (~86 us at the bsqvit shape) plus a matmul at 93-96%
of MXU peak; the normalized activation is written to HBM and re-read by
the matmul.  A fused Pallas kernel reads x once, normalizes in VMEM, and
feeds the MXU directly — eliminating the write + re-read (~61 us/site)
IF its matmul throughput matches XLA's.  This lab prices exactly that:

  variants (bsqvit QKV shape (16384, 768) @ (768, 2304) bf16):
    xla       LN Pallas kernel + XLA dot (the shipped pair, baseline)
    pmm       LN Pallas kernel + Pallas matmul (prices Pallas-vs-XLA dot)
    fused     one Pallas kernel: LN prologue + matmul
    fused_cfc same, at the MLP c_fc shape (768 -> 3072)

Run on the idle chip:  python scripts/exp_ln_matmul.py [variant ...]
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

R, C = 16384, 768
EPS = 1e-5


def _ln_ref(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + EPS) * g + b).astype(x.dtype)


def _fused_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    xn = (xc * rstd * g + b).astype(w_ref.dtype)
    acc = jax.lax.dot(xn, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + wb_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _mm_kernel(x_ref, w_ref, wb_ref, o_ref):
    acc = jax.lax.dot(x_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    o_ref[...] = (acc + wb_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pallas_fused(x, g, b, w, wb, bm):
    r, c = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        _fused_kernel,
        grid=(r // bm,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0)),
                  pl.BlockSpec((c, n), lambda i: (0, 0)),
                  pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        name=f"exp_ln_mm_fused_bm{bm}",
    )(x, g.reshape(1, c), b.reshape(1, c), w, wb.reshape(1, n))


def _pallas_mm(x, w, wb, bm):
    r, c = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        _mm_kernel,
        grid=(r // bm,),
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0)),
                  pl.BlockSpec((c, n), lambda i: (0, 0)),
                  pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        name=f"exp_mm_bm{bm}",
    )(x, w, wb.reshape(1, n))


def run(variant, bm=512, n=2304):
    from vqvae_from_gaussian_vae_tpu.ops.layer_norm import layer_norm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(C), jnp.float32)
    b = jnp.asarray(rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, n)) * 0.02, jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)

    if variant == "xla":
        def site(x):
            y = layer_norm(x, g, b, EPS)
            return (y @ w + wb.astype(jnp.float32)).astype(x.dtype)
    elif variant == "pmm":
        def site(x):
            y = layer_norm(x, g, b, EPS)
            return _pallas_mm(y, w, wb, bm)
    elif variant == "fused":
        def site(x):
            return _pallas_fused(x, g, b, w, wb, bm)
    else:
        raise ValueError(variant)

    LAYERS = int(os.environ.get("EXP_LAYERS", "12"))

    @jax.jit
    def chain(x):
        acc = jnp.float32(0)
        for i in range(LAYERS):
            y = site(x)
            acc = acc + jnp.float32(y[0, 0])
            # feed a C-wide slice back so layers serialize
            x = (x + y[:, :C] * 1e-6).astype(x.dtype)
        return acc

    np.asarray(chain(x))
    best = float("inf")
    iters = 10
    for _ in range(3):
        t0 = time.perf_counter()
        a = jnp.float32(0)
        for _ in range(iters):
            a = a + chain(x)
        np.asarray(a)
        best = min(best, (time.perf_counter() - t0) / iters / LAYERS)

    ref = (_ln_ref(x, g, b).astype(jnp.float32) @ w.astype(jnp.float32)
           + wb).astype(jnp.bfloat16)
    err = float(jnp.max(jnp.abs(site(x).astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"{variant:8s} bm={bm:4d} n={n:4d}: {best*1e6:8.1f} us/site  "
          f"max_err {err:.3e}", flush=True)
    return best


if __name__ == "__main__":
    combos = [("xla", 512, 2304), ("pmm", 512, 2304), ("fused", 512, 2304),
              ("fused", 256, 2304), ("fused", 1024, 2304),
              ("xla", 512, 3072), ("fused", 512, 3072)]
    if len(sys.argv) > 1:
        combos = []
        for a in sys.argv[1:]:
            parts = a.split(":")
            combos.append((parts[0], int(parts[1]) if len(parts) > 1 else 512,
                           int(parts[2]) if len(parts) > 2 else 2304))
    for v, bm, n in combos:
        try:
            run(v, bm, n)
        except Exception as e:
            print(f"{v} bm={bm} n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
