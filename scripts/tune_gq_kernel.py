"""Sweep GQ Pallas block sizes at the production search shape; run when the
TPU tunnel is up."""
import os, sys, time, itertools, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vqvae_from_gaussian_vae_tpu.ops.codebook import prior_samples
from vqvae_from_gaussian_vae_tpu.ops.gq_search import score_operands
from vqvae_from_gaussian_vae_tpu.ops.gq_pallas import gq_argmax_pallas

rng = np.random.default_rng(0)
R, G, N = 16384, 16, 65536   # bs=16 eval shape
mu = rng.standard_normal((R, G)).astype(np.float32)
std = np.exp(0.5*np.clip(rng.standard_normal((R, G)), -3, 1)).astype(np.float32)
cb = prior_samples(N, G, 42)
a, b = score_operands(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(cb), 1.0)
a, b = jax.device_put(a), jax.device_put(b)

ref = None
results = []
for br, bn, sn in itertools.product((128, 256, 512, 1024),
                                    (2048, 4096, 8192),
                                    (2048, 4096, 8192)):
    if sn > bn:
        continue
    try:
        f = jax.jit(lambda a, b: gq_argmax_pallas(a, b, block_r=br,
                                                  block_n=bn, sub_n=sn))
        idx = np.asarray(f(a, b))
        if ref is None: ref = idx
        assert (idx == ref).all(), (br, bn, sn, "mismatch")
        t0 = time.perf_counter()
        acc = None
        for i in range(20):
            acc = f(a, b)
        _ = np.asarray(acc)[:1]
        dt = (time.perf_counter()-t0)/20
        results.append((dt, br, bn, sn))
        print(f"block_r={br:5d} block_n={bn:5d} sub_n={sn:5d}: {dt*1e3:7.2f} ms  ({2*R*2*G*N/dt/1e12:.1f} TF/s-eq)")
    except Exception as e:
        print(f"block_r={br} block_n={bn} sub_n={sn}: FAILED {type(e).__name__} {str(e)[:80]}")
results.sort()
print("BEST:", results[0])
