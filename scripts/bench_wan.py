"""WAN causal-3D VAE throughput: frames/sec for video encode+decode.

The Qwen/WAN third-party wrappers (models/wan.py; reference
`pit/models/autoencoder.py:25-59`) are the framework's video path.  Both
the whole-clip jit path and the diffusers-exact chunked streaming path
are timed (random weights — the real checkpoints are hub assets).

  T=17 HW=256 python scripts/bench_wan.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models.wan import AutoencoderKLWan

T = int(os.environ.get("T", "17"))        # 1 + 4k frames
HW = int(os.environ.get("HW", "256"))

vae = AutoencoderKLWan()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, T, HW, HW, 3)) * 0.3, jnp.float32)


def timeit(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


enc = lambda: vae.encode(x).mean
t_enc = timeit(lambda: enc())
z = enc()
t_dec = timeit(lambda: vae.decode(z))
t_enc_c = timeit(lambda: vae.encode_chunked(x).mean)
zc = vae.encode_chunked(x).mean
t_dec_c = timeit(lambda: vae.decode_chunked(zc))

print(
    f"wan {T}f {HW}px: encode {t_enc*1e3:.1f} ms ({T/t_enc:.1f} f/s), "
    f"decode {t_dec*1e3:.1f} ms ({T/t_dec:.1f} f/s); chunked streaming "
    f"encode {t_enc_c*1e3:.1f} ms, decode {t_dec_c*1e3:.1f} ms"
)
