"""HDiT velocity-net forward throughput: packed flash attention vs einsum.

The hourglass denoiser (models/hdit.py; the reference's dormant `poster`
net for AutoencodingPostEngine) runs shifted-window attention on the
outer levels and global attention at the bottleneck.  With window >= 16
the 256-token windows and the 1024-token bottleneck both route through
the packed flash kernel on the bf16 path.

  B=8 WIN=16 python scripts/bench_hdit.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models.hdit import create_hdit_model

B = int(os.environ.get("B", "8"))
WIN = int(os.environ.get("WIN", "16"))
IMG = int(os.environ.get("IMG", "256"))

model = create_hdit_model(patch_size=4, widths=(256, 512), depths=(2, 4),
                          heads=(4, 8), windows=(WIN, 0), dtype="bfloat16")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, IMG, IMG, 3)), jnp.bfloat16)
t = jnp.full((B,), 0.3, jnp.float32)
variables = model.init(jax.random.PRNGKey(0), x, t)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, variables["params"])


def run():
    def fwd(p, x, t):
        return model.apply({"params": p}, x, t)

    fn = jax.jit(fwd)
    np.asarray(fn(params, x, t))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(15):
            acc = acc + jnp.float32(fn(params, x, t)[0, 0, 0, 0])
        np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / 15)
    return best


os.environ["GVQ_DISABLE_FUSED_KERNELS"] = "1"
t_einsum = run()
os.environ["GVQ_DISABLE_FUSED_KERNELS"] = "0"
t_flash = run()
print(
    f"hdit fwd B={B} {IMG}px win={WIN}: einsum {t_einsum*1e3:.2f} ms "
    f"({B/t_einsum:.1f} img/s) -> flash {t_flash*1e3:.2f} ms "
    f"({B/t_flash:.1f} img/s), {t_einsum/t_flash:.2f}x"
)
