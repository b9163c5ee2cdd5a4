"""FLUX MMDiT forward throughput: packed flash attention vs einsum SDPA.

The AutoencodingFluxEngine's dequant path (reference
`pit/models/autoencoder.py:758-784`) runs this transformer 25+ times per
image; its attention is the framework's largest-L softmax workload
(L = img tokens + txt tokens, 24 heads, D=128 — MXU-ideal contraction).
flux-dev itself (19 double + 38 single blocks, 12B params) exceeds one
v5e's HBM, so the bench runs a depth-reduced model at full width and
sequence — per-block cost is depth-independent, so the speedup transfers.

  DEPTH=2 SINGLE=4 L_IMG=1024 L_TXT=512 B=1 python scripts/bench_flux.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_from_gaussian_vae_tpu.models import flux as F
from vqvae_from_gaussian_vae_tpu.utils import flops as FL

B = int(os.environ.get("B", "1"))
DEPTH = int(os.environ.get("DEPTH", "2"))
SINGLE = int(os.environ.get("SINGLE", "4"))
L_IMG = int(os.environ.get("L_IMG", "1024"))  # 512px: (512/8/2)^2
L_TXT = int(os.environ.get("L_TXT", "512"))

params_cfg = F.flux_dev_params(depth=DEPTH, depth_single_blocks=SINGLE)
model = F.Flux(params_cfg, remat=False)

side = int(np.sqrt(L_IMG))
assert side * side == L_IMG
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((B, L_IMG, 64)), jnp.bfloat16)
img_ids = F.make_img_ids(2 * side, 2 * side, B)
txt = jnp.asarray(rng.standard_normal((B, L_TXT, 4096)), jnp.bfloat16)
txt_ids = jnp.zeros((B, L_TXT, 3))
t = jnp.full((B,), 0.5)
y = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
g = jnp.full((B,), 4.0)

variables = model.init(jax.random.PRNGKey(0), img, img_ids, txt, txt_ids,
                       t, y, None, g)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables["params"])
n_params = sum(x.size for x in jax.tree.leaves(params))


def run(label):
    # the flash/einsum switch is read at trace time; a fresh jit per label
    def fwd(p, img, txt):
        return model.apply({"params": p}, img, img_ids, txt, txt_ids,
                           t, y, None, g)

    fn = jax.jit(fwd)
    np.asarray(fn(params, img, txt))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(10):
            acc = acc + jnp.float32(fn(params, img, txt)[0, 0, 0])
        np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / 10)
    return best


os.environ["GVQ_DISABLE_FUSED_KERNELS"] = "1"
t_einsum = run("einsum")
os.environ["GVQ_DISABLE_FUSED_KERNELS"] = "0"
t_flash = run("flash")

fl = B * FL.flux_mmdit_flops(L_IMG, L_TXT, params_cfg.hidden_size,
                             DEPTH, SINGLE, params_cfg.mlp_ratio)
peak = FL.TPU_PEAKS["v5e_bf16"]
print(
    f"flux fwd B={B} L={L_IMG}+{L_TXT} depth={DEPTH}+{SINGLE} "
    f"({n_params/1e9:.2f}B params): einsum {t_einsum*1e3:.2f} ms "
    f"({fl/t_einsum/peak:.3f} of roofline) -> flash {t_flash*1e3:.2f} ms "
    f"({fl/t_flash/peak:.3f}), {t_einsum/t_flash:.2f}x"
)
