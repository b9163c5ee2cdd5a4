"""bsqvit_gq_0.25 e2e throughput: encode -> 2^16 quantize -> decode.

The second flagship backbone's bench (the headline bench.py covers
sd3unet).  BF16=1 enables bf16 compute in both transformers.  Measured
v5e bs=16 bf16: 294.0 img/s (54.4 ms) with the layout-native packed flash
kernel + tanh-GELU (docs/kernels.md round 2d); the head-major flash path
ran 189 img/s, and the einsum-softmax attention (full fp32 (B, H, L, L)
probability tensor, 805 MB/block) 130 img/s.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vqvae_from_gaussian_vae_tpu import instantiate_from_config
from vqvae_from_gaussian_vae_tpu.utils.config import load_config
from vqvae_from_gaussian_vae_tpu.utils import flops as F

B = int(os.environ.get("B", "16"))
cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "bsqvit_gq_0.25.yaml"))
cfg["model"]["params"]["loss_config"] = None
cfg["model"]["params"].pop("ckpt_path", None)
enc_p = cfg["model"]["params"]["encoder_config"]["params"]
dec_p = cfg["model"]["params"]["decoder_config"]["params"]
if os.environ.get("BF16"):
    enc_p["dtype"] = "bfloat16"
    if isinstance(dec_p, dict):
        dec_p["dtype"] = "bfloat16"
engine = instantiate_from_config(cfg["model"])
engine.init_params(jax.random.PRNGKey(0))
module = engine.module

def step(params, x, rng):
    z, reg_log = module.apply({"params": params}, x, return_reg_log=True,
                              train=False, method="encode", rngs={"sample": rng})
    xrec = module.apply({"params": params}, z, method="decode")
    return jnp.float32(jnp.sum(xrec[0, 0, 0])) + reg_log["indices"].reshape(-1)[0]

fn = jax.jit(step)
params = jax.tree.map(jnp.asarray, engine.params)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3), jnp.float32) * 2 - 1
rng = jax.random.PRNGKey(2)
np.asarray(fn(params, x, rng))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(30):
        acc = acc + fn(params, x, jax.random.fold_in(rng, i))
    np.asarray(acc)
    best = min(best, (time.perf_counter() - t0) / 30)

profile_dir = os.environ.get("BENCH_PROFILE")
if profile_dir:
    with jax.profiler.trace(profile_dir):
        acc = jnp.float32(0)
        for i in range(10):
            acc = acc + fn(params, x, jax.random.fold_in(rng, i))
        np.asarray(acc)
    print(f"trace ({10} steps) -> {profile_dir}", file=sys.stderr)

vit_cfg = dict(patch_size=8, image_size=256, width=enc_p.get("width", 768),
               layers=enc_p.get("layers", 12),
               z_channels=enc_p.get("z_channels", 16))
fl = (F.vit_flops(vit_cfg) + F.vit_decoder_flops(vit_cfg)
      + F.gq_search_flops(1024 * 1, 16, 65536))
print(f"bsqvit e2e bs={B}: {best*1e3:.2f} ms = {B/best:.1f} img/s; "
      f"~{fl/1e9:.0f} GF/img analytic -> roofline {197e12/fl:.0f} img/s "
      f"-> fraction {B/best/(197e12/fl):.3f}")
