"""Data-pipeline throughput: C++ native loader vs the Python threaded
loader (decode -> resize -> center-crop -> normalize, images/sec).

The training input pipeline must outrun the device step (headline
training consumes 16 img/step at ~80 img/s/chip per phase); this
measures both implementations on the same JPEG folder.

  N=256 SIZE=256 python scripts/bench_loader.py /path/to/images
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/imgbench"
SIZE = int(os.environ.get("SIZE", "256"))
BS = int(os.environ.get("BS", "16"))
WORKERS = int(os.environ.get("WORKERS", "8"))

fpaths = sorted(glob.glob(os.path.join(root, "*")))
assert fpaths, f"no images under {root}"


def sweep(loader, epochs=3):
    n, best = 0, float("inf")
    for _ in range(epochs):
        t0 = time.perf_counter()
        n = 0
        for batch in loader:
            n += batch["img"].shape[0]
        best = min(best, (time.perf_counter() - t0) / n)
    return 1.0 / best, n


from vqvae_from_gaussian_vae_tpu.data.native_loader import (NativeLoader,
                                                            native_available)
from vqvae_from_gaussian_vae_tpu.data.dataset import (SimpleDataset,
                                                      _PrefetchLoader)

py_loader = _PrefetchLoader(SimpleDataset(root, SIZE), batch_size=BS,
                            num_workers=WORKERS, shuffle=False,
                            drop_last=True)
py_rate, n = sweep(py_loader)
line = f"loader {len(fpaths)} jpegs -> {SIZE}px bs={BS} w={WORKERS}: python {py_rate:.0f} img/s"
if native_available():
    nat = NativeLoader(fpaths, SIZE, BS, shuffle=False,
                       num_workers=WORKERS, drop_last=True)
    nat_rate, _ = sweep(nat)
    line += f", native {nat_rate:.0f} img/s ({nat_rate/py_rate:.2f}x)"
print(line)
