"""Serving load bench: concurrent tokenize/detokenize round-trips through
serve.py's micro-batching TokenizerService (in-process, no HTTP, so the
numbers are the service's own: queueing + batch padding + device time).

Reports steady-state request throughput and latency percentiles at a
given concurrency.  Batches drain into power-of-two buckets, so after
warmup the device sees only static shapes.

  C=16 N=200 python scripts/bench_serve.py
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from serve import build_service

C = int(os.environ.get("C", "16"))          # concurrent clients
N = int(os.environ.get("N", "200"))         # requests per client phase
BASE = os.environ.get("BASE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs", "sd3unet_gq_0.25.yaml"))

service, name = build_service(
    BASE, image_size=256, max_batch=16, batch_window_ms=5.0,
    overrides=["model.params.encoder_config.params.dtype=bfloat16"])

rng = np.random.default_rng(0)
img = (rng.standard_normal((256, 256, 3)) * 0.5).clip(-1, 1).astype(np.float32)

# warm every pow2 bucket (1..16) for both ops
for b in (1, 2, 4, 8, 16):
    t0 = time.perf_counter()
    ts = [threading.Thread(target=service.tokenize, args=(img,))
          for _ in range(b)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    print(f"warm tokenize bucket {b}: {time.perf_counter()-t0:.1f}s", flush=True)
idx = service.tokenize(img)
for b in (1, 2, 4, 8, 16):
    t0 = time.perf_counter()
    ts = [threading.Thread(target=service.detokenize, args=(idx,))
          for _ in range(b)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    print(f"warm detokenize bucket {b}: {time.perf_counter()-t0:.1f}s", flush=True)

lat = []
lock = threading.Lock()


def client():
    mine = []
    for _ in range(N):
        t0 = time.perf_counter()
        i = service.tokenize(img)
        service.detokenize(i)
        mine.append(time.perf_counter() - t0)
    with lock:
        lat.extend(mine)


t0 = time.perf_counter()
threads = [threading.Thread(target=client) for _ in range(C)]
[t.start() for t in threads]
[t.join() for t in threads]
wall = time.perf_counter() - t0

lat = np.sort(np.asarray(lat)) * 1e3
total = C * N
print(
    f"serve {os.path.basename(BASE)} C={C}: {total/wall:.1f} round-trips/s "
    f"(tokenize+detokenize, {total} reqs in {wall:.1f}s); latency ms "
    f"p50 {lat[int(0.50*len(lat))]:.1f} p90 {lat[int(0.90*len(lat))]:.1f} "
    f"p99 {lat[int(0.99*len(lat))]:.1f}"
)
