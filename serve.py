#!/usr/bin/env python
"""Tokenizer serving daemon.

The reference stops at research harnesses (SURVEY.md L6: "no serving
layer"); production deployment needs one.  A dependency-free HTTP service
over the engine's jitted encode/dequant paths with request micro-batching:
concurrent requests landing within ``batch_window_ms`` are fused into one
device batch (shapes are static per image_size, so everything stays on the
compiled fast path).

    python serve.py --base configs/sd3unet_gq_0.25.yaml --ckpt model.msgpack \
        --port 8500 --batch_window_ms 5

API (JSON unless noted):
  GET  /healthz            -> {"status": "ok", "model": ..., "devices": N}
  POST /tokenize           body: raw PNG/JPEG bytes
                           -> {"indices": [[...]], "shape": [h, w, ng]}
  POST /detokenize         body: {"indices": [...], "shape": [h, w, ng]}
                           -> raw PNG bytes of the reconstruction
  POST /reconstruct        body: raw PNG/JPEG bytes -> raw PNG bytes
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class TokenizerService:
    """Micro-batching front of the jitted encode/dequant functions."""

    def __init__(self, engine, image_size: int, max_batch: int = 8,
                 batch_window_ms: float = 5.0):
        self.engine = engine
        self.image_size = image_size
        self.max_batch = max_batch
        self.window = batch_window_ms / 1e3
        # one pending list per op kind: mixed tokenize/detokenize traffic
        # batches independently (a single FIFO would flush a batch at every
        # op change — measured 14 round-trips/s vs 100+ with per-kind lists
        # under 16 interleaved clients)
        self._cv = threading.Condition()
        self._pending = {"tokenize": [], "detokenize": []}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -------------------------------------------------------------- public

    def tokenize(self, img: np.ndarray) -> np.ndarray:
        return self._submit(("tokenize", img))

    def detokenize(self, indices: np.ndarray) -> np.ndarray:
        return self._submit(("detokenize", indices))

    # ------------------------------------------------------------ batching

    def _submit(self, item):
        done = threading.Event()
        box = {}
        with self._cv:
            self._pending[item[0]].append((item, box, done))
            self._cv.notify()
        done.wait()
        if "error" in box:
            raise RuntimeError(box["error"])
        return box["result"]

    def _drain(self):
        """Pick the op kind with the deepest backlog, wait up to the batch
        window for it to fill, then take up to max_batch requests."""
        with self._cv:
            while not any(self._pending.values()):
                self._cv.wait()
            kind = max(self._pending, key=lambda k: len(self._pending[k]))
        deadline = time.perf_counter() + self.window
        while True:
            with self._cv:
                if len(self._pending[kind]) >= self.max_batch:
                    break
            if time.perf_counter() >= deadline:
                break
            time.sleep(0.0005)
        with self._cv:
            batch = self._pending[kind][: self.max_batch]
            del self._pending[kind][: len(batch)]
        return kind, batch

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        """Next power-of-two batch bucket: drained batches are padded to a
        bucket so the device only ever sees log2(max_batch)+1 static
        shapes — one compile per bucket instead of one per batch size."""
        b = 1
        while b < n:
            b *= 2
        return min(b, max(cap, n))

    def _run(self):
        import jax.numpy as jnp

        while True:
            kind, batch = self._drain()
            if not batch:  # raced with another drain pass
                continue
            try:
                arrays = np.stack([item[0][1] for item in batch])
                n = arrays.shape[0]
                bucket = self._bucket(n, self.max_batch)
                if bucket != n:
                    fill = np.repeat(arrays[-1:], bucket - n, axis=0)
                    arrays = np.concatenate([arrays, fill], axis=0)
                if kind == "tokenize":
                    _, indices = self.engine.quant(jnp.asarray(arrays))
                    out = np.asarray(indices)
                else:
                    out = np.asarray(self.engine.dequant(jnp.asarray(arrays)))
                for i, (_, box, done) in enumerate(batch):
                    box["result"] = out[i]
                    done.set()
            except Exception as e:  # pragma: no cover - defensive
                for _, box, done in batch:
                    box["error"] = repr(e)
                    done.set()


def make_handler(service: TokenizerService, model_name: str):
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _png(self, arr: np.ndarray):
            u8 = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(u8).save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_image(self) -> np.ndarray:
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            img = Image.open(io.BytesIO(data)).convert("RGB")
            s = service.image_size
            w, h = img.size
            scale = s / min(w, h)
            img = img.resize((max(s, round(w * scale)), max(s, round(h * scale))),
                             Image.BILINEAR)
            left = (img.size[0] - s) // 2
            top = (img.size[1] - s) // 2
            img = img.crop((left, top, left + s, top + s))
            return np.asarray(img, np.float32) / 127.5 - 1.0

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(200, {"status": "ok", "model": model_name,
                                 "devices": len(jax.devices())})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                if self.path == "/tokenize":
                    idx = service.tokenize(self._read_image())
                    self._json(200, {"indices": idx.reshape(-1).tolist(),
                                     "shape": list(idx.shape)})
                elif self.path == "/detokenize":
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    idx = np.asarray(req["indices"], np.int32).reshape(req["shape"])
                    self._png(service.detokenize(idx))
                elif self.path == "/reconstruct":
                    idx = service.tokenize(self._read_image())
                    self._png(service.detokenize(idx))
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as e:
                self._json(500, {"error": repr(e)})

    return Handler


def build_service(base: str, ckpt: str = "", image_size: int = 256,
                  max_batch: int = 8, batch_window_ms: float = 5.0,
                  overrides=()):
    import jax

    from vqvae_from_gaussian_vae_tpu import instantiate_from_config
    from vqvae_from_gaussian_vae_tpu.utils.config import load_config

    cfg = load_config(base, dotlist=overrides)
    cfg["model"]["params"]["loss_config"] = None
    cfg["model"]["params"].pop("ckpt_path", None)
    engine = instantiate_from_config(cfg["model"])
    engine.init_params(jax.random.PRNGKey(0))
    if ckpt:
        engine.load_checkpoint(ckpt)
    service = TokenizerService(engine, image_size, max_batch, batch_window_ms)
    return service, os.path.basename(base)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    args, unknown = p.parse_known_args()

    service, name = build_service(args.base, args.ckpt, args.img_size,
                                  args.max_batch, args.batch_window_ms,
                                  overrides=[u for u in unknown if "=" in u])
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service, name))
    print(f"serving {name} on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
