"""Serving daemon: HTTP round-trip (tokenize -> detokenize -> reconstruct)
against a tiny engine, including micro-batched concurrent requests."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

import serve as serve_mod

PKG = "vqvae_from_gaussian_vae_tpu"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = f"""
model:
  target: {PKG}.models.autoencoder.AutoencodingEngine
  params:
    input_key: img
    regularizer_config:
      target: {PKG}.quantization.gaussian.GaussianQuantRegularizer
      params: {{format: bchw, group: 4, n_samples: 256, seed: 7, backend: xla}}
    encoder_config:
      target: {PKG}.models.unet.Encoder
      params: &enc {{attn_type: vanilla, double_z: true, z_channels: 4,
        resolution: 32, in_channels: 3, out_ch: 3, ch: 32, ch_mult: [1, 2],
        num_res_blocks: 1, attn_resolutions: [], dropout: 0.0}}
    decoder_config:
      target: {PKG}.models.unet.Decoder
      params: *enc
"""
    path = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    path.write_text(cfg)
    service, name = serve_mod.build_service(str(path), image_size=32,
                                            batch_window_ms=20.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(service, name))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _png_bytes(seed=0, size=40):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(
        buf, format="PNG"
    )
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["devices"] >= 1


def test_tokenize_detokenize_roundtrip(server):
    req = urllib.request.Request(f"{server}/tokenize", data=_png_bytes(),
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req) as r:
        tok = json.loads(r.read())
    assert tok["shape"] == [16, 16, 1]
    assert all(0 <= i < 256 for i in tok["indices"])

    req = urllib.request.Request(
        f"{server}/detokenize",
        data=json.dumps(tok).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (32, 32)


def test_reconstruct_and_concurrent_batching(server):
    results = {}

    def hit(i):
        req = urllib.request.Request(f"{server}/reconstruct", data=_png_bytes(i),
                                     headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req) as r:
            results[i] = r.read()

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    for body in results.values():
        assert Image.open(io.BytesIO(body)).size == (32, 32)


def test_batch_buckets():
    b = serve_mod.TokenizerService._bucket
    assert [b(n, 8) for n in (1, 2, 3, 4, 5, 8)] == [1, 2, 4, 4, 8, 8]
    # a drain larger than max_batch (bounded by the queue, but defensive)
    assert b(9, 8) == 9


def test_padded_batch_matches_solo(server):
    """An odd-sized concurrent drain pads to the next bucket; each reply
    must still be that request's own tokens (identical to a solo call)."""
    png = _png_bytes(11)

    def tok(out, i):
        req = urllib.request.Request(f"{server}/tokenize", data=png,
                                     headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req) as r:
            out[i] = json.loads(r.read())

    solo = {}
    tok(solo, 0)
    out = {}
    threads = [threading.Thread(target=tok, args=(out, i)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(3):
        assert out[i]["indices"] == solo[0]["indices"]


def test_error_paths(server):
    # malformed image
    req = urllib.request.Request(f"{server}/tokenize", data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 500
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{server}/nope")
    assert exc.value.code == 404
