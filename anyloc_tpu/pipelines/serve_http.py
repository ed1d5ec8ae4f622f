"""HTTP serving daemon — a dependency-light production surface.

The reference's end-user surfaces are offline scripts and hosted demo apps
(demo/anyloc_vlad_generate.py, the gradio/HF spaces); a TPU deployment wants
a long-lived process that keeps the compiled trunk + vocabulary (+ search
index) resident. This is that daemon on the stdlib only:

  GET  /health            -> {"status": "ok", ...config...}
  POST /describe  (image bytes: jpg/png)
       -> {"descriptor": [C*D floats]}
  POST /search?k=5  (image bytes)
       -> {"ids": [...], "scores": [...]}   (against the loaded database)

Run:
  python -m anyloc_tpu serve --model dinov2_vitg14 --layer 31 \
      --vocab-dir cache/vocabulary/dinov2_vitg14/l31_value_c32/indoor \
      --db db_vlads.npy --quant int8_full --port 8080

The first request pays the jit compile (persistent-cached across restarts);
shapes are bucketed by the demo preprocessing (center-crop to the patch
grid), so repeat resolutions hit the compiled program. Requests are served
sequentially (batch-1) — front a load balancer and scale with dp
(parallel/) for fleet throughput.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Service:
    """Extractor + vocabulary (+ optional database index), shared state."""

    def __init__(self, args) -> None:
        import jax.numpy as jnp

        from anyloc_tpu.models.extractor import DinoV2ExtractFeatures
        from anyloc_tpu.ops.vlad import VLAD

        self.jnp = jnp
        self.args = args
        self.extractor = DinoV2ExtractFeatures(
            args.model, args.layer, args.facet,
            checkpoint=args.checkpoint, quant=args.quant,
        )
        self.vlad = VLAD(args.num_clusters, cache_dir=args.vocab_dir)
        self.vlad.fit(None)  # load-only
        self.lock = threading.Lock()  # one device user at a time
        self.db = None
        self.db_dev = None
        self.index = None
        if args.db:
            self.db = np.load(args.db).astype(np.float32)
            if args.ivf:
                from anyloc_tpu.ops.ivf import ivf_fit

                self.index = ivf_fit(self.db, method="cosine")
            else:
                # device-resident once — the daemon's point is resident state
                self.db_dev = jnp.asarray(self.db)

    def describe(self, image_bytes: bytes) -> np.ndarray:
        from PIL import Image

        from anyloc_tpu.data.transforms import preprocess_image

        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        arr = preprocess_image(img, max_edge=self.args.max_img_size,
                               crop_multiple=14)
        with self.lock:
            descs = self.extractor(self.jnp.asarray(arr[None]))
            return np.asarray(self.vlad.aggregate(descs)[0])

    def search(self, image_bytes: bytes, k: int):
        if self.db is None:  # check BEFORE paying a trunk forward
            raise ValueError("no database loaded (--db)")
        gd = self.describe(image_bytes)
        with self.lock:
            if self.index is not None:
                s, i = self.index.search(gd[None], k,
                                         n_probe=self.args.n_probe)
            else:
                from anyloc_tpu.ops.retrieval import top_k_search

                s, i = top_k_search(
                    self.db_dev, self.jnp.asarray(gd[None]),
                    min(k, self.db.shape[0]))
        return np.asarray(s)[0], np.asarray(i)[0]


def make_handler(svc: _Service):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet by default
            pass

        def do_GET(self):
            if self.path.split("?")[0] == "/health":
                self._reply(200, {
                    "status": "ok",
                    "model": svc.args.model,
                    "layer": svc.args.layer,
                    "facet": svc.args.facet,
                    "clusters": svc.args.num_clusters,
                    "quant": svc.args.quant,
                    "db_rows": 0 if svc.db is None else int(svc.db.shape[0]),
                    "engine": "ivf" if svc.index is not None else "device",
                })
            else:
                self._reply(404, {"error": "unknown path"})

        MAX_BODY = 64 * 1024 * 1024  # one image; a daemon must not OOM

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > self.MAX_BODY:
                    self._reply(413, {"error": f"body too large ({n} bytes)"})
                    return
                data = self.rfile.read(n)
                path, _, query = self.path.partition("?")
                if path == "/describe":
                    gd = svc.describe(data)
                    self._reply(200, {"descriptor": gd.tolist()})
                elif path == "/search":
                    k = 5
                    for part in query.split("&"):
                        if part.startswith("k="):
                            k = max(1, int(part[2:]))
                    s, i = svc.search(data, k)
                    self._reply(200, {"ids": i.tolist(),
                                      "scores": s.tolist()})
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # surface errors as JSON, keep serving
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def build_server(args) -> ThreadingHTTPServer:
    svc = _Service(args)
    return ThreadingHTTPServer((args.host, args.port), make_handler(svc))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="dinov2_vitg14")
    p.add_argument("--layer", type=int, default=31)
    p.add_argument("--facet", default="value")
    p.add_argument("--num-clusters", type=int, default=32)
    p.add_argument("--vocab-dir", required=True,
                   help="directory holding c_centers.npz (demo cache layout)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--quant", default=None,
                   choices=["int8", "int8_fused", "int8_full"])
    p.add_argument("--max-img-size", type=int, default=640)
    p.add_argument("--db", default=None,
                   help=".npy of database descriptors enabling /search")
    p.add_argument("--ivf", action="store_true",
                   help="serve /search through the IVF index (large dbs)")
    p.add_argument("--n-probe", type=int, default=8)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)

    server = build_server(args)
    print(f"serving on http://{args.host}:{args.port} "
          f"(/health /describe /search)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
