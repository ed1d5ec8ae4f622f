"""Serving daemon load test: batched dispatch vs batch-1 (run on the chip).

Measures end-to-end qps of pipelines/serve_http.py under N concurrent HTTP
clients, with request coalescing enabled (--max-batch 16) vs disabled
(--max-batch 1). The VERDICT round-2 bar: batched >= 3x batch-1.

  python tools/bench_serving.py --model dinov2_vits14 --layer 5
  python tools/bench_serving.py --model dinov2_vitg14 --layer 31 \
      --img-size 224 --quant int8_full --requests 128 --clients 32

Random-init weights (throughput only — serving math is weight-agnostic);
vocabulary + database are synthesized on the fly.
"""

import argparse
import io
import json
import pathlib
import sys
import tempfile
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_load(port: int, imgs, clients: int):
    def post(data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search?k=5", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    post(imgs[0])  # warm the compile outside the timed window
    t0 = time.perf_counter()
    with ThreadPoolExecutor(clients) as ex:
        outs = list(ex.map(post, imgs))
    dt = time.perf_counter() - t0
    assert all(len(o["ids"]) == 5 for o in outs)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    return len(imgs) / dt, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="dinov2_vits14")
    p.add_argument("--layer", type=int, default=5)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--quant", default=None)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--db-rows", type=int, default=10000)
    p.add_argument("--transfer-dtype", default="uint8",
                   choices=["float32", "uint8"])
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="coalescing window: how long the dispatcher waits "
                        "to fill a batch (round-5 lever: 5 ms realizes "
                        "~b8.6 under 32 clients; larger windows trade "
                        "latency for fuller batches)")
    p.add_argument("--single", type=int, default=None,
                   help="internal: run ONE config (this max_batch) and "
                        "print a JSON result line")
    args = p.parse_args()

    if args.single is None:
        # The DRIVER process must not touch the TPU: the axon tunnel is
        # single-client, so a parent holding the device deadlocks the
        # measuring subprocesses (observed: child stuck at backend init).
        # Vocabulary/db setup below runs jax — pin this process to CPU.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from anyloc_tpu.models import registry
    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    dim = registry.get(args.model).config().embed_dim
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    vdir = pathlib.Path(tmp) / "vocab"
    VLAD(32, cache_dir=str(vdir)).fit(
        rng.standard_normal((2000, dim)).astype(np.float32))
    db = rng.standard_normal((args.db_rows, 32 * dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    np.save(pathlib.Path(tmp) / "db.npy", db)

    imgs = []
    for _ in range(args.requests):
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((args.img_size, args.img_size, 3)) * 255
             ).astype(np.uint8)
        ).save(buf, format="JPEG")
        imgs.append(buf.getvalue())

    def serve_args(max_batch):
        return argparse.Namespace(
            model=args.model, layer=args.layer, facet="value",
            num_clusters=32, vocab_dir=str(vdir), checkpoint=None,
            quant=args.quant, max_img_size=args.img_size,
            img_size=args.img_size, max_batch=max_batch,
            batch_window_ms=args.batch_window_ms,
            db=str(pathlib.Path(tmp) / "db.npy"),
            ivf=False, n_probe=8, host="127.0.0.1", port=0, warm=True,
            transfer_dtype=args.transfer_dtype,
        )

    if args.single is not None:
        mb = args.single
        server = serve_http.build_server(serve_args(mb))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            qps, stats = run_load(port, imgs, args.clients)
        finally:
            server.shutdown()
        print(json.dumps({"max_batch": mb, "qps": qps,
                          "mean_batch": stats["mean_batch"],
                          "batches": stats["batches"],
                          "stages": stats.get("stages", {})}))
        return

    # one subprocess per config: two resident ViT-G engines + databases in
    # one process exceed v5e HBM (measured: the second server's dispatcher
    # dies mid-compile and clients see connection resets)
    import subprocess

    results = {}
    for mb in (1, args.max_batch):
        cmd = [sys.executable, __file__, "--single", str(mb)]
        for flag in ("model", "layer", "img_size", "quant", "requests",
                     "clients", "max_batch", "db_rows", "transfer_dtype",
                     "batch_window_ms"):
            v = getattr(args, flag)
            if v is not None:
                cmd += [f"--{flag.replace('_', '-')}", str(v)]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600)
        last = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not last:
            print(out.stdout, out.stderr, sep="\n")
            raise RuntimeError(f"single run max_batch={mb} failed")
        r = json.loads(last[-1])
        results[mb] = r["qps"]
        print(f"max_batch={mb:>3}: {r['qps']:7.1f} qps  "
              f"(mean realized batch {r['mean_batch']:.1f} over "
              f"{r['batches']} batches)")
        if r.get("stages"):
            # latency budget: per-request stages read directly; per-GROUP
            # stages (stack/enqueue/device_sync) amortize over the realized
            # batch — together they attribute the end-to-end request time
            n_req = max(1, r["batches"] * r["mean_batch"])
            for name, st in sorted(r["stages"].items()):
                per_req = st["total_ms"] / n_req
                print(f"    {name:<12} mean {st['mean_ms']:8.2f} ms "
                      f"x{st['count']:<5} = {per_req:8.2f} ms/request")
    print(f"speedup: {results[args.max_batch] / results[1]:.2f}x")


if __name__ == "__main__":
    main()
