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
grid), so repeat resolutions hit the compiled program.

Concurrent requests COALESCE into one device batch: handler threads
preprocess + enqueue, a single dispatcher thread drains same-shape groups
(up to --max-batch, padded to a power-of-two bucket so compile count stays
bounded) and runs one trunk forward + VLAD for the whole group — the trunk
is ~10x more efficient at batch 16-32 than batch 1, so under load the
daemon rides the engine's batched operating point instead of serializing
batch-1 dispatches (measured: docs/SERVING.md). ``GET /stats`` reports the
realized mean batch size. Scale across chips with dp (parallel/) behind a
load balancer.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Request:
    """One in-flight request parked on the batch queue."""

    __slots__ = ("arr", "kind", "k", "event", "result", "error", "t_submit")

    def __init__(self, arr, kind: str, k: int = 0) -> None:
        self.arr = arr          # preprocessed [H, W, 3] f32
        self.kind = kind        # "describe" | "search"
        self.k = k
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None
        self.t_submit = 0.0


class _Batcher:
    """Coalesces concurrent requests into single device batches.

    One dispatcher thread owns ALL device work (trunk + VLAD + search):
    it drains the queue, groups requests by preprocessed shape (XLA needs
    static shapes; mixed resolutions batch within their own bucket), pads
    the group to a power-of-two batch <= max_batch (bounded compile count)
    and distributes per-request results. When the device is busy, arrivals
    accumulate naturally; ``window_s`` additionally lets an idle dispatcher
    linger for followers of the first request before launching.

    The loop is a DEPTH-1 PIPELINE (the engine's extract pipeline pattern):
    JAX dispatch is async, so group N's stack + H2D + program enqueue
    overlaps group N-1's device compute; the only blocking point is the
    result fetch (``np.asarray``) of the PREVIOUS group after the next one
    is already on the device queue. Per-stage wall time accumulates into
    ``stages`` (exposed at ``GET /stats``) so the request latency budget is
    attributable: preprocess / queue_wait / stack / enqueue / device_sync
    per dispatcher group, respond in the handler thread.
    """

    def __init__(self, svc: "_Service", max_batch: int, window_s: float) -> None:
        self.svc = svc
        self.max_batch = max(1, max_batch)
        self.window_s = max(0.0, window_s)
        self.cv = threading.Condition()
        self.queue: list = []
        self.n_requests = 0
        self.n_batches = 0
        self.stages: dict = {}
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def acc(self, stage: str, seconds: float, n: int = 1) -> None:
        """Accumulate ``seconds`` of wall time for one pipeline stage."""
        with self.cv:
            tot, cnt = self.stages.get(stage, (0.0, 0))
            self.stages[stage] = (tot + seconds, cnt + n)

    def submit(self, req: _Request) -> _Request:
        req.t_submit = time.monotonic()
        with self.cv:
            self.queue.append(req)
            self.cv.notify_all()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req

    def _take_group(self, blocking: bool = True) -> list:
        with self.cv:
            while not self.queue:
                if not blocking:
                    return []
                self.cv.wait()
            shape = self.queue[0].arr.shape
            same = lambda: [r for r in self.queue if r.arr.shape == shape]  # noqa: E731
            # the linger window only applies to an idle dispatcher; when
            # pipelined behind in-flight device work (non-blocking take)
            # arrivals have already accumulated naturally
            if blocking and self.window_s > 0 and len(same()) < self.max_batch:
                deadline = time.monotonic() + self.window_s
                while len(same()) < self.max_batch:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self.cv.wait(timeout=left)
            group = same()[: self.max_batch]
            for r in group:
                self.queue.remove(r)
            self.n_requests += len(group)
            self.n_batches += 1
        now = time.monotonic()
        for r in group:
            self.acc("queue_wait", now - r.t_submit)
        return group

    def _run(self) -> None:
        pending = None  # (group, device-array state) awaiting its fetch
        while True:
            group = self._take_group(blocking=pending is None)
            state = None
            if group:
                try:
                    state = (group, self._dispatch(group))
                except Exception as e:  # surface per-request, keep serving
                    for r in group:
                        r.error = e
                        r.event.set()
            if pending is not None:
                pgroup, pstate = pending
                try:
                    self._finish(pgroup, pstate)
                except Exception as e:
                    for r in pgroup:
                        r.error = e
                finally:
                    for r in pgroup:
                        r.event.set()
            pending = state

    def _dispatch(self, group: list) -> dict:
        """Host-side assembly + async device enqueue — returns device
        arrays WITHOUT waiting for them (jax dispatch is async)."""
        svc = self.svc
        n = len(group)
        # pad to a power-of-two bucket (repeat the last image) so the trunk
        # compiles O(log max_batch) programs per resolution, not one per n
        bucket = 1
        while bucket < n:
            bucket *= 2
        t0 = time.monotonic()
        batch = np.stack([r.arr for r in group]
                         + [group[-1].arr] * (bucket - n))
        t1 = time.monotonic()
        self.acc("stack", t1 - t0)
        descs = svc.extractor(svc.jnp.asarray(batch))
        vlads = svc.vlad.aggregate(descs)
        state = {"n": n, "bucket": bucket}
        describes = [(i, r) for i, r in enumerate(group)
                     if r.kind == "describe"]
        if describes:
            # fetch descriptors ONLY for describe requests, row-selected on
            # device (padded to the bucket for shape stability). A pure
            # /search group skips the [bucket, C*D] descriptor D2H entirely
            # — ~3 MB/group on the flagship config, the dominant share of
            # device_sync on a thin host link (docs/SERVING.md).
            rows = [i for i, _ in describes]
            sel = svc.jnp.asarray((rows + [0] * (bucket - len(rows)))[:bucket])
            state.update(describes=describes, vlads=vlads[sel])
        searches = [(i, r) for i, r in enumerate(group) if r.kind == "search"]
        if searches:
            # shape-stable search: the query block is padded to the full
            # bucket and k rounds up to a power of two, so compiled search
            # programs are O(log max_batch x log k), all pre-warmable —
            # a per-group-size/k shape would compile in-band under load
            kmax = min(max(r.k for _, r in searches), svc.db_rows)
            kpad = 8
            while kpad < kmax:
                kpad *= 2
            kpad = min(kpad, svc.db_rows)
            rows = [i for i, _ in searches]
            sel = svc.jnp.asarray(
                (rows + [0] * (bucket - len(rows)))[:bucket])
            qu = vlads[sel]  # on-device row select keeps dispatch async
            if svc.mesh is not None and svc.index_search is not None:
                # the sharded engines return HOST numpy (they block): run
                # them in the _finish (sync) stage so this dispatch stays
                # async and /stats attributes the wait to device_sync
                state.update(searches=searches, kmax=kmax,
                             search_thunk=lambda: svc.index_search(qu, kpad))
            elif svc.index_search is not None:
                s, idx = svc.index_search(qu, kpad)
                state.update(searches=searches, kmax=kmax, s=s, idx=idx)
            else:
                from anyloc_tpu.ops.retrieval import top_k_search

                s, idx = top_k_search(svc.db_dev, qu, kpad)
                state.update(searches=searches, kmax=kmax, s=s, idx=idx)
        self.acc("enqueue", time.monotonic() - t1)
        return state

    def _finish(self, group: list, state: dict) -> None:
        """Fetch the group's device results (the one blocking wait) and
        distribute them per request."""
        t0 = time.monotonic()
        if "search_thunk" in state:
            state["s"], state["idx"] = state.pop("search_thunk")()
        if "searches" in state:
            s, idx = np.asarray(state["s"]), np.asarray(state["idx"])
            for row, (i, r) in enumerate(state["searches"]):
                kk = min(r.k, state["kmax"])
                r.result = (s[row, :kk], idx[row, :kk])
        if "describes" in state:
            vlads = np.asarray(state["vlads"])
            for row, (i, r) in enumerate(state["describes"]):
                r.result = vlads[row]
        self.acc("device_sync", time.monotonic() - t0)


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
        self.db = None
        self.db_dev = None
        self.index = None
        self.index_search = None
        self.engine = "device"
        self.mesh = None
        n_mesh = int(getattr(args, "mesh", 0) or 0)
        if n_mesh >= 1:  # --mesh 1 is a valid (degenerate) sharded mesh
            # multi-chip serving: the DATABASE shards over a local mesh
            # (retrieval is the memory-bound half; the trunk replicates).
            # Every engine below then routes through its parallel/ sharded
            # twin — exact-equal results, 1/n_dev database per chip.
            from anyloc_tpu.parallel import local_mesh

            self.mesh = local_mesh(n_mesh)
        self.db_rows = 0
        if args.db:
            self.db = np.load(args.db).astype(np.float32)
            self.db_rows = int(self.db.shape[0])
            if getattr(args, "ivf", False) and getattr(args, "pq", False):
                raise ValueError("--ivf and --pq are mutually exclusive")
            if getattr(args, "ivf", False):
                from anyloc_tpu.ops.ivf import ivf_fit

                # mesh mode fits with as_numpy: the full bucket store must
                # NEVER touch device 0 (at the 4M x 512-d motivating scale
                # that one upload would OOM the chip the sharding exists
                # to relieve); the sharded engine uploads 1/N shards
                self.index = ivf_fit(self.db, method="cosine",
                                     as_numpy=self.mesh is not None)
                if self.mesh is not None:
                    from anyloc_tpu.parallel import ivf_search_sharded

                    self.index_search = lambda qu, k: ivf_search_sharded(
                        self.index, np.asarray(qu), k, self.mesh,
                        n_probe=args.n_probe)
                else:
                    self.index_search = lambda qu, k: self.index.search(
                        qu, k, n_probe=args.n_probe)
                self.engine = "ivf"
            elif getattr(args, "pq", False):
                # compressed database: HBM holds pq_m bytes/row instead of
                # 4*dim — the >HBM serving regime (ops/pq.py)
                from anyloc_tpu.ops.pq import pq_fit

                # n_codes clamps to the row count so tiny databases still
                # serve (PQ quality needs rows >> codes; that is the
                # operator's dial, not a startup failure)
                self.index = pq_fit(self.db, getattr(args, "pq_m", 64),
                                    n_codes=min(256, max(2, self.db.shape[0])),
                                    method="cosine",
                                    as_numpy=self.mesh is not None)
                if self.mesh is not None:
                    from anyloc_tpu.parallel import pq_search_sharded

                    self.index_search = lambda qu, k: pq_search_sharded(
                        self.index, np.asarray(qu), k, self.mesh)
                else:
                    self.index_search = lambda qu, k: self.index.search(
                        jnp.asarray(qu), k)
                self.engine = "pq"
            elif self.mesh is not None:
                # exact over the mesh: pad + shard ONCE (resident state),
                # searches pass the device array straight through
                import jax

                from anyloc_tpu.parallel import top_k_search_sharded
                from anyloc_tpu.parallel.mesh import (data_sharding,
                                                      pad_to_multiple)

                db_pad, nv = pad_to_multiple(self.db, n_mesh)
                db_res = jax.device_put(db_pad, data_sharding(self.mesh))
                self.index_search = lambda qu, k: top_k_search_sharded(
                    db_res, np.asarray(qu), k, self.mesh, n_valid=nv)
            else:
                # device-resident once — the daemon's point is resident state
                self.db_dev = jnp.asarray(self.db)
        if self.mesh is not None and self.db is not None:
            self.engine += f"+mesh{n_mesh}"
        # the raw f32 rows are not needed at serve time in ANY mode (exact
        # keeps a device/sharded copy; ivf/pq indexes are self-contained)
        # — at the --pq motivating scale (4M x 512-d) the host copy alone
        # is ~8 GB, exactly the memory the compressed mode exists to save
        self.db = None
        self.batcher = _Batcher(
            self,
            max_batch=getattr(args, "max_batch", 16),
            window_s=getattr(args, "batch_window_ms", 5.0) / 1e3,
        )
        if getattr(args, "img_size", 0) and getattr(args, "warm", True):
            self._warm_buckets()

    def _warm_buckets(self) -> None:
        """Compile every power-of-two batch bucket at the fixed serving
        resolution BEFORE accepting traffic. Without this the first live
        group of each size pays a ViT-G compile inside someone's request
        (measured: coalescing ran 0.32x batch-1 with in-band compiles,
        19x after warming — docs/SERVING.md)."""
        size = self.args.img_size - self.args.img_size % 14
        dt = (np.uint8 if getattr(self.args, "transfer_dtype", "float32")
              == "uint8" else np.float32)
        b = 1
        while b <= self.batcher.max_batch:
            batch = np.zeros((b, size, size, 3), dt)
            descs = self.extractor(self.jnp.asarray(batch))
            vlads = self.vlad.aggregate(descs)
            # the live path row-selects describe/search rows on device —
            # warm that gather program per bucket too
            vlads = vlads[self.jnp.asarray(np.zeros(b, np.int32))]
            if self.db_rows and (self.db_dev is not None
                                 or self.index_search is not None):
                # warm EVERY power-of-two k bucket the live path can pad
                # to (8 .. min(1024, rows)) — the search program depends
                # on (bucket, kpad) and an unwarmed k compiles in-band
                kp = 8
                while True:
                    kk = min(kp, self.db_rows)
                    if self.db_dev is not None:
                        from anyloc_tpu.ops.retrieval import top_k_search

                        s, _ = top_k_search(
                            self.db_dev,
                            self.jnp.asarray(np.asarray(vlads)), kk)
                    else:
                        s, _ = self.index_search(np.asarray(vlads), kk)
                    np.asarray(s)
                    if kp >= min(1024, self.db_rows):
                        break
                    kp *= 2
            else:
                np.asarray(vlads)
            b *= 2

    def _preprocess(self, image_bytes: bytes) -> np.ndarray:
        from PIL import Image

        from anyloc_tpu.data.transforms import (center_crop_multiple,
                                                 preprocess_image,
                                                 resize_round_u8)

        if getattr(self.args, "transfer_dtype", "float32") == "uint8":
            # low-bandwidth transfer: resized uint8 over the wire to the
            # device, normalization on-device in the extractor (1/4 the
            # host->device bytes; deviation from the f32 path is the 8-bit
            # rounding of resized values — same bounded drift as the
            # engine's uint8 mode, cosine > 0.999 test-enforced)
            if getattr(self.args, "img_size", 0):
                nat_kw = dict(size_hw=(self.args.img_size,
                                       self.args.img_size))
            else:
                nat_kw = dict(max_edge=self.args.max_img_size)
            # native fast path: in-memory decode + tensor-mode resize on
            # the handler thread (no disk, no PIL; native/imagepipe.cpp
            # decode_bytes_u8) — same role as the engine loader's native
            # path, PIL fallback per request
            from anyloc_tpu import native as _native

            arr8 = _native.decode_bytes_u8(image_bytes, **nat_kw)
            if arr8 is not None:
                return center_crop_multiple(arr8, 14)
            img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
            arr = np.asarray(img, np.float32)
            if getattr(self.args, "img_size", 0):
                size = (self.args.img_size, self.args.img_size)
            else:
                me = self.args.max_img_size
                h, w = arr.shape[:2]
                sc = min(1.0, me / max(h, w))
                size = (int(h * sc), int(w * sc))
            return center_crop_multiple(resize_round_u8(arr, size), 14)
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        if getattr(self.args, "img_size", 0):
            # fixed serving resolution: every request lands in ONE shape
            # bucket, so any concurrent pair can share a device batch
            return preprocess_image(
                img, size_hw=(self.args.img_size, self.args.img_size),
                crop_multiple=14)
        return preprocess_image(img, max_edge=self.args.max_img_size,
                                crop_multiple=14)

    def _timed_preprocess(self, image_bytes: bytes) -> np.ndarray:
        t0 = time.monotonic()
        arr = self._preprocess(image_bytes)
        if arr.shape[0] < 14 or arr.shape[1] < 14:
            # extreme aspect ratios (e.g. 2000x8 at max_img_size 64) scale
            # or crop below one 14-px patch — reject with a clear 400
            # instead of a downstream stack/extractor crash
            raise ValueError(
                f"image too small after preprocessing "
                f"({arr.shape[0]}x{arr.shape[1]} px; need >= 14x14 — "
                f"extreme aspect ratio or tiny source)")
        self.batcher.acc("preprocess", time.monotonic() - t0)
        return arr

    def describe(self, image_bytes: bytes) -> np.ndarray:
        req = _Request(self._timed_preprocess(image_bytes), "describe")
        return self.batcher.submit(req).result

    def search(self, image_bytes: bytes, k: int):
        if not self.db_rows:  # check BEFORE paying a trunk forward
            raise ValueError("no database loaded (--db)")
        req = _Request(self._timed_preprocess(image_bytes), "search", k=k)
        return self.batcher.submit(req).result


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
            path = self.path.split("?")[0]
            if path == "/health":
                self._reply(200, {
                    "status": "ok",
                    "model": svc.args.model,
                    "layer": svc.args.layer,
                    "facet": svc.args.facet,
                    "clusters": svc.args.num_clusters,
                    "quant": svc.args.quant,
                    "db_rows": svc.db_rows,
                    "engine": svc.engine,
                    "max_batch": svc.batcher.max_batch,
                })
            elif path == "/stats":
                b = svc.batcher
                with b.cv:
                    n_req, n_bat = b.n_requests, b.n_batches
                    stages = dict(b.stages)
                self._reply(200, {
                    "requests": n_req,
                    "batches": n_bat,
                    "mean_batch": (n_req / n_bat) if n_bat else 0.0,
                    # per-stage latency budget: preprocess/queue_wait/
                    # respond count per REQUEST, stack/enqueue/device_sync
                    # per dispatcher GROUP — mean_ms x its count over the
                    # request count attributes end-to-end latency
                    "stages": {
                        k: {"total_ms": round(tot * 1e3, 3), "count": cnt,
                            "mean_ms": round(tot * 1e3 / cnt, 3)}
                        for k, (tot, cnt) in sorted(stages.items())
                    },
                })
            else:
                self._reply(404, {"error": "unknown path"})

        MAX_BODY = 64 * 1024 * 1024  # one image; a daemon must not OOM
        MAX_K = 1024  # bounds the compiled top-k program set (powers of
        # two up to here are pre-warmed; an unbounded client k would force
        # an in-band jit + a giant D2H on the shared dispatcher thread)
        timeout = 120  # a stalled client must not leak a handler thread

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n < 0 or n > self.MAX_BODY:
                    self._reply(413, {"error": f"bad body size ({n} bytes)"})
                    return
                data = self.rfile.read(n)
                if len(data) != n:  # client lied or hung up mid-body
                    self._reply(400, {"error": "truncated body"})
                    return
                path, _, query = self.path.partition("?")
                if path == "/describe":
                    gd = svc.describe(data)
                    t0 = time.monotonic()
                    self._reply(200, {"descriptor": gd.tolist()})
                    svc.batcher.acc("respond", time.monotonic() - t0)
                elif path == "/search":
                    k = 5
                    for part in query.split("&"):
                        if part.startswith("k="):
                            k = max(1, min(int(part[2:]), self.MAX_K))
                    s, i = svc.search(data, k)
                    t0 = time.monotonic()
                    self._reply(200, {"ids": i.tolist(),
                                      "scores": s.tolist()})
                    svc.batcher.acc("respond", time.monotonic() - t0)
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as e:  # surface errors as JSON, keep serving
                # client-attributable problems (bad image — PIL raises an
                # OSError subclass — or bad params) are 400; anything else
                # is a genuine 5xx so monitoring sees it
                code = 400 if isinstance(e, (ValueError, OSError)) else 500
                try:
                    self._reply(code, {"error": f"{type(e).__name__}: {e}"})
                except Exception:
                    pass  # reply failed mid-write (client gone) — done

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
    p.add_argument("--img-size", type=int, default=0,
                   help="fixed square serving resolution (0 = variable, "
                        "demo-style max-edge). Fixed puts every request in "
                        "one shape bucket so any concurrent pair batches.")
    p.add_argument("--max-batch", type=int, default=16,
                   help="max concurrent requests coalesced per device batch")
    p.add_argument("--transfer-dtype", default="float32",
                   choices=["float32", "uint8"],
                   help="host->device batch format; uint8 sends 1/4 the "
                        "bytes and normalizes on-device (bounded 8-bit "
                        "rounding drift, the engines' production mode)")
    p.add_argument("--no-warm", dest="warm", action="store_false",
                   help="skip pre-compiling the power-of-two batch buckets "
                        "at startup (fixed --img-size only; warming keeps "
                        "compiles out of live requests)")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="idle dispatcher lingers this long for followers "
                        "of the first queued request")
    p.add_argument("--db", default=None,
                   help=".npy of database descriptors enabling /search")
    p.add_argument("--ivf", action="store_true",
                   help="serve /search through the IVF index (large dbs)")
    p.add_argument("--n-probe", type=int, default=8)
    p.add_argument("--pq", action="store_true",
                   help="serve /search through a PQ-compressed database "
                        "(ops/pq.py; databases past HBM)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the DATABASE over this many local devices "
                        "(0 = single-device): /search routes through the "
                        "sharded engine twins (parallel/), exact-equal "
                        "results with 1/n of the database per chip")
    p.add_argument("--pq-m", type=int, default=64,
                   help="PQ subquantizers = bytes per database row")
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
