"""End-to-end pipeline tests: synthetic datasets + small real-architecture
trunk (random weights) through the full extract -> aggregate -> retrieve flow.
This is the minimum end-to-end slice of SURVEY.md §7 at test scale."""

import numpy as np
import pytest

from anyloc_tpu.config import PipelineArgs, parse_args
from anyloc_tpu.data.synthetic import build_gardens
from anyloc_tpu.pipelines import (
    DescriptorEngine,
    run_gem_pipeline,
    run_global_vocab_vlad,
    run_vlad_pipeline,
)


@pytest.fixture(scope="module")
def gardens_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return build_gardens(str(root), n_db=10, n_q=5, size=(70, 70))


def _args(root, **kw):
    largs = PipelineArgs()
    largs.prog.data_vg_dir = root
    largs.prog.vg_dataset_name = "gardens"
    largs.bd_args.resize = (70, 70)  # 5x5 patch grid at patch 14
    largs.extractor.model_type = "dinov2_vits14"
    largs.extractor.desc_layer = 5
    largs.extractor.desc_facet = "value"
    largs.extractor.batch_size = 4
    largs.vlad.num_clusters = 4
    largs.top_k_vals = [1, 3, 5]
    for k, v in kw.items():
        setattr(largs, k, v)
    return largs


@pytest.fixture(scope="module")
def engine():
    return DescriptorEngine(
        "dinov2_vits14", 5, "value", dtype="float32", batch_size=4
    )


def test_vlad_pipeline_e2e(gardens_root, engine):
    largs = _args(gardens_root)
    results = run_vlad_pipeline(largs, engine=engine, verbose=False)
    assert results["Agg-Method"] == "VLAD"
    assert results["Num-DB"] == "10" and results["Num-QU"] == "5"
    assert int(results["VLAD-Dim"]) == 4 * 384
    # noised-copy queries with real (random-weight) ViT features: should
    # retrieve the source image most of the time
    assert results["R@1"] >= 0.6, results
    assert results["R@5"] >= results["R@1"]
    assert results["Qual-Indices"].shape == (5, 5)


def test_global_vocab_vlad_e2e(gardens_root, engine):
    largs = _args(gardens_root, db_samples={"gardens": 1})
    results = run_global_vocab_vlad(largs, engine=engine, verbose=False)
    assert results["R@1"] >= 0.6, results
    assert results["Global-Vocab"] == "['gardens']"


def test_gem_pipeline_e2e(gardens_root, engine):
    largs = _args(gardens_root)
    results = run_gem_pipeline(largs, engine=engine, verbose=False)
    assert results["Agg-Method"] == "GeM"
    assert int(results["VLAD-Dim"]) == 384
    assert results["R@1"] >= 0.6, results


def test_vlad_vocab_caching_roundtrip(gardens_root, engine, tmp_path):
    largs = _args(gardens_root)
    largs.vlad.cache_dir = str(tmp_path / "vocab")
    r1 = run_vlad_pipeline(largs, engine=engine, verbose=False)
    # Second run must reuse the cached centers (same recalls)
    r2 = run_vlad_pipeline(largs, engine=engine, verbose=False)
    assert r1["R@1"] == r2["R@1"]
    import os

    assert os.path.exists(os.path.join(largs.vlad.cache_dir, "c_centers.npz"))


def test_parse_args_nested():
    largs = parse_args(
        PipelineArgs,
        [
            "--prog.vg-dataset-name", "gardens",
            "--extractor.model-type", "dinov2_vitb14",
            "--extractor.desc-layer", "9",
            "--vlad.num-clusters", "16",
            "--db-samples", "gardens=1", "pitts30k=4",
            "--top-k-vals", "1", "5",
        ],
    )
    assert largs.prog.vg_dataset_name == "gardens"
    assert largs.extractor.model_type == "dinov2_vitb14"
    assert largs.extractor.desc_layer == 9
    assert largs.vlad.num_clusters == 16
    assert largs.db_samples == {"gardens": 1, "pitts30k": 4}
    assert largs.top_k_vals == [1, 5]


def test_uint8_transfer_matches_f32(gardens_root, engine):
    """uint8 H2D transfer mode (on-device normalization) must reproduce the
    f32 pipeline's descriptors within the 8-bit rounding budget."""
    from anyloc_tpu.data.registry import get_dataset

    ds = get_dataset("gardens", gardens_root, img_size=(70, 70))
    d32 = engine.extract_dataset(ds, which="db", verbose=False)
    e8 = DescriptorEngine(
        "dinov2_vits14", 5, "value", dtype="float32", batch_size=4,
        transfer_dtype="uint8", extractor=engine.extractor,
    )
    d8 = e8.extract_dataset(ds, which="db", verbose=False)
    assert d8.shape == d32.shape
    cos = np.sum(d8 * d32, -1) / (
        np.linalg.norm(d8, axis=-1) * np.linalg.norm(d32, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos.min()


def test_uint8_transfer_guards(gardens_root, engine):
    """uint8 mode refuses configurations where it would be silently wrong:
    extractors without on-device normalization, and datasets with custom
    __getitem__ transforms."""
    from anyloc_tpu.data.base import VPRDataset
    from anyloc_tpu.data.registry import get_dataset

    class Wrapper:  # no supports_uint8
        cfg = engine.extractor.cfg

    with pytest.raises(ValueError, match="uint8"):
        DescriptorEngine(extractor=Wrapper(), transfer_dtype="uint8")

    ds = get_dataset("gardens", gardens_root, img_size=(70, 70))

    class Custom(type(ds)):
        def __getitem__(self, i):
            return super().__getitem__(i)

    ds.__class__ = Custom
    with pytest.raises(ValueError, match="__getitem__"):
        next(iter(ds.batches(2, output="uint8")))


def test_serving_config_quant_uint8_e2e(gardens_root):
    """The production serving configuration (int8_full trunk + uint8
    transfer) runs the full VLAD pipeline end-to-end from the CLI args."""
    from anyloc_tpu.pipelines.vlad_pipeline import run_vlad_pipeline

    largs = _args(gardens_root)
    largs.extractor.quant = "int8_full"
    largs.extractor.transfer_dtype = "uint8"
    results = run_vlad_pipeline(largs, verbose=False)
    assert results["Agg-Method"] == "VLAD"
    # int8 trunk + 8-bit image rounding still retrieves the noised copies
    assert results["R@1"] >= 0.6, results["R@1"]


def test_extract_vlads_fused_matches_separate(gardens_root, engine):
    """Fused extract+aggregate must equal extract -> generate_multi."""
    from anyloc_tpu.data.registry import get_dataset
    from anyloc_tpu.ops.vlad import VLAD

    ds = get_dataset("gardens", gardens_root, img_size=(70, 70))
    descs = engine.extract_dataset(ds, which="db", verbose=False)
    v = VLAD(num_clusters=4)
    v.fit(descs.reshape(-1, descs.shape[-1]))
    sep = np.asarray(v.generate_multi(descs))
    fused = np.asarray(engine.extract_vlads_dataset(ds, v, "db", verbose=False))
    np.testing.assert_allclose(fused, sep, atol=1e-5)


def test_demo_cli_e2e(tmp_path):
    """The demo CLI (reference demo/anyloc_vlad_generate.py port): cached
    vocabulary -> per-image .npy global descriptors, with the on-device
    aggregation matching VLAD.generate."""
    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines.demo import main as demo_main, vocab_dir

    rng = np.random.default_rng(0)
    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            (rng.random((70, 84, 3)) * 255).astype(np.uint8)
        ).save(in_dir / f"p{i}.jpg", quality=95)

    # build + cache a vocabulary the demo can load
    vdir = vocab_dir(str(tmp_path / "cache"), "dinov2_vits14", 5, "value", 4,
                     "indoor")
    descs = rng.standard_normal((200, 384)).astype(np.float32)
    v = VLAD(4, cache_dir=vdir)
    v.fit(descs)

    rc = demo_main([
        "--in-dir", str(in_dir), "--out-dir", str(tmp_path / "out"),
        "--cache-dir", str(tmp_path / "cache"), "--model", "dinov2_vits14",
        "--layer", "5", "--facet", "value", "--num-clusters", "4",
        "--max-img-size", "84",
    ])
    assert rc == 0
    outs = sorted((tmp_path / "out").glob("*.npy"))
    assert len(outs) == 3
    gd = np.load(outs[0])
    assert gd.shape == (4 * 384,)
    np.testing.assert_allclose(np.linalg.norm(gd), 1.0, atol=1e-5)


def test_vlad_cache_key_tracks_vocabulary(gardens_root, tmp_path, engine):
    """A refit vocabulary must never cache-hit on descriptors computed with
    the previous centers (the cache key includes the vocab digest)."""
    from anyloc_tpu.data.registry import get_dataset
    from anyloc_tpu.ops.vlad import VLAD

    ds = get_dataset("gardens", gardens_root, img_size=(70, 70))
    e = DescriptorEngine(
        "dinov2_vits14", 5, "value", batch_size=4,
        extractor=engine.extractor, cache_dir=str(tmp_path / "cache"),
    )
    descs = e.extract_dataset(ds, which="db", verbose=False)
    flat = descs.reshape(-1, descs.shape[-1])
    v1 = VLAD(4, seed=1); v1.fit(flat)
    v2 = VLAD(4, seed=2); v2.fit(flat[::2] + 0.5)
    assert v1.vocab_key() != v2.vocab_key()
    g1 = np.asarray(e.extract_vlads_dataset(ds, v1, "db", verbose=False))
    g2 = np.asarray(e.extract_vlads_dataset(ds, v2, "db", verbose=False))
    assert not np.allclose(g1, g2)  # second call must NOT serve v1's cache
    g1_again = np.asarray(e.extract_vlads_dataset(ds, v1, "db", verbose=False))
    np.testing.assert_allclose(g1_again, g1, atol=1e-6)  # cache hit correct


def test_demo_cli_auto_domain(tmp_path):
    """--domain auto: per-image GeM routing across every cached domain
    vocabulary (the HF-space domain projector made automatic), with
    gem_centroids.npz when present and the mean-VLAD-center fallback."""
    from PIL import Image

    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.models.vit import ViTConfig
    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines.demo import (
        build_gem_centroids, main as demo_main, vocab_dir,
    )

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((70, 84, 3)) * 255).astype(np.uint8)
        ).save(in_dir / f"p{i}.jpg", quality=95)

    for dom, seed in (("indoor", 0), ("urban", 1)):
        vdir = vocab_dir(str(tmp_path / "cache"), "dinov2_vits14", 5,
                         "value", 4, dom)
        VLAD(4, cache_dir=vdir).fit(
            rng.standard_normal((150, 384)).astype(np.float32))

    args = [
        "--in-dir", str(in_dir), "--out-dir", str(tmp_path / "out"),
        "--cache-dir", str(tmp_path / "cache"), "--model", "dinov2_vits14",
        "--layer", "5", "--facet", "value", "--num-clusters", "4",
        "--max-img-size", "84", "--domain", "auto",
    ]
    # auto requires gem_centroids.npz (VLAD centers are not GeM-comparable)
    with pytest.raises(FileNotFoundError):
        demo_main(args)

    # gem_centroids.npz route (built by the faithful helper)
    import jax.numpy as jnp

    cfg = ViTConfig(img_size=70, patch_size=14, embed_dim=32, depth=6,
                    num_heads=2, mlp_type="mlp", layerscale_init=1e-5,
                    dtype=jnp.float32)
    ex = ViTFacetExtractor(cfg, init_params(cfg, seed=1), 5, "value")
    import os

    root = os.path.dirname(vocab_dir(
        str(tmp_path / "cache"), "dinov2_vits14", 5, "value", 4, "x"))
    cents = build_gem_centroids(
        ex, {"indoor": [str(in_dir / "p0.jpg")],
             "urban": [str(in_dir / "p1.jpg")]},
        os.path.join(root, "gem_centroids.npz"))
    assert set(cents) == {"indoor", "urban"}
    # centroid dim must match the DEMO model's facet dim for routing; the
    # tiny test trunk differs, so rebuild with matching dim
    # wrong-dim centroids fail fast with a clear message
    with pytest.raises(ValueError):
        demo_main(args)
    np.savez(os.path.join(root, "gem_centroids.npz"),
             indoor=rng.standard_normal(384).astype(np.float32),
             urban=rng.standard_normal(384).astype(np.float32))
    assert demo_main(args) == 0
    assert sorted(p.name for p in (tmp_path / "out").iterdir()) == [
        "p0.npy", "p1.npy"]
    # stale centroid file (missing a cached domain) fails fast too
    np.savez(os.path.join(root, "gem_centroids.npz"),
             indoor=rng.standard_normal(384).astype(np.float32))
    with pytest.raises(KeyError):
        demo_main(args)


def test_serve_http_e2e(tmp_path):
    """HTTP daemon (pipelines/serve_http.py): /health, /describe, /search
    end-to-end over a cached vocabulary + tiny database."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(7)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((20, 4 * 384)).astype(np.float32)
    np.save(tmp_path / "db.npy", db)

    import argparse

    args = argparse.Namespace(
        model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
        vocab_dir=str(vdir), checkpoint=None, quant=None, max_img_size=84,
        db=str(tmp_path / "db.npy"), ivf=False, n_probe=4,
        host="127.0.0.1", port=0,
    )
    server = serve_http.build_server(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["db_rows"] == 20

        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((70, 84, 3)) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/describe", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            gd = json.loads(r.read())["descriptor"]
        assert len(gd) == 4 * 384
        np.testing.assert_allclose(np.linalg.norm(gd), 1.0, atol=1e-4)

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search?k=3", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 3 and len(out["scores"]) == 3

        # errors surface as JSON 400s, the server keeps running
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/describe", data=b"not an image",
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "error" in json.loads(e.read())
    finally:
        server.shutdown()


def test_serve_http_pq_engine(tmp_path):
    """--pq serving mode: /search rides the PQ-compressed database
    (engine reported in /health; neighbors come back from ADC search)."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(9)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((48, 4 * 384)).astype(np.float32)
    np.save(tmp_path / "db.npy", db)

    import argparse

    args = argparse.Namespace(
        model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
        vocab_dir=str(vdir), checkpoint=None, quant=None, max_img_size=84,
        db=str(tmp_path / "db.npy"), ivf=False, n_probe=4,
        pq=True, pq_m=16, host="127.0.0.1", port=0,
    )
    server = serve_http.build_server(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            h = json.loads(r.read())
        assert h["engine"] == "pq" and h["db_rows"] == 48

        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((70, 84, 3)) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search?k=3", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 3 and len(set(out["ids"])) == 3
        assert all(0 <= i < 48 for i in out["ids"])
    finally:
        server.shutdown()
    # --ivf and --pq together must fail fast, not silently pick one
    args.ivf = True
    with pytest.raises(ValueError, match="mutually exclusive"):
        serve_http.build_server(args)


def test_serve_http_batched_dispatch(tmp_path):
    """Concurrent requests coalesce into one device batch (the round-3
    serving upgrade): N parallel /search requests with a generous batch
    window must (a) return the same results as sequential batch-1 serving,
    (b) actually share device batches (/stats mean_batch > 1), and
    (c) respect the fixed --img-size shape bucket."""
    import io
    import json
    import threading
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(11)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((20, 4 * 384)).astype(np.float32)
    np.save(tmp_path / "db.npy", db)

    import argparse

    def make_args(max_batch, window_ms):
        return argparse.Namespace(
            model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
            vocab_dir=str(vdir), checkpoint=None, quant=None,
            max_img_size=84, img_size=84, max_batch=max_batch,
            batch_window_ms=window_ms, db=str(tmp_path / "db.npy"),
            ivf=False, n_probe=4, host="127.0.0.1", port=0,
        )

    imgs = []
    for i in range(6):
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((90, 77, 3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")  # lossless: both servers see equal bytes
        imgs.append(buf.getvalue())

    def run_server(args, fn):
        server = serve_http.build_server(args)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            return fn(port)
        finally:
            server.shutdown()

    def search_one(port, data):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search?k=4", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def get_json(port, path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/{path}", timeout=30) as r:
            return json.loads(r.read())

    # sequential reference: batch-1 server
    def sequential(port):
        return [search_one(port, d) for d in imgs]

    ref = run_server(make_args(1, 0.0), sequential)

    # batched server: warm the compile first (one request), then fire the
    # rest in parallel under a generous window so they coalesce
    def batched(port):
        search_one(port, imgs[0])
        with ThreadPoolExecutor(len(imgs)) as ex:
            outs = list(ex.map(lambda d: search_one(port, d), imgs))
        stats = get_json(port, "stats")
        assert get_json(port, "health")["max_batch"] == 8
        return outs, stats

    outs, stats = run_server(make_args(8, 500.0), batched)
    for got, want in zip(outs, ref):
        assert got["ids"] == want["ids"]
        # batching changes matmul shapes -> reduction order; scores drift
        # ~1e-4 while the ranking (ids, asserted exactly) is unchanged
        np.testing.assert_allclose(got["scores"], want["scores"],
                                   rtol=2e-3, atol=2e-3)
    # 7 requests total; the 6 parallel ones must have shared batches
    assert stats["requests"] == 7
    assert stats["batches"] < 7, f"no coalescing happened: {stats}"


def test_serve_http_mixed_describe_search_group(tmp_path):
    """A coalesced group mixing /describe and /search requests routes each
    result to its own request (the dispatcher row-selects describe rows on
    device and fetches ONLY those — a pure-search group skips the
    [bucket, C*D] descriptor D2H; round-4 serving change). Locks result
    routing against the sequential batch-1 server."""
    import io
    import json
    import threading
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(23)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((20, 4 * 384)).astype(np.float32)
    np.save(tmp_path / "db.npy", db)

    import argparse

    def make_args(max_batch, window_ms):
        return argparse.Namespace(
            model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
            vocab_dir=str(vdir), checkpoint=None, quant=None,
            max_img_size=84, img_size=84, max_batch=max_batch,
            batch_window_ms=window_ms, db=str(tmp_path / "db.npy"),
            ivf=False, n_probe=4, host="127.0.0.1", port=0,
        )

    imgs = []
    for i in range(6):
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((90, 77, 3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")  # lossless: both servers see equal bytes
        imgs.append(buf.getvalue())
    # alternate kinds so one group holds BOTH, at interleaved rows
    plan = [("describe", d) if i % 2 == 0 else ("search", d)
            for i, d in enumerate(imgs)]

    def post(port, kind, data):
        path = "/describe" if kind == "describe" else "/search?k=4"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def run_server(args, fn):
        server = serve_http.build_server(args)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            return fn(port)
        finally:
            server.shutdown()

    ref = run_server(make_args(1, 0.0),
                     lambda port: [post(port, k, d) for k, d in plan])

    def batched(port):
        post(port, *plan[0])  # warm outside the parallel burst
        with ThreadPoolExecutor(len(plan)) as ex:
            outs = list(ex.map(lambda kd: post(port, *kd), plan))
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            return outs, json.loads(r.read())

    outs, stats = run_server(make_args(8, 500.0), batched)
    for (kind, _), got, want in zip(plan, outs, ref):
        if kind == "describe":
            np.testing.assert_allclose(got["descriptor"],
                                       want["descriptor"],
                                       rtol=2e-3, atol=2e-3)
        else:
            assert got["ids"] == want["ids"]
            np.testing.assert_allclose(got["scores"], want["scores"],
                                       rtol=2e-3, atol=2e-3)
    assert stats["batches"] < stats["requests"], (
        f"no coalescing happened: {stats}")


def test_serve_http_uint8_transfer(tmp_path):
    """--transfer-dtype uint8 (the low-bandwidth production mode): the
    daemon sends resized uint8 to the device and normalizes on-device;
    retrieval ids must match the f32-transfer server, with warm buckets on
    (warming compiles every live shape)."""
    import argparse
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(12)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((20, 4 * 384)).astype(np.float32)
    np.save(tmp_path / "db.npy", db)

    def make_args(transfer):
        return argparse.Namespace(
            model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
            vocab_dir=str(vdir), checkpoint=None, quant=None,
            max_img_size=84, img_size=84, max_batch=2,
            batch_window_ms=0.0, db=str(tmp_path / "db.npy"),
            ivf=False, n_probe=4, host="127.0.0.1", port=0,
            transfer_dtype=transfer, warm=True,
        )

    imgs = []
    for i in range(3):
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((84, 84, 3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")
        imgs.append(buf.getvalue())

    def run_server(args):
        server = serve_http.build_server(args)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            outs = []
            for d in imgs:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/search?k=3", data=d,
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    outs.append(json.loads(r.read()))
            return outs
        finally:
            server.shutdown()

    f32 = run_server(make_args("float32"))
    u8 = run_server(make_args("uint8"))
    for a, b in zip(f32, u8):
        assert a["ids"] == b["ids"], (a, b)
        np.testing.assert_allclose(a["scores"], b["scores"], atol=5e-3)


def test_demo_cli_batched_buckets_match_batch1(tmp_path):
    """Round-5 demo batching: same-shape images bucket into one batched
    trunk dispatch (predicted from the file header, no decode); mixed-shape
    directories split into per-shape buckets; outputs are bit-identical to
    the batch-1 loop."""
    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines.demo import (
        main as demo_main, processed_shape, vocab_dir)

    # header-only shape prediction mirrors preprocess_image
    assert processed_shape(84, 70, max_edge=84) == (70, 84)
    assert processed_shape(200, 100, max_edge=84) == (42, 84)
    assert processed_shape(100, 200, max_edge=84) == (84, 42)

    # randomized cross-check against the REAL preprocess chain: the
    # prediction duplicates max_edge_resize + center_crop_multiple
    # arithmetic, so any rounding drift in transforms.py must fail here,
    # not as an opaque np.stack shape error in the demo loop
    from anyloc_tpu.data.transforms import preprocess_image

    srng = np.random.default_rng(11)
    for _ in range(25):
        w, h = int(srng.integers(15, 400)), int(srng.integers(15, 400))
        me = int(srng.integers(28, 300))
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        got = preprocess_image(img, max_edge=me, crop_multiple=14).shape[:2]
        assert got == processed_shape(w, h, max_edge=me), (w, h, me, got)

    rng = np.random.default_rng(7)
    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    sizes = [(70, 84), (70, 84), (70, 84), (56, 70), (56, 70)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray(
            (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ).save(in_dir / f"p{i}.png")  # png: lossless, so runs are exact

    vdir = vocab_dir(str(tmp_path / "cache"), "dinov2_vits14", 5, "value", 4,
                     "indoor")
    VLAD(4, cache_dir=vdir).fit(
        rng.standard_normal((200, 384)).astype(np.float32))

    base = [
        "--in-dir", str(in_dir), "--cache-dir", str(tmp_path / "cache"),
        "--model", "dinov2_vits14", "--layer", "5", "--facet", "value",
        "--num-clusters", "4", "--max-img-size", "84",
    ]
    assert demo_main(base + ["--out-dir", str(tmp_path / "b4"),
                             "--batch", "4"]) == 0
    assert demo_main(base + ["--out-dir", str(tmp_path / "b1"),
                             "--batch", "1"]) == 0
    assert demo_main(base + ["--out-dir", str(tmp_path / "auto")]) == 0
    b4 = sorted((tmp_path / "b4").glob("*.npy"))
    assert [p.name for p in b4] == [f"p{i}.npy" for i in range(5)]
    for p in b4:
        a, b = np.load(p), np.load(tmp_path / "b1" / p.name)
        # batch-N vs batch-1 XLA reductions differ in the last ulp only
        np.testing.assert_allclose(a, b, atol=1e-4)
        # --batch 0 (default): auto-sized by token count, same outputs
        np.testing.assert_allclose(
            np.load(tmp_path / "auto" / p.name), b, atol=1e-4)


def test_serve_http_sharded_database(tmp_path):
    """--mesh N: the daemon's database shards over N local devices and
    /search routes through the sharded engine twins — ids must equal the
    single-device server for every engine (exact / ivf / pq)."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(9)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))
    db = rng.standard_normal((37, 4 * 384)).astype(np.float32)  # 37 % 8 != 0
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    np.save(tmp_path / "db.npy", db)

    import argparse

    buf = io.BytesIO()
    Image.fromarray(
        (rng.random((70, 84, 3)) * 255).astype(np.uint8)
    ).save(buf, format="JPEG")
    img = buf.getvalue()

    def run_server(mesh, ivf=False, pq=False):
        args = argparse.Namespace(
            model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
            vocab_dir=str(vdir), checkpoint=None, quant=None,
            max_img_size=84, db=str(tmp_path / "db.npy"), ivf=ivf, pq=pq,
            pq_m=8, n_probe=4, mesh=mesh, host="127.0.0.1", port=0,
        )
        server = serve_http.build_server(args)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=30) as r:
                h = json.loads(r.read())
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search?k=3", data=img,
                method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
        finally:
            server.shutdown()
        return h, out

    for kw in ({}, {"ivf": True}, {"pq": True}):
        h1, o1 = run_server(0, **kw)
        h8, o8 = run_server(8, **kw)
        assert "+mesh8" in h8["engine"] and "+mesh" not in h1["engine"]
        assert o8["ids"] == o1["ids"], (kw, o1, o8)
        np.testing.assert_allclose(o8["scores"], o1["scores"], atol=1e-4)


def test_serve_http_rejects_extreme_aspect_images(tmp_path):
    """A 400 with a clear message — not a downstream stack/extractor
    crash — for images whose preprocessed dims fall below one 14-px
    patch (review round 5: a 2000x8 source at small max-img-size scales
    to 0 rows)."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from PIL import Image

    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines import serve_http

    rng = np.random.default_rng(11)
    vdir = tmp_path / "vocab"
    VLAD(4, cache_dir=str(vdir)).fit(
        rng.standard_normal((120, 384)).astype(np.float32))

    import argparse

    args = argparse.Namespace(
        model="dinov2_vits14", layer=5, facet="value", num_clusters=4,
        vocab_dir=str(vdir), checkpoint=None, quant=None, max_img_size=64,
        transfer_dtype="uint8", db=None, ivf=False, pq=False,
        host="127.0.0.1", port=0)
    server = serve_http.build_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        Image.fromarray(
            (rng.random((8, 2000, 3)) * 255).astype(np.uint8)
        ).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/describe", data=buf.getvalue(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            body = json.loads(e.read())
            assert e.code == 400 and "too small" in body["error"]
    finally:
        server.shutdown()


def test_desc_cache_identity_no_collisions(tmp_path, engine):
    """Round-5 engine review: the descriptor cache must key on the DATASET
    IDENTITY (paths + resolution), not just its class — and runs with
    different weights must never share a cache."""
    from anyloc_tpu.data.synthetic import build_gardens
    from anyloc_tpu.data.registry import get_dataset

    root_a = build_gardens(str(tmp_path / "a"), n_db=6, n_q=3,
                           size=(70, 70))
    root_b = build_gardens(str(tmp_path / "b"), n_db=6, n_q=3,
                           seed=9, size=(70, 70))  # same shape, new pixels
    ds_a = get_dataset("gardens", root_a, img_size=(70, 70))
    ds_b = get_dataset("gardens", root_b, img_size=(70, 70))

    e = DescriptorEngine(
        "dinov2_vits14", 5, "value", dtype="float32", batch_size=4,
        extractor=engine.extractor, cache_dir=str(tmp_path / "cache"))
    d_a = e.extract_dataset(ds_a, which="db", verbose=False)
    d_b = e.extract_dataset(ds_b, which="db", verbose=False)
    # same class, same shape, DIFFERENT images: must not cache-collide
    assert not np.allclose(np.asarray(d_a), np.asarray(d_b))
    # same dataset again: cache hit returns the same values
    np.testing.assert_allclose(
        np.asarray(e.extract_dataset(ds_a, which="db", verbose=False)),
        np.asarray(d_a), atol=1e-6)
    # same resolution-sensitivity: a resized view keys differently
    ds_a56 = get_dataset("gardens", root_a, img_size=(56, 56))
    d_a56 = e.extract_dataset(ds_a56, which="db", verbose=False)
    assert np.asarray(d_a56).shape != np.asarray(d_a).shape or not \
        np.allclose(np.asarray(d_a56), np.asarray(d_a))

    # different checkpoint config: distinct cache directory hash
    from anyloc_tpu.utils.desc_cache import DescriptorCache

    c1 = DescriptorCache(str(tmp_path / "cc"), {"model": "m",
                                                "checkpoint": None})
    c2 = DescriptorCache(str(tmp_path / "cc"), {"model": "m",
                                                "checkpoint": "/w.pth"})
    assert c1.dir != c2.dir
