"""int8 W8A8 quantized-trunk tests (ops/quant.py + ViTConfig.quant).

The reference has no quantization; this is a TPU-native addition (v5e int8
MXU = 2x bf16). Correctness here = quantized math tracks f32 within int8
noise, and the quantized trunk's descriptors stay rank-consistent with bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyloc_tpu.ops.quant import (
    int8_matmul,
    qdense,
    quantize_rows,
    quantize_tree,
    quantize_vit_params,
    quantize_weight_cols,
)


class TestQuantMath:
    def test_quantize_rows_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 64)), jnp.float32)
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8 and s.shape == (16, 1)
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
        # max error is half a quantization step = scale/2
        assert (err <= np.asarray(s) * 0.51).all()

    def test_quantize_weight_cols_roundtrip(self):
        w = jnp.asarray(np.random.default_rng(1).standard_normal((64, 32)), jnp.float32)
        q, s = quantize_weight_cols(w)
        assert q.dtype == jnp.int8 and s.shape == (32,)
        err = np.abs(np.asarray(q, np.float32) * np.asarray(s)[None] - np.asarray(w))
        assert (err <= np.asarray(s)[None] * 0.51).all()

    def test_int8_matmul_matches_f32(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
        xq, xs = quantize_rows(x)
        wq, ws = quantize_weight_cols(w)
        got = np.asarray(int8_matmul(xq, wq, xs, ws, out_dtype=jnp.float32))
        want = np.asarray(x @ w)
        # int8 relative error ~ 1/127 per factor; rms tolerance
        rms = np.sqrt(np.mean((got - want) ** 2)) / np.sqrt(np.mean(want ** 2))
        assert rms < 0.02, rms

    def test_qdense_bias_and_shape(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 5, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
        wq, ws = quantize_weight_cols(w)
        out = qdense(x, wq, ws, b, out_dtype=jnp.float32)
        assert out.shape == (2, 5, 64)
        want = np.asarray(x @ w + b)
        rms = np.sqrt(np.mean((np.asarray(out) - want) ** 2))
        assert rms < 0.05 * np.sqrt(np.mean(want ** 2))


class TestQuantTrunk:
    @pytest.fixture(scope="class")
    def small_cfg(self):
        from anyloc_tpu.models.vit import ViTConfig

        return dict(
            img_size=56, patch_size=14, embed_dim=128, depth=3, num_heads=4,
            layerscale_init=1e-5, attn_impl="xla",
        )

    def test_quantize_tree_structure(self, small_cfg):
        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViTConfig

        cfg = ViTConfig(**small_cfg)
        params = init_params(cfg, seed=0)
        qparams = quantize_tree(params, min_size=1)
        blk = qparams["params"]["blocks_0"]
        assert "kernel_q" in blk["attn"]["qkv"]
        assert "kernel_scale" in blk["attn"]["qkv"]
        assert "kernel" not in blk["attn"]["qkv"]
        assert blk["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
        # LayerNorm / LayerScale untouched
        assert "scale" in blk["norm1"]
        assert "gamma" in blk["ls1"]
        # patch-embed conv kernel untouched (4-D)
        assert qparams["params"]["patch_embed"]["kernel"].ndim == 4

    def test_quant_trunk_tracks_bf16(self, small_cfg):
        """Descriptors from the int8 trunk stay close to the f32 trunk's on
        the value facet (per-image cosine similarity)."""
        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViT, ViTConfig

        cfg = ViTConfig(**small_cfg)
        qcfg = ViTConfig(**small_cfg, quant="int8")
        params = init_params(cfg, seed=0)
        qparams = quantize_tree(params, min_size=1)

        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 56, 56, 3)), jnp.float32
        )
        ref = ViT(cfg).apply(params, imgs, capture_layer=2, capture_facet="value")
        got = ViT(qcfg).apply(qparams, imgs, capture_layer=2, capture_facet="value")
        assert got.shape == ref.shape
        a = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
        b = np.asarray(got, np.float64).reshape(-1, ref.shape[-1])
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )
        assert cos.min() > 0.99, cos.min()

    def test_quant_init_params_shape_true(self, small_cfg):
        """Random init of the quant config produces the same tree structure
        as quantize_tree of a converted checkpoint (bench/dryrun path)."""
        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViTConfig

        qcfg = ViTConfig(**small_cfg, quant="int8")
        qparams = init_params(qcfg, seed=0)
        blk = qparams["params"]["blocks_0"]
        assert blk["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
        assert blk["mlp"]["fc1"]["kernel_scale"].shape == (512,)

    def test_quantize_vit_params_matches_quant_init_tree(self, small_cfg):
        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViTConfig

        cfg = ViTConfig(**small_cfg)
        qcfg = ViTConfig(**small_cfg, quant="int8")
        qparams = quantize_tree(init_params(cfg, seed=0), min_size=1)
        want = jax.tree_util.tree_structure(init_params(qcfg, seed=0))
        got = jax.tree_util.tree_structure(qparams)
        assert got == want


def test_int8_full_preserves_retrieval_ranking():
    """End-to-end quality evidence for the int8_full trunk: VLAD descriptors
    from the quantized trunk must produce the same retrieval ranking as the
    f32 trunk on a synthetic VPR problem (the R@1-within-0.3% budget,
    BASELINE.md; real-checkpoint validation via tools/parity_check.py)."""
    import dataclasses

    import jax
    import numpy as np

    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViT, ViTConfig
    from anyloc_tpu.ops.quant import quantize_vit_params
    from anyloc_tpu.ops.retrieval import get_top_k_recall
    from anyloc_tpu.ops.vlad import VLAD

    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=3,
                    num_heads=4, mlp_type="swiglu_fused",
                    layerscale_init=1e-5, attn_impl="xla",
                    dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    qcfg = dataclasses.replace(cfg, quant="int8_full")
    qp = quantize_vit_params(params, mode="int8_full", min_size=1)

    rng = np.random.default_rng(0)
    db_imgs = rng.standard_normal((10, 56, 56, 3)).astype(np.float32) * 0.5
    qu_imgs = db_imgs[:4] + 0.02 * rng.standard_normal(
        (4, 56, 56, 3)
    ).astype(np.float32)

    def descs(model, p, imgs):
        f = model.apply(p, jnp.asarray(imgs), capture_layer=2,
                        capture_facet="value")
        return np.asarray(f, np.float32)[:, 1:]

    gt = [np.array([i]) for i in range(4)]
    recalls = {}
    for name, (m, p) in {
        "f32": (ViT(cfg), params), "int8": (ViT(qcfg), qp)
    }.items():
        v = VLAD(num_clusters=4)
        dv = v.fit_and_generate(descs(m, p, db_imgs))
        qv = v.generate_multi(descs(m, p, qu_imgs))
        _, idx, rec = get_top_k_recall([1, 5], dv, qv, gt)
        recalls[name] = (idx[:, 0].tolist(), rec)
    assert recalls["f32"][0] == recalls["int8"][0], recalls
    assert recalls["f32"][1] == recalls["int8"][1], recalls


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """int8 param trees (kernel_q int8 + kernel_scale f32) must survive an
    orbax save/restore — the serving deployment path stores quantized
    checkpoints directly."""
    import jax.numpy as jnp

    from anyloc_tpu.models.dinov2 import dinov2_config
    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    import dataclasses
    import jax

    cfg = dataclasses.replace(
        dinov2_config("dinov2_vits14", dtype=jnp.float32), quant="int8_full"
    )
    params = init_params(cfg, seed=0)
    save_checkpoint(str(tmp_path / "ck"), {"params": params}, is_best=False)
    restored = load_checkpoint(str(tmp_path / "ck" / "last_checkpoint"))["params"]
    flat0 = jax.tree_util.tree_leaves_with_path(params)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(restored)}
    assert any("kernel_q" in jax.tree_util.keystr(k) for k, _ in flat0)
    for k, v in flat0:
        ks = jax.tree_util.keystr(k)
        assert ks in flat1, ks
        assert flat1[ks].dtype == v.dtype, ks
        np.testing.assert_array_equal(np.asarray(flat1[ks]), np.asarray(v))


def test_int8_full_deep_trunk_accumulation():
    """Quantization error ACCUMULATION evidence at depth (the round-1
    concern: facet cosine was only measured on shallow test trunks, while
    the flagship runs 31 quantized blocks): a depth-12 ViT-S-geometry trunk
    (384-d, head_dim 64 — the real int8 kernel geometry) over the committed
    real-JPEG fixture. Facet cosine vs the f32 trunk must stay high at
    layer 11, and VLAD retrieval must be unchanged."""
    import dataclasses
    import pathlib

    import jax.numpy as jnp

    from anyloc_tpu.data.transforms import center_crop_multiple, load_image
    from anyloc_tpu.models.dinov2 import dinov2_config
    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.ops.quant import quantize_vit_params
    from anyloc_tpu.ops.retrieval import top_k_search
    from anyloc_tpu.ops.vlad import vlad_aggregate

    fixture = pathlib.Path(__file__).parent / "fixtures" / "e2e"
    paths = sorted((fixture / "db").glob("*.jpg"))[:8]
    imgs = np.stack([
        center_crop_multiple(load_image(str(p), (160, 160)), 14)
        for p in paths
    ])
    cfg = dinov2_config("dinov2_vits14", dtype=jnp.float32)  # depth 12
    params = init_params(cfg, seed=11)
    layer = cfg.depth - 1
    f32 = np.asarray(
        ViTFacetExtractor(cfg, params, layer, "value")(jnp.asarray(imgs))
    )
    qcfg = dataclasses.replace(cfg, quant="int8_full")
    qparams = quantize_vit_params(params, "int8_full")
    q = np.asarray(
        ViTFacetExtractor(qcfg, qparams, layer, "value")(jnp.asarray(imgs))
    )
    cos = (f32 * q).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-12
    )
    # 12 quantized blocks of accumulation on real image content
    assert np.median(cos) > 0.99, float(np.median(cos))
    assert cos.min() > 0.95, float(cos.min())

    centers = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, cfg.embed_dim)),
        jnp.float32,
    )
    v_f = np.asarray(vlad_aggregate(jnp.asarray(f32), centers))
    v_q = np.asarray(vlad_aggregate(jnp.asarray(q), centers))
    # self-retrieval ranking stability: int8 queries against the f32 db
    _, idx = top_k_search(v_f, v_q, 1)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(len(paths)))
