"""Tests for the long-tail pipelines (clip_top_k / patch_clip / multilayer /
sliding-window / contrastive MLP / PCA tools) + the extractor factory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.synthetic import build_gardens
from anyloc_tpu.pipelines.clip_pipelines import run_clip_top_k, run_patch_clip, unfold_crops
from anyloc_tpu.pipelines.extras import (
    ContrastiveMLP,
    contrastive_loss,
    joint_pca_project,
    make_contrastive_train_step,
    multilayer_vlad,
    pca_downsample_experiment,
    sliding_window_scores,
    sliding_window_vlad,
)


@pytest.fixture(scope="module")
def gardens_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return build_gardens(str(root), n_db=8, n_q=4, size=(64, 64))


@pytest.fixture(scope="module")
def tiny_clip_args(gardens_root):
    from anyloc_tpu.models import clip as C

    C._VISION.setdefault("ViT-Tiny/16", (16, 32, 2, 4, 16, 32))
    C._TEXT.setdefault("ViT-Tiny/16", (77, 1000, 16, 4, 2))
    largs = PipelineArgs()
    largs.prog.data_vg_dir = gardens_root
    largs.prog.vg_dataset_name = "gardens"
    largs.bd_args.resize = (64, 64)
    largs.extractor.model_type = "clip_ViT-Tiny/16"
    largs.extractor.batch_size = 4
    largs.vlad.num_clusters = 4
    largs.top_k_vals = [1, 3]
    return largs


def test_clip_top_k_pipeline(tiny_clip_args):
    results = run_clip_top_k(tiny_clip_args, verbose=False)
    assert "R@1" in results and 0 <= results["R@1"] <= 1
    assert results["Agg-Method"] == "CLIP-global"


def test_patch_clip_pipeline(tiny_clip_args):
    results = run_patch_clip(tiny_clip_args, num_patches=2, verbose=False)
    assert results["Agg-Method"] == "Patch-CLIP-VLAD"
    assert "R@1" in results


def test_unfold_crops_shape(rng):
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    crops = unfold_crops(imgs, num_patches=4)
    # kernel = stride = 32 -> 2x2 grid
    assert crops.shape == (2, 4, 32, 32, 3)
    np.testing.assert_allclose(crops[:, 0], imgs[:, :32, :32])


def test_multilayer_vlad(rng):
    layers = [rng.standard_normal((4, 20, 8)).astype(np.float32) for _ in range(3)]
    out = multilayer_vlad(layers, num_clusters=2)
    assert out.shape == (4, 3 * 2 * 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_sliding_window_vlad_and_scores(rng):
    descs = rng.standard_normal((3, 16, 8)).astype(np.float32)
    centers = rng.standard_normal((2, 8)).astype(np.float32)
    wins = sliding_window_vlad(descs, (4, 4), centers, window=2, stride=2)
    assert wins.shape == (3, 4, 16)
    scores = sliding_window_scores(wins, wins[:2])
    assert scores.shape == (2, 3)
    # self-match is the max score per row
    assert np.argmax(scores[0]) == 0 and np.argmax(scores[1]) == 1


def test_contrastive_loss_prefers_positives(rng):
    emb = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    pos = emb[:, None, :] + 0.01  # near-identical positives
    neg = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    good = float(contrastive_loss(emb, pos, neg))
    bad = float(contrastive_loss(emb, neg[:, :1], neg))
    assert good < bad


def test_contrastive_mlp_trains(rng):
    mlp = ContrastiveMLP(out_dim=8)
    anchor = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    pos = anchor[:, None, :] + 0.05
    neg = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), anchor)
    opt = optax.adam(1e-2)
    step = make_contrastive_train_step(mlp, opt)
    opt_state = opt.init(params)
    losses = []
    for _ in range(10):
        params, opt_state, l = step(params, opt_state, anchor, pos, neg)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_joint_pca_project(rng):
    sets = {
        "a": rng.standard_normal((30, 16)).astype(np.float32),
        "b": rng.standard_normal((20, 16)).astype(np.float32),
    }
    out = joint_pca_project(sets, 4)
    assert out["a"].shape == (30, 4) and out["b"].shape == (20, 4)


def test_pca_downsample_experiment(rng):
    db = rng.standard_normal((40, 32)).astype(np.float32)
    qu = db[:6] + 0.01 * rng.standard_normal((6, 32)).astype(np.float32)
    gt = [np.array([i]) for i in range(6)]
    res = pca_downsample_experiment(db, qu, gt, dims=[4, 16], top_k=(1,))
    assert set(res) == {4, 16}
    assert res[16][1] >= res[4][1] - 0.5  # more dims never much worse here


def test_extractor_factory_families(rng):
    """Every family constructs and produces sane descriptor shapes."""
    from anyloc_tpu.models.factory import make_extractor

    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    d1 = make_extractor("dino_vits8", layer=2, facet="key", stride=8,
                        dtype=jnp.float32)
    # dino_vits8 has 12 layers but we only run to layer 2
    out = d1(jnp.asarray(img))
    assert out.shape == (1, 16, 384)
    mae = make_extractor("mae_vit_base_patch16", dtype=jnp.float32)
    # mae config is 224px; skip heavy call, just check attrs
    assert mae.cfg.patch_size == 16


def test_lseg_vlad_cached_pipeline(tmp_path, rng):
    """scripts/lseg_vlad.py route: VLAD + recall over cached [H, W, D]
    pixel-descriptor .npy files (the reference never runs the LSeg model in
    this script either — caches come from a separate env)."""
    from anyloc_tpu.pipelines.extras import lseg_vlad

    db_dir = tmp_path / "db"; qu_dir = tmp_path / "qu"
    db_dir.mkdir(); qu_dir.mkdir()
    base = rng.standard_normal((6, 8, 8, 16)).astype(np.float32)
    for i in range(6):
        np.save(db_dir / f"im{i:03d}.npy", base[i])
    for j, src in enumerate([0, 3, 5]):
        np.save(qu_dir / f"q{j:03d}.npy",
                base[src] + 0.05 * rng.standard_normal((8, 8, 16)).astype(np.float32))
    gt = [np.array([0]), np.array([3]), np.array([5])]
    dists, idx, recalls = lseg_vlad(
        str(db_dir), str(qu_dir), gt, num_clusters=4, top_k_vals=[1, 3],
    )
    assert recalls[1] == 1.0 and np.asarray(idx)[:, 0].tolist() == [0, 3, 5]
    # pixel sub-sampling halves the grid but keeps retrieval solvable
    _, idx2, r2 = lseg_vlad(
        str(db_dir), str(qu_dir), gt, num_clusters=4, top_k_vals=[1],
        sub_sample_pixels=2, sub_sample_db_vlad=3,
    )
    assert r2[1] == 1.0


def test_extract_multilayer_single_pass(rng):
    """ViTFacetExtractor.extract_multilayer == per-layer extraction, one
    trunk pass (feeds multilayer_vlad — dino_multilayer_vlad.py)."""
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.models.vit import ViTConfig

    cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=5,
                    num_heads=2, mlp_type="mlp", layerscale_init=1e-5,
                    dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)).astype(np.float32))
    ex = ViTFacetExtractor(cfg, params, layer=4, facet="value")
    multi = ex.extract_multilayer(img, [1, 4])
    for layer in (1, 4):
        single = ViTFacetExtractor(cfg, params, layer=layer, facet="value")(img)
        np.testing.assert_allclose(np.asarray(multi[layer]),
                                   np.asarray(single), atol=1e-6)
# --- appended to tests/test_extras.py ---


class TestExamplesScripts:
    """examples/trivial_vpr_with_clip.py + examples/vpr_residuals.py routes."""

    def _mk_imgs(self, tmp_path, n=8):
        from PIL import Image

        files = []
        rng = np.random.default_rng(0)
        for i in range(n):
            p = tmp_path / f"img_{i:03d}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            ).save(p)
            files.append(str(p))
        return files

    def test_trivial_clip_vpr_clusters_and_buckets(self, tmp_path):
        from anyloc_tpu.pipelines.extras import trivial_clip_vpr

        files = self._mk_imgs(tmp_path, n=8)
        rng = np.random.default_rng(1)
        # two well-separated descriptor groups -> clustering must split them
        base = rng.normal(size=(2, 16)).astype(np.float32) * 10

        def encode(path):
            i = int(path.split("_")[-1].split(".")[0])
            return base[i % 2] + rng.normal(size=16).astype(np.float32) * 0.01

        feat_dir = str(tmp_path / "feats")
        save_dir = str(tmp_path / "buckets")
        descs, labels = trivial_clip_vpr(
            files, encode, feat_dir=feat_dir, n_clusters=2, save_dir=save_dir
        )
        assert descs.shape == (8, 16)
        # descriptors are L2-normalized like the reference (:83)
        np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0, atol=1e-5)
        # the two synthetic groups land in distinct clusters
        assert len(set(labels[::2])) == 1 and len(set(labels[1::2])) == 1
        assert labels[0] != labels[1]
        # feature cache written and bucketed copies exist
        assert len(list((tmp_path / "feats").glob("*.npy"))) == 8
        bucketed = sorted((tmp_path / "buckets").rglob("*.jpg"))
        assert len(bucketed) == 8
        # cache round-trip: rerun with a crashing encoder (must hit cache)
        def boom(path):  # pragma: no cover - must not be called
            raise AssertionError("cache miss")

        descs2, _ = trivial_clip_vpr(
            files, boom, feat_dir=feat_dir, n_clusters=2
        )
        np.testing.assert_allclose(descs2, descs, atol=0)

    def test_trivial_clip_vpr_stride_and_pca(self, tmp_path):
        from anyloc_tpu.pipelines.extras import trivial_clip_vpr

        files = self._mk_imgs(tmp_path, n=8)
        rng = np.random.default_rng(2)

        def encode(path):
            return rng.normal(size=32).astype(np.float32)

        descs, labels = trivial_clip_vpr(
            files, encode, stride=2, n_clusters=2, use_pca=True, n_components=3
        )
        assert descs.shape == (4, 32) and labels.shape == (4,)

    def test_residual_vpr_recovers_matches(self):
        from anyloc_tpu.pipelines.extras import residual_vpr

        rng = np.random.default_rng(3)
        db = rng.normal(size=(20, 24)).astype(np.float32)
        qu = db[:10] + rng.normal(size=(10, 24)).astype(np.float32) * 0.01
        gt = [[i] for i in range(10)]
        out = residual_vpr(db, qu, gt, cluster_sizes=(2, 4), top_k=(1, 5))
        assert set(out) == {2, 4}
        for c in out:
            assert out[c][1] == 1.0  # near-duplicates must retrieve @1
            assert out[c][5] >= out[c][1]

    def test_residual_vpr_matches_torch_oracle(self):
        """The enhanced vector equals the reference's
        get_enhanced_residual_vector (examples/vpr_residuals.py:31-48)."""
        import torch

        from anyloc_tpu.ops.pca import concat_desc_dists_clusters

        rng = np.random.default_rng(4)
        descs = rng.normal(size=(6, 8)).astype(np.float32)
        cents = rng.normal(size=(3, 8)).astype(np.float32)

        td, tc = torch.from_numpy(descs), torch.from_numpy(cents)
        res = torch.zeros(6, 8 * 3)
        for c in range(3):
            cur = td - tc[c]
            res[:, c * 8 : (c + 1) * 8] = torch.nn.functional.normalize(cur, p=2.0)
        res = torch.nn.functional.normalize(res, p=2.0, dim=-1)

        ours = np.asarray(concat_desc_dists_clusters(cents, descs))
        np.testing.assert_allclose(ours, res.numpy(), atol=1e-5)
