"""Golden-fixture coverage for the ANN retrieval exits and the LSeg path.

Round-4 verdict item 4: `tests/test_e2e_oracle.py` locks the committed-JPEG
pipeline (decode -> trunk -> VLAD -> recall) through the EXACT device
engine only; the engines that would serve large databases — ivf / pq /
ivf_pq (`ops/ivf.py`, `ops/pq.py`, `ops/ivf_pq.py`, the IndexIVFFlat /
IndexPQ / IndexIVFPQ counterparts of the FAISS seam behind the reference's
`utilities.py:390-469`) — were unit-tested only in isolation. Here the SAME
real-JPEG VLAD descriptors exit through each approximate engine via
`get_top_k_recall(engine=...)` and must agree with the exact engine.

Also locks the last model family end-to-end: a synthetic-weight mini LSeg
encoder over the committed JPEGs -> per-image [H, W, D] `.npy` pixel-
descriptor caches -> `extras.lseg_vlad` (the reference's cache-consuming
ablation, `scripts/lseg_vlad.py:158-232`) -> solvable retrieval.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracles import (
    TorchMiniDino,
    center_crop_multiple_t,
    hooked_facet,
    preprocess_reference,
)
from test_e2e_oracle import (
    FIXTURE,
    LAYER,
    NC,
    RESIZE,
    TOP_K,
    _model_pair,
    _run_ours,
)

from anyloc_tpu.data.base import listdir_abs
from anyloc_tpu.ops.retrieval import get_top_k_recall

PQ_M, PQ_CODES = 16, 8  # 16 db rows: 8 codes/subspace is the max sane C


@pytest.fixture(scope="module")
def fixture_paths():
    db = listdir_abs(str(FIXTURE), "db")
    qu = listdir_abs(str(FIXTURE), "queries")
    gt = list(np.load(FIXTURE / "gt.npy", allow_pickle=True))
    return db, qu, gt


@pytest.fixture(scope="module")
def exact_run(fixture_paths, tmp_path_factory):
    """The committed-JPEG pipeline through the exact engine: VLAD
    descriptors + exact top-k (the baseline every ANN exit must match).
    Centers derive exactly as in test_e2e_oracle's certification (every-2nd
    db image, patch 7, first NC) so the fixture stays solvable."""
    from PIL import Image

    db, qu, gt = fixture_paths
    tm, _, _ = _model_pair()
    imgs = [center_crop_multiple_t(preprocess_reference(Image.open(p),
                                                        RESIZE), 14)
            for p in db]
    descs = hooked_facet(tm, torch.stack(imgs), LAYER, "value")
    centers = descs[::2, 7, :][:NC].numpy()
    tmp = tmp_path_factory.mktemp("ann_exact")
    dbv, quv, idx, recalls = _run_ours(fixture_paths, centers, tmp)
    assert recalls[1] == 1.0  # precondition: the fixture is solvable
    return {"dbv": dbv, "quv": quv, "idx": np.asarray(idx),
            "recalls": recalls, "gt": gt}


def _normed(x):
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_ivf_exit_matches_exact(exact_run):
    """engine='ivf' with n_probe >= n_cells scans every bucket: identical
    top-1 ranking and recalls to the exact device engine on the real-JPEG
    descriptors (ops/ivf.py probe geometry + id bookkeeping, e2e)."""
    r = exact_run
    dists, idx, recalls = get_top_k_recall(
        TOP_K, r["dbv"], r["quv"], r["gt"], engine="ivf", n_probe=64)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], r["idx"][:, 0])
    assert recalls == r["recalls"]


def test_ivf_partial_probe_still_solves_fixture(exact_run):
    """The actual ANN regime (n_probe < n_cells): the probed shortlist must
    still contain each query's re-visited scene (R@1 stays 1.0 — queries
    land in their match's cell on near-duplicate descriptors)."""
    r = exact_run
    _, idx, recalls = get_top_k_recall(
        TOP_K, r["dbv"], r["quv"], r["gt"], engine="ivf", n_probe=2)
    assert recalls[1] == 1.0, (recalls, np.asarray(idx)[:, 0])


def test_pq_exit_preserves_retrieval(exact_run):
    """engine='pq': ADC over 8-code x 16-subspace compressed rows keeps
    top-1 and recalls on the fixture (compression is lossy but the fixture's
    scenes are separable; ops/pq.py encode+scan e2e on real-JPEG VLADs)."""
    from anyloc_tpu.ops.pq import pq_fit

    r = exact_run
    index = pq_fit(_normed(r["dbv"]), PQ_M, n_codes=PQ_CODES,
                   method="cosine")
    _, idx, recalls = get_top_k_recall(
        TOP_K, r["dbv"], r["quv"], r["gt"], engine="pq", pq_index=index)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], r["idx"][:, 0])
    assert recalls == r["recalls"]


def test_ivf_pq_exit_preserves_retrieval(exact_run):
    """engine='ivf_pq': probed cells + residual codes (ops/ivf_pq.py) on
    the same descriptors — full probe isolates the PQ-residual error, which
    must not move top-1 or recalls on the fixture."""
    from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

    r = exact_run
    index = ivf_pq_fit(_normed(r["dbv"]), n_cells=4, m=PQ_M,
                       n_codes=PQ_CODES, method="cosine")
    _, idx, recalls = get_top_k_recall(
        TOP_K, r["dbv"], r["quv"], r["gt"], engine="ivf_pq",
        ivf_pq_index=index, n_probe=4)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], r["idx"][:, 0])
    assert recalls == r["recalls"]


def test_lseg_vlad_e2e_fixture(fixture_paths, tmp_path):
    """LSeg path locked end-to-end on the committed JPEGs: mini LSegEncoder
    (synthetic weights, the tested torch-oracle geometry of test_lseg) ->
    [H/2, W/2, D] unit-norm pixel caches -> extras.lseg_vlad -> the fixture
    retrieves perfectly. The encoder is a deterministic feature map, so
    near-duplicate query scenes must land on their db match regardless of
    weight values — the same property the reference ablation relies on."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from test_lseg import (DEPTH, FEATURES, HEADS, HOOKS, OUT_DIM, REASM,
                           D as LSEG_D)

    from anyloc_tpu.data.transforms import load_image
    from anyloc_tpu.models.lseg import (LSegConfig, LSegEncoder,
                                        lseg_backbone_config)
    from anyloc_tpu.pipelines.extras import lseg_vlad

    db, qu, gt = fixture_paths
    # test_lseg's mini geometry, at 128 px: the 64-px oracle shape is too
    # coarse to separate the fixture's 16 scenes (measured R@1 0.625);
    # 8x8 patch grid -> 64x64 pixel features solves it
    IMG = 128
    bc = dataclasses.replace(
        lseg_backbone_config(dtype=jnp.float32, img_size=IMG),
        patch_size=16, embed_dim=LSEG_D, depth=DEPTH, num_heads=HEADS)
    cfg = LSegConfig(backbone=bc, hooks=HOOKS, reassemble_dims=REASM,
                     features=FEATURES, out_dim=OUT_DIM, use_bn=True)
    enc = LSegEncoder(cfg)
    imgs = np.stack([load_image(p, (IMG, IMG)) for p in db + qu])
    params = enc.init(jax.random.PRNGKey(0), imgs[:1])
    feats = np.asarray(enc.apply(params, jnp.asarray(imgs)))
    assert feats.shape == (len(db) + len(qu), IMG // 2, IMG // 2,
                           cfg.out_dim)

    db_dir, qu_dir = tmp_path / "db", tmp_path / "queries"
    db_dir.mkdir(), qu_dir.mkdir()
    for i in range(len(db)):
        np.save(db_dir / f"{i:03d}.npy", feats[i])
    for j in range(len(qu)):
        np.save(qu_dir / f"{j:03d}.npy", feats[len(db) + j])

    dists, idx, recalls = lseg_vlad(
        str(db_dir), str(qu_dir), gt, num_clusters=8, top_k_vals=TOP_K)
    assert recalls[1] == 1.0, (recalls, np.asarray(idx)[:, 0])
    for j, pos in enumerate(gt):
        assert np.asarray(idx)[j, 0] in np.asarray(pos)
