"""Retrieval / Recall@K tests vs brute-force numpy (FAISS-semantics oracle)."""

import numpy as np
import pytest

from anyloc_tpu.ops.retrieval import (
    compute_recalls,
    get_top_k_recall,
    top_k_search,
    top_k_search_blocked,
)


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@pytest.mark.parametrize("method", ["cosine", "l2"])
def test_top_k_matches_bruteforce(rng, method):
    db = rng.standard_normal((200, 32)).astype(np.float32)
    qu = rng.standard_normal((17, 32)).astype(np.float32)
    scores, idx = top_k_search(db, qu, 5, method)
    scores, idx = np.asarray(scores), np.asarray(idx)
    if method == "cosine":
        full = (qu.astype(np.float64) @ db.T.astype(np.float64))
        order = np.argsort(-full, axis=1)[:, :5]
    else:
        full = ((qu[:, None, :].astype(np.float64) - db[None, :, :]) ** 2).sum(-1)
        order = np.argsort(full, axis=1)[:, :5]
    # f32 device scores can flip near-ties vs the f64 oracle: require the
    # *scores at our indices* to match the oracle's top scores, and exact
    # index equality wherever the oracle's score gap is decisive.
    ours_at = np.take_along_axis(full, idx, axis=1)
    expect = np.take_along_axis(full, order, axis=1)
    np.testing.assert_allclose(ours_at, expect, atol=1e-4)
    decisive = np.abs(expect - np.roll(expect, -1, axis=1)) > 1e-4
    decisive[:, -1] = False
    np.testing.assert_array_equal(idx[decisive[:, :5]], order[decisive[:, :5]])
    np.testing.assert_allclose(scores, expect, atol=1e-3)


@pytest.mark.parametrize("method", ["cosine", "l2"])
def test_blocked_search_matches_monolithic(rng, method):
    db = rng.standard_normal((500, 16)).astype(np.float32)
    qu = rng.standard_normal((40, 16)).astype(np.float32)
    s0, i0 = top_k_search(db, qu, 10, method)
    s1, i1 = top_k_search_blocked(db, qu, 10, method, query_block=16, db_block=128)
    np.testing.assert_array_equal(np.asarray(i0), i1)
    np.testing.assert_allclose(np.asarray(s0), s1, atol=1e-3)


def test_recall_hand_computed():
    # 3 queries, retrievals of length 3; GT positives chosen so that
    # q0 hits at rank 1, q1 at rank 3, q2 never.
    indices = np.array([[5, 9, 1], [7, 3, 2], [0, 1, 2]])
    gt = [np.array([5]), np.array([2, 11]), np.array([9])]
    rec = compute_recalls(indices, gt, [1, 2, 3], use_percentage=False)
    assert rec == {1: 1, 2: 1, 3: 2}
    rec_pct = compute_recalls(indices, gt, [1, 3])
    assert rec_pct == {1: 1 / 3, 3: 2 / 3}


def test_recall_subsample_correction():
    """Reference semantics (utilities.py:453-465): retrieved db indices are
    multiplied by sub_sample_db and query index by sub_sample_qu into gt."""
    indices = np.array([[1], [2]])  # retrieved sub-sampled db idx
    # full-resolution gt list: queries at 0 and 2 (sub_sample_qu=2)
    gt = [np.array([2]), None, np.array([99])]
    rec = compute_recalls(
        indices, gt, [1], use_percentage=False, sub_sample_db=2, sub_sample_qu=2
    )
    assert rec == {1: 1}  # q0: 1*2=2 in gt[0]; q1: 2*2=4 not in gt[2]


def test_get_top_k_recall_end_to_end(rng):
    d = 16
    db = _normalize(rng.standard_normal((50, d)).astype(np.float32))
    # Queries = slightly noised db items, so R@1 should be near-perfect.
    qu = _normalize(db[:10] + 0.01 * rng.standard_normal((10, d)).astype(np.float32))
    gt = [np.array([i]) for i in range(10)]
    dists, idx, recalls = get_top_k_recall([1, 5], db, qu, gt)
    assert dists.shape == (10, 5) and idx.shape == (10, 5)
    assert recalls[1] == 1.0 and recalls[5] == 1.0


def test_get_top_k_recall_1d_query(rng):
    db = rng.standard_normal((20, 8)).astype(np.float32)
    qu = db[3].copy()
    _, idx, recalls = get_top_k_recall([1], db, qu, [np.array([3])])
    assert idx[0, 0] == 3 and recalls[1] == 1.0


@pytest.mark.parametrize("stream_dtype", ["bfloat16", "int8"])
@pytest.mark.parametrize("method", ["cosine", "l2"])
def test_blocked_search_narrow_stream_dtypes(rng, method, stream_dtype):
    """Narrow streaming dtypes must preserve the ranking on separated data
    (bf16 keeps ~3 significant digits; int8 per-row quantization ~0.4% of the
    row max — both far below the margins of distinct clusters)."""
    centers = rng.standard_normal((50, 32)).astype(np.float32) * 10.0
    db = centers + 0.01 * rng.standard_normal((50, 32)).astype(np.float32)
    qu = centers[:12] + 0.01 * rng.standard_normal((12, 32)).astype(np.float32)
    s0, i0 = top_k_search(db, qu, 5, method)
    s1, i1 = top_k_search_blocked(
        db, qu, 5, method, query_block=5, db_block=16, stream_dtype=stream_dtype
    )
    np.testing.assert_array_equal(np.asarray(i0)[:, 0], i1[:, 0])
    # score error must stay far below the gap between the best hit and the
    # other clusters (the quantity that decides rankings) — absolute errors
    # can exceed the near-zero best-match l2 distances themselves.
    s0 = np.asarray(s0)
    spread = np.maximum(s0.max(axis=1) - s0.min(axis=1), 1e-6)[:, None]
    assert (np.abs(s1 - s0) / spread).max() < 0.05


def test_blocked_search_ragged_tail_blocks(rng):
    """DB and query sizes that don't divide the block sizes."""
    db = rng.standard_normal((333, 24)).astype(np.float32)
    qu = rng.standard_normal((29, 24)).astype(np.float32)
    s0, i0 = top_k_search(db, qu, 7, "cosine")
    s1, i1 = top_k_search_blocked(db, qu, 7, "cosine", query_block=8, db_block=100)
    np.testing.assert_array_equal(np.asarray(i0), i1)
    np.testing.assert_allclose(np.asarray(s0), s1, atol=1e-3)


def test_get_top_k_recall_engines_agree(rng):
    """device / blocked / native engines return identical recalls."""
    from anyloc_tpu import native
    from anyloc_tpu.ops.retrieval import get_top_k_recall

    db = rng.standard_normal((60, 24)).astype(np.float32)
    qu = db[:8] + 0.01 * rng.standard_normal((8, 24)).astype(np.float32)
    gt = [np.array([i]) for i in range(8)]
    engines = ["device", "blocked"] + (["native"] if native.available() else [])
    results = {e: get_top_k_recall([1, 5], db, qu, gt, engine=e) for e in engines}
    base = results["device"]
    for e in engines:
        d, i, rec = results[e]
        assert rec == base[2], e
        np.testing.assert_array_equal(i[:, 0], base[1][:, 0], err_msg=e)


def test_blocked_search_empty_inputs(rng):
    db = rng.standard_normal((10, 8)).astype(np.float32)
    s, i = top_k_search_blocked(np.empty((0, 8), np.float32), db[:3], 5)
    assert s.shape == (3, 0) and i.shape == (3, 0)
    s, i = top_k_search_blocked(db, np.empty((0, 8), np.float32), 5)
    assert s.shape == (0, 5) and i.shape == (0, 5)


@pytest.mark.parametrize("method", ["cosine", "l2"])
def test_device_bf16_scoring_preserves_ranking(rng, method):
    """score_dtype='bfloat16' (1.65x qps) must agree with exact scoring on
    data with real margins."""
    centers = rng.standard_normal((60, 64)).astype(np.float32) * 5.0
    db = centers + 0.01 * rng.standard_normal((60, 64)).astype(np.float32)
    qu = centers[:10] + 0.01 * rng.standard_normal((10, 64)).astype(np.float32)
    s0, i0 = top_k_search(db, qu, 5, method)
    s1, i1 = top_k_search(db, qu, 5, method, score_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(i0)[:, 0], np.asarray(i1)[:, 0])


class TestIVF:
    """ops/ivf.py — the IndexIVFFlat counterpart (probed approximate
    search with an exact overflow pool)."""

    @pytest.mark.parametrize("method", ["cosine", "l2"])
    def test_full_probe_equals_exact(self, rng, method):
        from anyloc_tpu.ops.ivf import ivf_fit
        from anyloc_tpu.ops.retrieval import top_k_search

        db = rng.standard_normal((600, 24)).astype(np.float32)
        qu = db[::30] + 0.01 * rng.standard_normal((20, 24)).astype(np.float32)
        index = ivf_fit(db, 16, method=method, bucket_factor=1.2, seed=1)
        # tight bucket_factor forces the overflow pool into play
        assert index.overflow.shape[0] > 0 or index.bucket_ids.size >= 600
        s_ivf, i_ivf = index.search(qu, 5, n_probe=16, query_block=8)
        import jax.numpy as jnp

        s_ex, i_ex = top_k_search(
            jnp.asarray(db), jnp.asarray(qu), 5, method=method)
        np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(i_ex))
        np.testing.assert_allclose(np.asarray(s_ivf), np.asarray(s_ex),
                                   atol=1e-5)

    def test_partial_probe_recall(self, rng):
        from anyloc_tpu.ops.ivf import ivf_fit

        db = rng.standard_normal((1000, 16)).astype(np.float32)
        qu = db[::50] + 0.005 * rng.standard_normal((20, 16)).astype(np.float32)
        index = ivf_fit(db, 32, method="l2", seed=2)
        _, i1 = index.search(qu, 1, n_probe=4)
        # near-duplicate queries: the home cell is probed first
        assert (np.asarray(i1)[:, 0] == np.arange(0, 1000, 50)).mean() >= 0.9

    def test_recall_engine_parity(self, rng):
        """get_top_k_recall(engine='ivf') == the device engine on separated
        data when probing every cell."""
        from anyloc_tpu.ops.ivf import ivf_fit
        from anyloc_tpu.ops.retrieval import get_top_k_recall

        db = rng.standard_normal((300, 16)).astype(np.float32)
        qu = db[::20] + 0.01 * rng.standard_normal((15, 16)).astype(np.float32)
        gt = [np.array([i * 20]) for i in range(15)]
        _, _, r_dev = get_top_k_recall([1, 5], db, qu, gt)
        dbn = db / np.linalg.norm(db, axis=-1, keepdims=True)
        index = ivf_fit(dbn, 8, seed=3)
        _, _, r_ivf = get_top_k_recall(
            [1, 5], db, qu, gt, engine="ivf", ivf_index=index, n_probe=8)
        assert r_ivf == r_dev
        # fit-on-the-fly route
        _, _, r_fly = get_top_k_recall(
            [1, 5], db, qu, gt, engine="ivf", n_probe=50)
        assert r_fly == r_dev

    def test_k_clamped_and_empty_queries(self, rng):
        """k beyond the shortlist/database clamps (like the exact engines
        clamp to N); empty query sets return empty results; non-f32
        score_dtype is rejected rather than silently ignored."""
        from anyloc_tpu.ops.ivf import ivf_fit
        from anyloc_tpu.ops.retrieval import get_top_k_recall

        db = rng.standard_normal((50, 8)).astype(np.float32)
        index = ivf_fit(db, 4, method="l2", seed=0)
        qu = db[:3]
        s, i = index.search(qu, 10_000, n_probe=1)
        assert s.shape[1] <= 50 and i.shape == s.shape
        s0, i0 = index.search(np.zeros((0, 8), np.float32), 5)
        assert s0.shape[0] == 0 and i0.shape[0] == 0
        with pytest.raises(ValueError):
            get_top_k_recall([1], db, qu, [np.array([0])] * 3,
                             engine="ivf", score_dtype="bfloat16")

    def test_save_load_roundtrip(self, rng, tmp_path):
        from anyloc_tpu.ops.ivf import ivf_fit, load_ivf, save_ivf

        db = rng.standard_normal((100, 8)).astype(np.float32)
        index = ivf_fit(db, 8, seed=0)
        p = str(tmp_path / "index.npz")
        save_ivf(index, p)
        back = load_ivf(p)
        qu = db[:5]
        s1, i1 = index.search(qu, 3)
        s2, i2 = back.search(qu, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
        assert back.method == index.method and back.n_rows == 100


def test_blocked_engine_memmap_db(rng, tmp_path):
    """engine='blocked' with an np.memmap database: the streaming search
    reads shard slices straight off disk (no full-db RAM materialization) —
    the beyond-RAM composition the engine's docstring promises."""
    from anyloc_tpu.ops.retrieval import get_top_k_recall, top_k_search

    import jax.numpy as jnp

    db = rng.standard_normal((500, 16)).astype(np.float32)
    path = tmp_path / "db.npy"
    np.save(path, db)
    mm = np.load(path, mmap_mode="r")
    assert isinstance(mm, np.memmap)
    qu = db[::50] + 0.01 * rng.standard_normal((10, 16)).astype(np.float32)
    gt = [np.array([i * 50]) for i in range(10)]
    d_b, i_b, r_b = get_top_k_recall([1, 5], mm, qu, gt, engine="blocked")
    _, i_ex = top_k_search(jnp.asarray(
        db / np.linalg.norm(db, axis=-1, keepdims=True)),
        jnp.asarray(qu / np.linalg.norm(qu, axis=-1, keepdims=True)), 5)
    np.testing.assert_array_equal(i_b, np.asarray(i_ex))
    assert r_b[1] == 1.0
