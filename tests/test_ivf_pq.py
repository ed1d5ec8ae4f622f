"""IVF-PQ search (ops/ivf_pq.py) — FAISS IndexIVFPQ counterpart.

Oracles, in increasing strength:
  * numpy ADC over the probed shortlist (the gather formulation the TPU
    one-hot matvec replaces), scores exact to float tolerance;
  * probing EVERY cell == exact search over the reconstructions
    (``decode()``), the same invariant ops/ivf.py and ops/pq.py each
    enforce for their half;
  * recall on clustered data at small n_probe (the engine's actual regime).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.ops.ivf_pq import (IVFPQIndex, ivf_pq_fit, load_ivf_pq,
                                   save_ivf_pq)
from anyloc_tpu.ops.retrieval import top_k_search


def _np_probe(index, q, n_probe):
    """Probed cell ids for one query, replicating the search's ranking."""
    cells = np.asarray(index.cells)
    dot = cells @ q
    if index.method == "l2":
        score = 2.0 * dot - np.sum(cells * cells, -1)
    else:
        score = dot
    return np.argsort(-score, kind="stable")[:n_probe]


def _np_ivf_pq(index, qu, n_probe):
    """Numpy gather-ADC scores dict per query: {row_id: score} over the
    probed shortlist + overflow — the reference semantics for the TPU
    one-hot scan."""
    cells = np.asarray(index.cells)
    cb = np.asarray(index.codebooks)              # [M, C, ds]
    m = cb.shape[0]
    d = cells.shape[1]
    codes = np.asarray(index.codes)
    ids = np.asarray(index.bucket_ids)
    rsq = np.asarray(index.recon_sq)
    out = []
    for q in qu:
        t = np.einsum("md,mcd->mc", q.reshape(m, d // m), cb)  # [M, C]
        scores = {}

        def score(code, cell, row_rsq):
            core = cells[cell] @ q + t[np.arange(m), code.astype(int)].sum()
            if index.method == "l2":
                return q @ q - 2.0 * core + row_rsq  # positive sq dist
            return core

        for cell in _np_probe(index, q, n_probe):
            for slot in range(codes.shape[1]):
                if ids[cell, slot] >= 0:
                    scores[int(ids[cell, slot])] = score(
                        codes[cell, slot], cell, rsq[cell, slot])
        o_ids = np.asarray(index.overflow_ids)
        o_codes = np.asarray(index.overflow_codes)
        o_cell = np.asarray(index.overflow_cell)
        o_rsq = np.asarray(index.overflow_recon_sq)
        for j in range(o_ids.size):
            scores[int(o_ids[j])] = score(o_codes[j], o_cell[j], o_rsq[j])
        out.append(scores)
    return out


@pytest.fixture(scope="module", params=["cosine", "l2"])
def fitted(request):
    rng = np.random.default_rng(0)
    db = rng.standard_normal((400, 32)).astype(np.float32)
    qu = rng.standard_normal((9, 32)).astype(np.float32)
    index = ivf_pq_fit(db, n_cells=10, m=8, n_codes=16,
                       method=request.param, bucket_factor=1.5, seed=1)
    return db, qu, index


class TestOracle:
    def test_scores_match_numpy_gather_adc(self, fitted):
        db, qu, index = fitted
        n_probe = 3
        want = _np_ivf_pq(index, qu, n_probe)
        k = 15
        s, i = index.search(qu, k=k, n_probe=n_probe)
        lower_better = index.method == "l2"
        for q in range(qu.shape[0]):
            got = {int(i[q, j]): float(s[q, j]) for j in range(k)}
            # every returned row must carry the oracle's score for it
            for rid, sc in got.items():
                assert rid in want[q]
                np.testing.assert_allclose(sc, want[q][rid],
                                           rtol=1e-4, atol=1e-4)
            # and be the oracle's BEST k of the shortlist
            ref = sorted(want[q].items(),
                         key=lambda kv: kv[1],
                         reverse=not lower_better)[:k]
            kth = ref[-1][1]
            for rid, sc in ref:
                if (sc < kth - 1e-5) if lower_better else (sc > kth + 1e-5):
                    assert rid in got

    def test_probe_all_equals_exact_over_reconstructions(self, fitted):
        """n_probe = n_cells makes IVF-PQ exact over decode() — the
        composition of ops/ivf.py's and ops/pq.py's exactness invariants."""
        db, qu, index = fitted
        recon = index.decode()
        assert recon.shape == db.shape
        k = 10
        s, i = index.search(qu, k=k, n_probe=index.n_cells)
        s_ex, i_ex = top_k_search(jnp.asarray(recon), jnp.asarray(qu), k,
                                  method=index.method)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
        if index.method == "l2":
            # both conventions are positive squared distances here
            np.testing.assert_allclose(np.asarray(s), np.asarray(s_ex),
                                       rtol=1e-4, atol=1e-4)

    def test_decode_matches_cells_plus_codebooks(self, fitted):
        db, _, index = fitted
        recon = index.decode()
        # spot-check one bucketed row against manual reconstruction
        ids = np.asarray(index.bucket_ids)
        cell, slot = np.argwhere(ids >= 0)[0]
        rid = ids[cell, slot]
        cb = np.asarray(index.codebooks)
        code = np.asarray(index.codes)[cell, slot].astype(int)
        manual = (np.asarray(index.cells)[cell]
                  + cb[np.arange(index.m), code].reshape(-1))
        np.testing.assert_allclose(recon[rid], manual, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(index.recon_sq)[cell, slot],
            float(manual @ manual), rtol=1e-4)
        # row subset addressing
        np.testing.assert_allclose(index.decode(np.array([rid])),
                                   recon[rid][None], atol=0)


class TestBlockingAndDtype:
    def test_blocked_equals_single_block(self, fitted):
        """Query blocking, candidate chunking and overflow chunking are
        pure tiling — results must be identical."""
        db, qu, index = fitted
        s1, i1 = index.search(qu, k=6, n_probe=4, query_block=64,
                              max_workset_mb=1024)
        s2, i2 = index.search(qu, k=6, n_probe=4, query_block=2,
                              max_workset_mb=1)  # forces tiny chunks
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-5)

    def test_bfloat16_score_path(self, fitted):
        db, qu, index = fitted
        s32, i32 = index.search(qu, k=8, n_probe=4)
        sbf, ibf = index.search(qu, k=8, n_probe=4, score_dtype="bfloat16")
        np.testing.assert_allclose(np.asarray(sbf), np.asarray(s32),
                                   rtol=1e-1, atol=1e-1)
        assert np.mean(np.asarray(i32[:, 0]) == np.asarray(ibf[:, 0])) >= 0.6
        with pytest.raises(ValueError, match="score_dtype"):
            index.search(qu, k=3, score_dtype="int8")


class TestRecallAndAPI:
    def test_recall_on_clustered_data(self):
        """The target regime: clustered rows, near-duplicate queries, small
        n_probe — the true match must survive pruning + quantization."""
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, 64)).astype(np.float32) * 3
        db = (centers[rng.integers(0, 20, 800)]
              + 0.3 * rng.standard_normal((800, 64)).astype(np.float32))
        qu = db[:50] + 0.05 * rng.standard_normal((50, 64)).astype(np.float32)
        index = ivf_pq_fit(db, n_cells=20, m=16, n_codes=32, method="l2",
                           seed=0)
        _, i_pq = index.search(qu, k=10, n_probe=4)
        hits = [q in set(np.asarray(i_pq[q]).tolist()) for q in range(50)]
        assert np.mean(hits) >= 0.9, np.mean(hits)

    def test_get_top_k_recall_engine(self):
        from anyloc_tpu.ops.retrieval import get_top_k_recall

        rng = np.random.default_rng(11)
        db = rng.standard_normal((400, 48)).astype(np.float32)
        qu = db[::40] + 0.02 * rng.standard_normal((10, 48)).astype(np.float32)
        gt = [np.array([i * 40]) for i in range(10)]
        _, _, r_dev = get_top_k_recall([1, 5], db, qu, gt)
        d, i, r = get_top_k_recall(
            [1, 5], db, qu, gt, engine="ivf_pq", pq_m=16, n_probe=20)
        assert r == r_dev
        assert d.shape == (10, 5) and i.shape == (10, 5)
        # prebuilt-index route + l2 distance convention
        index = ivf_pq_fit(db, n_cells=16, m=16, method="l2", seed=2)
        d_l2, _, r_l2 = get_top_k_recall(
            [1, 5], db, qu, gt, engine="ivf_pq", method="l2",
            norm_descs=False, n_probe=16, ivf_pq_index=index)
        assert r_l2[1] == r_dev[1]
        assert np.all(d_l2 >= -1e-4)  # positive squared distances
        assert np.all(np.diff(d_l2, axis=1) >= -1e-4)

    def test_save_load_roundtrip(self, fitted, tmp_path):
        _, qu, index = fitted
        save_ivf_pq(index, str(tmp_path / "ivfpq"))
        back = load_ivf_pq(str(tmp_path / "ivfpq"))
        assert back.method == index.method and back.n_rows == index.n_rows
        s1, i1 = index.search(qu, k=4, n_probe=3)
        s2, i2 = back.search(qu, k=4, n_probe=3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)

    def test_shapes_and_clamps(self, fitted):
        db, qu, index = fitted
        # k clamps to the probed shortlist
        s, i = index.search(qu, k=10_000, n_probe=2)
        cap = index.codes.shape[1]
        n_over = int(index.overflow_codes.shape[0])
        assert s.shape[1] == min(db.shape[0], 2 * cap + n_over)
        # bucket pad slots may surface when k exceeds what the probes can
        # fill (same contract as ops/ivf.py): id -1, score +/-inf, and only
        # AFTER every real candidate
        i_np, s_np = np.asarray(i), np.asarray(s)
        pad = i_np < 0
        assert np.all(np.isinf(s_np[pad]))
        assert np.all(pad[:, :-1] <= pad[:, 1:])  # pads are a suffix
        s, i = index.search(np.zeros((0, 32), np.float32), k=5)
        assert s.shape == (0, 5) and i.shape == (0, 5)
        assert index.dim == 32 and index.m == 8 and index.n_codes == 16
        assert index.n_cells == 10 and index.n_rows == 400
        with pytest.raises(ValueError, match=r"must be \[Q, 32\]"):
            index.search(np.zeros((2, 33), np.float32), k=1)

    def test_fit_validation(self):
        rng = np.random.default_rng(0)
        db = rng.standard_normal((64, 30)).astype(np.float32)
        with pytest.raises(ValueError, match="not divisible"):
            ivf_pq_fit(db, m=7)
        with pytest.raises(ValueError, match="n_codes"):
            ivf_pq_fit(db, m=5, n_codes=300)
        with pytest.raises(ValueError, match="method"):
            ivf_pq_fit(db, m=5, n_codes=16, method="hamming")
        with pytest.raises(ValueError, match="rows"):
            ivf_pq_fit(db[:8], m=5, n_codes=16)

    def test_no_overflow_database(self):
        """bucket_factor large enough -> empty overflow pool still searches."""
        rng = np.random.default_rng(3)
        db = rng.standard_normal((200, 16)).astype(np.float32)
        index = ivf_pq_fit(db, n_cells=4, m=4, n_codes=8,
                           bucket_factor=8.0, seed=0)
        assert int(index.overflow_codes.shape[0]) == 0
        s, i = index.search(db[:5], k=3, n_probe=4)
        assert s.shape == (5, 3)
        # probing all 4 cells with no overflow covers every row exactly
        recon = index.decode()
        _, i_ex = top_k_search(jnp.asarray(recon), jnp.asarray(db[:5]), 3)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
