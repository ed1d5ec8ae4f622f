"""Product-quantization search (ops/pq.py) — FAISS IndexPQ counterpart.

Oracle: a direct numpy ADC implementation (tables + per-row code lookup),
plus exact search over the decoded reconstructions — the two definitions
of what PQ scores MUST agree with.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.ops.pq import (PQIndex, load_pq, pq_encode, pq_fit, save_pq)
from anyloc_tpu.ops.retrieval import top_k_search


def _np_adc(index, qu):
    """Numpy ADC scores [Q, N]: the gather formulation the TPU one-hot
    matmul replaces."""
    cb = np.asarray(index.codebooks)          # [M, C, ds]
    codes = np.asarray(index.codes)           # [N, M]
    m, c, ds = cb.shape
    qsub = qu.reshape(qu.shape[0], m, ds)
    t = np.einsum("qmd,mcd->qmc", qsub, cb)   # [Q, M, C]
    if index.method == "l2":
        t = 2.0 * t - np.sum(cb * cb, axis=-1)[None]
    marange = np.arange(m)
    return t[:, marange[None, :], codes.astype(np.int64)].sum(-1)


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    db = rng.standard_normal((300, 32)).astype(np.float32)
    qu = rng.standard_normal((7, 32)).astype(np.float32)
    index = pq_fit(db, m=8, n_codes=16, seed=1)
    return db, qu, index


class TestADC:
    @pytest.mark.parametrize("scan", ["tables", "decode"])
    @pytest.mark.parametrize("method", ["l2", "cosine"])
    def test_scores_match_numpy_oracle(self, fitted, method, scan):
        db, qu, base = fitted
        index = PQIndex(base.codebooks, base.codes, method=method)
        want = _np_adc(index, qu)
        s, idx = index.search(qu, k=db.shape[0], scan=scan)
        got = np.full_like(want, np.nan)
        np.put_along_axis(got, np.asarray(idx), np.asarray(s), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_scan_modes_agree_and_auto_dispatch(self, fitted):
        """The two ADC formulations are the same math: full-k score parity;
        'auto' picks decode above Qb = ds and tables at tiny batches, and
        unknown modes fail fast."""
        db, qu, index = fitted
        s_t, i_t = index.search(qu, k=12, scan="tables")
        s_d, i_d = index.search(qu, k=12, scan="decode")
        np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i_d))
        np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_d),
                                   rtol=1e-5, atol=1e-5)
        s_a, i_a = index.search(qu, k=12, scan="auto")
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_t))
        s_1, _ = index.search(qu[:1], k=12, scan="auto")  # qb=1 <= ds: tables
        np.testing.assert_allclose(np.asarray(s_1[0]), np.asarray(s_a[0]),
                                   rtol=1e-5, atol=1e-5)
        with pytest.raises(ValueError, match="scan"):
            index.search(qu, k=3, scan="simd")

    def test_scores_match_decoded_exact_search(self, fitted):
        """ADC == exact search over the reconstructions, up to the constant
        ||q||^2 shift in l2 mode — same ranking, shifted value."""
        db, qu, index = fitted
        recon = index.decode()
        s_pq, i_pq = index.search(qu, k=5)
        s_ex, i_ex = top_k_search(
            jnp.asarray(recon), jnp.asarray(qu), 5, method="l2")
        np.testing.assert_array_equal(np.asarray(i_pq), np.asarray(i_ex))
        # exact returns +||q-x||^2; ADC returns -||q-x||^2 + ||q||^2
        q2 = np.sum(qu * qu, axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(s_pq), q2 - np.asarray(s_ex), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("scan", ["tables", "decode"])
    def test_bfloat16_score_path(self, fitted, scan):
        db, qu, index = fitted
        s32, i32 = index.search(qu, k=10, scan=scan)
        sbf, _ = index.search(qu, k=10, score_dtype="bfloat16", scan=scan)
        # decode rounds twice (x̂, then the dot) and l2 scores cancel, so
        # its band is wider than the single-rounding tables path
        tol = 3e-2 if scan == "tables" else 1e-1
        np.testing.assert_allclose(
            np.asarray(sbf), np.asarray(s32), rtol=tol, atol=tol)
        assert np.mean(np.asarray(i32[:, 0]) ==
                       np.asarray(index.search(
                           qu, k=1, score_dtype="bfloat16")[1][:, 0])) >= 0.7

    def test_blocked_equals_single_block(self, fitted):
        db, qu, index = fitted
        s1, i1 = index.search(qu, k=6, query_block=256, db_block=1 << 20)
        s2, i2 = index.search(qu, k=6, query_block=3, db_block=64)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-5)


class TestEncodeDecode:
    def test_encode_roundtrip_is_fixed_point(self, fitted):
        """Encoding a reconstruction returns the same codes (each
        reconstruction IS its nearest codeword tuple)."""
        _, _, index = fitted
        again = pq_encode(index.codebooks, index.decode())
        np.testing.assert_array_equal(np.asarray(again),
                                      np.asarray(index.codes))

    def test_exact_when_db_is_codeword_tuples(self):
        """A database made of codeword combinations reconstructs exactly,
        so PQ search == exact full-precision search."""
        rng = np.random.default_rng(3)
        cb = jnp.asarray(rng.standard_normal((4, 8, 6)).astype(np.float32))
        codes = rng.integers(0, 8, (50, 4)).astype(np.uint8)
        index = PQIndex(cb, jnp.asarray(codes), method="l2")
        db = index.decode()
        assert np.allclose(
            db, np.asarray(index.decode(np.arange(50))), atol=0)
        qu = rng.standard_normal((5, 24)).astype(np.float32)
        _, i_pq = index.search(qu, k=3)
        _, i_ex = top_k_search(jnp.asarray(db), jnp.asarray(qu), 3,
                               method="l2")
        np.testing.assert_array_equal(np.asarray(i_pq), np.asarray(i_ex))


class TestRecallAndAPI:
    def test_recall_on_clustered_data(self):
        """The VPR regime: each query's true match (a near-duplicate row)
        must surface in the PQ top-10 nearly always — quantization noise
        may reorder near-ties but not lose a genuinely close neighbor."""
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((20, 64)).astype(np.float32) * 3
        db = (centers[rng.integers(0, 20, 500)]
              + 0.3 * rng.standard_normal((500, 64)).astype(np.float32))
        qu = db[:40] + 0.05 * rng.standard_normal((40, 64)).astype(np.float32)
        index = pq_fit(db, m=16, n_codes=32, seed=0)
        _, i_pq = index.search(qu, k=10)
        hits = [q in set(np.asarray(i_pq[q]).tolist()) for q in range(40)]
        assert np.mean(hits) >= 0.9, np.mean(hits)

    def test_get_top_k_recall_engine(self):
        """get_top_k_recall(engine='pq') matches the device engine's recall
        on separated data, for both methods — and l2 distances convert to
        the exact engines' positive-squared-distance convention."""
        from anyloc_tpu.ops.retrieval import get_top_k_recall

        rng = np.random.default_rng(11)
        # well-separated rows (engine-wiring test, not a PQ-quality test:
        # random vectors have huge margins, so ADC ranking == exact ranking)
        db = rng.standard_normal((400, 48)).astype(np.float32)
        qu = db[::40] + 0.02 * rng.standard_normal((10, 48)).astype(np.float32)
        gt = [np.array([i * 40]) for i in range(10)]
        _, _, r_dev = get_top_k_recall([1, 5], db, qu, gt)
        d_pq, i_pq, r_pq = get_top_k_recall(
            [1, 5], db, qu, gt, engine="pq", pq_m=16)
        assert r_pq == r_dev
        assert d_pq.shape == (10, 5) and i_pq.shape == (10, 5)
        # prebuilt-index route + l2 distance convention
        index = pq_fit(db, m=16, method="l2", seed=2)
        d_l2, _, r_l2 = get_top_k_recall(
            [1, 5], db, qu, gt, engine="pq", method="l2", norm_descs=False,
            pq_index=index)
        assert r_l2[1] == r_dev[1]
        assert np.all(d_l2 >= -1e-4)  # positive squared distances, ascending
        assert np.all(np.diff(d_l2, axis=1) >= -1e-4)

    def test_save_load_roundtrip(self, fitted, tmp_path):
        _, qu, index = fitted
        save_pq(index, str(tmp_path / "pq"))
        back = load_pq(str(tmp_path / "pq"))
        assert back.method == index.method
        s1, i1 = index.search(qu, k=4)
        s2, i2 = back.search(qu, k=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_shapes_and_clamps(self, fitted):
        db, qu, index = fitted
        s, i = index.search(qu, k=10_000)           # k clamps to N
        assert s.shape == (qu.shape[0], db.shape[0])
        s, i = index.search(np.zeros((0, 32), np.float32), k=5)
        assert s.shape == (0, 5) and i.shape == (0, 5)
        assert index.n_rows == db.shape[0]
        assert index.dim == 32 and index.m == 8 and index.n_codes == 16
        with pytest.raises(ValueError, match=r"must be \[Q, 32\]"):
            index.search(np.zeros((2, 33), np.float32), k=1)

    def test_fit_validation(self):
        rng = np.random.default_rng(0)
        db = rng.standard_normal((64, 30)).astype(np.float32)
        with pytest.raises(ValueError, match="not divisible"):
            pq_fit(db, m=7)
        with pytest.raises(ValueError, match="n_codes"):
            pq_fit(db, m=5, n_codes=300)
        with pytest.raises(ValueError, match="method"):
            pq_fit(db, m=5, n_codes=16, method="hamming")
        with pytest.raises(ValueError, match="rows"):
            pq_fit(db[:8], m=5, n_codes=16)
