"""Native C++ NN search vs the numpy/JAX oracle."""

import numpy as np
import pytest

from anyloc_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable"
)


@pytest.mark.parametrize("method", ["cosine", "l2"])
def test_native_matches_numpy(rng, method):
    db = rng.standard_normal((300, 48)).astype(np.float32)
    qu = rng.standard_normal((17, 48)).astype(np.float32)
    s, i = native.nn_search(db, qu, 7, method)
    if method == "cosine":
        full = qu.astype(np.float64) @ db.T.astype(np.float64)
        order = np.argsort(-full, axis=1)[:, :7]
    else:
        full = ((qu[:, None].astype(np.float64) - db[None]) ** 2).sum(-1)
        order = np.argsort(full, axis=1)[:, :7]
    # compare scores at chosen indices (ties can permute indices)
    np.testing.assert_allclose(
        np.take_along_axis(full, i, 1), np.take_along_axis(full, order, 1),
        rtol=1e-4,
    )
    agree = (i == order).mean()
    assert agree > 0.99


def test_native_k_clamped(rng):
    db = rng.standard_normal((5, 8)).astype(np.float32)
    s, i = native.nn_search(db, db[:2], 20, "l2")
    assert s.shape == (2, 5)
    assert i[0, 0] == 0 and i[1, 0] == 1  # self-match first


def test_native_recall(rng):
    retrieved = np.array([[5, 9, 1], [7, 3, 2], [0, 1, 2]])
    gt = [np.array([5]), np.array([2, 11]), np.array([9])]
    hits = native.recall_at_k(retrieved, gt, [1, 2, 3])
    assert hits == {1: 1, 2: 1, 3: 2}


def test_native_recall_subsample():
    retrieved = np.array([[1], [2]])
    gt = [np.array([2]), np.array([]), np.array([99])]
    hits = native.recall_at_k(retrieved, gt, [1], sub_sample_db=2,
                              sub_sample_qu=2)
    assert hits == {1: 1}


def test_native_in_retrieval_path(rng):
    """End-to-end through get_top_k_recall with engine='native'."""
    from anyloc_tpu.ops.retrieval import get_top_k_recall

    db = rng.standard_normal((50, 16)).astype(np.float32)
    qu = db[:5] + 0.01 * rng.standard_normal((5, 16)).astype(np.float32)
    gt = [np.array([i]) for i in range(5)]
    _, idx, recalls = get_top_k_recall([1, 5], db, qu, gt, engine="native")
    assert recalls[1] == 1.0
    np.testing.assert_array_equal(idx[:, 0], np.arange(5))


def test_native_ivf_search(rng):
    """Host IVF (FAISS IndexIVFFlat counterpart, native/nnsearch.cpp):
    full probe == exact nn_search (both metrics, CSR posting lists);
    thread-count-invariant; k > candidates pads with -1."""
    from anyloc_tpu import native

    if not native.available():
        pytest.skip("no native lib")
    db = rng.standard_normal((1200, 24)).astype(np.float32)
    qu = db[::60] + 0.01 * rng.standard_normal((20, 24)).astype(np.float32)
    for method in ("cosine", "l2"):
        cells, csr = native.ivf_build(db, 16, method=method, seed=1)
        assert csr[0][-1] == 1200 and np.sort(csr[1]).tolist() == list(range(1200))
        s_full, i_full = native.ivf_search(db, qu, 5, cells, csr,
                                           n_probe=16, method=method)
        s_ex, i_ex = native.nn_search(db, qu, 5, method=method)
        np.testing.assert_array_equal(i_full, i_ex)
        np.testing.assert_allclose(s_full, s_ex, atol=1e-5)
        # thread-count invariance
        s1, i1 = native.ivf_search(db, qu, 5, cells, csr, n_probe=4,
                                   method=method, n_threads=1)
        s4, i4 = native.ivf_search(db, qu, 5, cells, csr, n_probe=4,
                                   method=method, n_threads=4)
        np.testing.assert_array_equal(i1, i4)
    # shortlist smaller than k: -1 padding
    _, ipad = native.ivf_search(db, qu, 1000, cells, csr, n_probe=1)
    assert (ipad == -1).any()
