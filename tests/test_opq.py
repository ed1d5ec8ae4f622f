"""OPQ rotation (ops/pq.py ``opq_train`` + the ``rotation`` field on
PQIndex/IVFPQIndex) — the FAISS ``OPQMatrix`` pretransform counterpart
(Ge et al., "Optimized Product Quantization", CVPR 2013).

Property oracles, not golden numbers: the learned rotation is orthogonal;
on anisotropic (PCA-spectrum) data it reduces reconstruction error vs
plain PQ; search through the rotated space still agrees with exact search
over the decoded reconstructions (the defining PQ identity); decode
returns ORIGINAL-space vectors; save/load round-trips the rotation.

Reference seam: the reference retrieves with FAISS IndexFlat only
(utilities.py:390-469); OPQ extends this repo's beyond-reference ANN
lineup where its own PCA path (reduce_pca, utilities.py) hands the
compressed engines exactly the decaying-spectrum geometry OPQ exists for.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.ops.ivf_pq import ivf_pq_fit, load_ivf_pq, save_ivf_pq
from anyloc_tpu.ops.pq import load_pq, opq_train, pq_fit, save_pq
from anyloc_tpu.ops.retrieval import top_k_search


def _aniso(n, d, seed=0):
    """Rows with a decaying (i+1)^-0.75 per-dim spectrum — the PCA-output
    geometry where unrotated PQ subspaces are maximally unbalanced."""
    rng = np.random.default_rng(seed)
    lam = (1.0 + np.arange(d, dtype=np.float32)) ** -0.75
    return rng.standard_normal((n, d)).astype(np.float32) * lam


@pytest.fixture(scope="module")
def aniso_db():
    return _aniso(500, 32)


def test_rotation_is_orthogonal(aniso_db):
    rot = opq_train(aniso_db, m=8, n_codes=16, opq_iters=4, seed=3)
    assert rot.shape == (32, 32)
    np.testing.assert_allclose(rot @ rot.T, np.eye(32),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(rot.T @ rot, np.eye(32),
                               rtol=0, atol=1e-5)


def test_opq_reduces_reconstruction_error(aniso_db):
    """The whole point: on anisotropic data the learned rotation spreads
    variance across subspaces and ||x - decode(encode(x))||^2 drops vs
    identity-rotation PQ at the same code budget."""
    base = pq_fit(aniso_db, m=8, n_codes=16, seed=1)
    opq = pq_fit(aniso_db, m=8, n_codes=16, seed=1, opq_iters=8)
    assert opq.rotation is not None and base.rotation is None
    err_base = np.mean(np.sum((aniso_db - base.decode()) ** 2, axis=-1))
    err_opq = np.mean(np.sum((aniso_db - opq.decode()) ** 2, axis=-1))
    assert err_opq < 0.8 * err_base, (
        f"OPQ must cut reconstruction error on PCA-spectrum data: "
        f"{err_opq:.5f} vs plain {err_base:.5f}")


def test_search_is_exact_over_reconstructions(aniso_db):
    """With rotation, search still scores <q, x̂> for the ORIGINAL-space
    reconstruction x̂ (orthogonality preserves inner products) — so full-k
    search must match exact search over decode()."""
    index = pq_fit(aniso_db, m=8, n_codes=16, method="cosine", seed=1,
                   opq_iters=4)
    qu = _aniso(9, 32, seed=7)
    s, idx = index.search(qu, k=20)
    want_s, want_i = top_k_search(jnp.asarray(index.decode()),
                                  jnp.asarray(qu), 20)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)
    # rankings agree wherever scores aren't tied
    gaps = np.diff(np.asarray(want_s), axis=1) < -1e-5
    np.testing.assert_array_equal(np.asarray(idx)[:, :-1][gaps],
                                  np.asarray(want_i)[:, :-1][gaps])


def test_decode_is_original_space(aniso_db):
    """decode() must return vectors comparable to the raw db rows (NOT the
    rotated ones): reconstructions correlate with their own rows."""
    index = pq_fit(aniso_db, m=8, n_codes=64, seed=1, opq_iters=4)
    rec = index.decode(rows=np.arange(50))
    x = aniso_db[:50]
    rel = np.sum((x - rec) ** 2) / np.sum(x * x)
    assert rel < 0.5, f"decode not in original space? rel err {rel:.3f}"


def test_pq_save_load_rotation(tmp_path, aniso_db):
    index = pq_fit(aniso_db, m=8, n_codes=16, seed=1, opq_iters=3)
    save_pq(index, str(tmp_path / "opq"))
    back = load_pq(str(tmp_path / "opq"))
    assert back.rotation is not None
    np.testing.assert_array_equal(np.asarray(back.rotation),
                                  np.asarray(index.rotation))
    qu = _aniso(5, 32, seed=9)
    np.testing.assert_array_equal(
        np.asarray(index.search(qu, k=7)[1]),
        np.asarray(back.search(qu, k=7)[1]))
    # no-rotation indexes stay rotation-free through the round-trip
    plain = pq_fit(aniso_db, m=8, n_codes=16, seed=1)
    save_pq(plain, str(tmp_path / "plain"))
    assert load_pq(str(tmp_path / "plain")).rotation is None


def test_ivf_pq_opq_exact_when_probing_all(aniso_db):
    """The IVF-PQ defining property must survive the pretransform: probing
    EVERY cell is exact search over the (original-space) reconstructions."""
    index = ivf_pq_fit(aniso_db, n_cells=6, m=8, n_codes=16,
                       method="cosine", seed=2, opq_iters=3)
    assert index.rotation is not None
    qu = _aniso(7, 32, seed=11)
    s, idx = index.search(qu, k=15, n_probe=index.n_cells)
    want_s, want_i = top_k_search(jnp.asarray(index.decode()),
                                  jnp.asarray(qu), 15)
    np.testing.assert_allclose(np.asarray(s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-5)
    gaps = np.diff(np.asarray(want_s), axis=1) < -1e-5
    np.testing.assert_array_equal(np.asarray(idx)[:, :-1][gaps],
                                  np.asarray(want_i)[:, :-1][gaps])


def test_ivf_pq_save_load_rotation(tmp_path, aniso_db):
    index = ivf_pq_fit(aniso_db, n_cells=5, m=8, n_codes=16,
                       method="cosine", seed=2, opq_iters=2)
    save_ivf_pq(index, str(tmp_path / "ivfopq"))
    back = load_ivf_pq(str(tmp_path / "ivfopq"))
    assert back.rotation is not None
    qu = _aniso(4, 32, seed=13)
    np.testing.assert_array_equal(
        np.asarray(index.search(qu, k=6, n_probe=3)[1]),
        np.asarray(back.search(qu, k=6, n_probe=3)[1]))


def test_get_top_k_recall_opq_passthrough(aniso_db):
    """``get_top_k_recall(engine="pq"/"ivf_pq", opq_iters=N)`` reaches the
    fit (round-5: the measured OPQ win must be reachable from the
    user-facing engine API, not only from pq_fit directly)."""
    from anyloc_tpu.ops.retrieval import get_top_k_recall

    db = aniso_db / np.linalg.norm(aniso_db, axis=1, keepdims=True)
    qu = db[:20]
    gt = [np.array([i]) for i in range(20)]
    for engine in ("pq", "ivf_pq"):
        _, idx, rec = get_top_k_recall(
            [1, 5], db, qu, gt, engine=engine, pq_m=8, opq_iters=3)
        assert idx.shape == (20, 5)
        # self-queries on 500 rows at 4 B/row + OPQ: top-1 must be exact
        # (1.0 fraction form with unit gt lists; 100.0 in percentage form)
        assert rec[1] in (1.0, 100.0), (engine, rec)
