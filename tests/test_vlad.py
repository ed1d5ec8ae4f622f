"""VLAD math parity tests.

The oracle below is a direct per-image transliteration of the reference
algorithm's *semantics* (AnyLoc/AnyLoc utilities.py:819-890: residuals from
normalized descs, hard/soft assignment, per-cluster residual sum, intra-norm,
final L2) in plain numpy. Our batched one-hot-matmul kernel must match it.
"""

import numpy as np
import pytest

from anyloc_tpu.ops.vlad import VLAD, vlad_aggregate, vlad_residuals


def _normalize(x, axis=-1, eps=1e-12):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


def naive_vlad(descs, centers, vlad_mode="hard", intra_norm=True,
               norm_descs=True, soft_temp=1.0):
    """Oracle: per-image loop exactly mirroring the reference control flow."""
    n, d = descs.shape
    c = centers.shape[0]
    x = _normalize(descs) if norm_descs else descs.copy()
    residuals = x[:, None, :] - centers[None, :, :]  # [n, c, d]
    un_vlad = np.zeros(c * d, dtype=np.float64)
    if vlad_mode == "hard":
        sims = _normalize(x) @ _normalize(centers).T
        labels = np.argmax(sims, axis=1)
        for k in set(labels.tolist()):
            cd_sum = residuals[labels == k, k].sum(axis=0)
            if intra_norm:
                cd_sum = _normalize(cd_sum, axis=0)
            un_vlad[k * d : (k + 1) * d] = cd_sum
    else:
        cos = _normalize(x) @ _normalize(centers).T  # [n, c]
        e = np.exp(soft_temp * cos - np.max(soft_temp * cos, axis=1, keepdims=True))
        soft = e / e.sum(axis=1, keepdims=True)
        for k in range(c):
            w = soft[:, k][:, None, None]
            cd_sum = (w * residuals).reshape(-1, d).sum(axis=0)
            if intra_norm:
                cd_sum = _normalize(cd_sum, axis=0)
            un_vlad[k * d : (k + 1) * d] = cd_sum
    return _normalize(un_vlad, axis=0)


@pytest.mark.parametrize("vlad_mode", ["hard", "soft"])
@pytest.mark.parametrize("intra_norm", [True, False])
@pytest.mark.parametrize("norm_descs", [True, False])
def test_vlad_matches_naive(rng, vlad_mode, intra_norm, norm_descs):
    b, n, d, c = 3, 50, 16, 8
    descs = rng.standard_normal((b, n, d)).astype(np.float32)
    centers = rng.standard_normal((c, d)).astype(np.float32)
    out = np.asarray(
        vlad_aggregate(
            descs, centers, vlad_mode=vlad_mode, intra_norm=intra_norm,
            norm_descs=norm_descs, soft_temp=1.0,
        )
    )
    for i in range(b):
        expect = naive_vlad(
            descs[i], centers, vlad_mode=vlad_mode, intra_norm=intra_norm,
            norm_descs=norm_descs,
        )
        np.testing.assert_allclose(out[i], expect, atol=2e-5)


def test_vlad_output_shape_and_norm(rng):
    descs = rng.standard_normal((4, 30, 12)).astype(np.float32)
    centers = rng.standard_normal((5, 12)).astype(np.float32)
    out = np.asarray(vlad_aggregate(descs, centers))
    assert out.shape == (4, 60)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_vlad_single_image_squeeze(rng):
    descs = rng.standard_normal((30, 12)).astype(np.float32)
    centers = rng.standard_normal((5, 12)).astype(np.float32)
    out = np.asarray(vlad_aggregate(descs, centers))
    assert out.shape == (60,)


def test_vlad_mask_equals_truncation(rng):
    """Masked padded tokens must give the same descriptor as the short input."""
    d, c = 16, 4
    centers = rng.standard_normal((c, d)).astype(np.float32)
    short = rng.standard_normal((20, d)).astype(np.float32)
    padded = np.zeros((1, 32, d), np.float32)
    padded[0, :20] = short
    mask = np.zeros((1, 32), np.float32)
    mask[0, :20] = 1.0
    out_mask = np.asarray(vlad_aggregate(padded, centers, mask=mask))[0]
    out_short = np.asarray(vlad_aggregate(short[None], centers))[0]
    np.testing.assert_allclose(out_mask, out_short, atol=1e-5)


def test_vlad_class_fit_generate(rng, tmp_path):
    n_imgs, n, d, c = 6, 40, 8, 4
    descs = rng.standard_normal((n_imgs, n, d)).astype(np.float32)
    vlad = VLAD(num_clusters=c, cache_dir=str(tmp_path / "cache"))
    out = np.asarray(vlad.fit_and_generate(descs))
    assert out.shape == (n_imgs, c * d)
    assert vlad.desc_dim == d
    # Cached centers reload: a fresh VLAD with the same cache dir skips fit.
    vlad2 = VLAD(num_clusters=c, cache_dir=str(tmp_path / "cache"))
    vlad2.fit(None)
    np.testing.assert_allclose(
        np.asarray(vlad2.c_centers), np.asarray(vlad.c_centers)
    )
    out2 = np.asarray(vlad2.generate_multi(descs))
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_vlad_class_reads_torch_centers(rng, tmp_path):
    """Reference-exported c_centers.pt vocabularies load for parity runs."""
    torch = pytest.importorskip("torch")
    c, d = 4, 8
    centers = rng.standard_normal((c, d)).astype(np.float32)
    cache = tmp_path / "vocab"
    cache.mkdir()
    torch.save(torch.from_numpy(centers), str(cache / "c_centers.pt"))
    vlad = VLAD(num_clusters=c, cache_dir=str(cache))
    vlad.fit(None)
    np.testing.assert_allclose(np.asarray(vlad.c_centers), centers)


def test_vlad_ragged_generate_multi(rng):
    d, c = 8, 4
    centers_src = rng.standard_normal((200, d)).astype(np.float32)
    vlad = VLAD(num_clusters=c)
    vlad.fit(centers_src)
    queries = [
        rng.standard_normal((n, d)).astype(np.float32) for n in (33, 70, 33)
    ]
    out = np.asarray(vlad.generate_multi(queries))
    assert out.shape == (3, c * d)
    for q, o in zip(queries, out):
        np.testing.assert_allclose(np.asarray(vlad.generate(q)), o, atol=1e-5)


def test_vlad_residuals_shape(rng):
    descs = rng.standard_normal((10, 8)).astype(np.float32)
    centers = rng.standard_normal((4, 8)).astype(np.float32)
    res = np.asarray(vlad_residuals(descs, centers))
    assert res.shape == (10, 4, 8)
    expect = _normalize(descs)[:, None, :] - centers[None, :, :]
    np.testing.assert_allclose(res, expect, atol=1e-6)


def test_generate_multi_serves_cache(rng, tmp_path):
    """Cached per-image descriptors must short-circuit recomputation."""
    d, c = 8, 4
    vlad = VLAD(num_clusters=c, cache_dir=str(tmp_path))
    vlad.fit(rng.standard_normal((100, d)).astype(np.float32))
    descs = rng.standard_normal((3, 20, d)).astype(np.float32)
    ids = ["a", "b", "c"]
    out1 = np.asarray(vlad.generate_multi(descs, cache_ids=ids))
    assert vlad.can_use_cache_ids(ids)
    # different descriptors + same ids -> cached values returned unchanged
    other = rng.standard_normal((3, 20, d)).astype(np.float32)
    out2 = np.asarray(vlad.generate_multi(other, cache_ids=ids))
    np.testing.assert_allclose(out2, out1)


class TestVladCacheRobustness:
    """Round-5 review: cached-vocab validation, torn-cache = miss/refit,
    ragged resume reads, residual-cache contract."""

    def _descs(self, rng, n=150, d=32):
        return rng.standard_normal((n, d)).astype(np.float32)

    def test_fit_rejects_mismatched_cached_vocab(self, rng, tmp_path):
        VLAD(8, cache_dir=str(tmp_path)).fit(self._descs(rng))
        with pytest.raises(ValueError, match="clusters"):
            VLAD(4, cache_dir=str(tmp_path)).fit(None)
        with pytest.raises(ValueError, match="dim"):
            VLAD(8, desc_dim=64, cache_dir=str(tmp_path)).fit(None)

    def test_torn_center_cache_refits(self, rng, tmp_path):
        x = self._descs(rng)
        VLAD(4, cache_dir=str(tmp_path)).fit(x)
        p = tmp_path / "c_centers.npz"
        p.write_bytes(p.read_bytes()[:20])  # torn write
        v = VLAD(4, cache_dir=str(tmp_path))
        v.fit(x)  # refit, not BadZipFile
        assert v.c_centers.shape == (4, 32)
        with pytest.raises(ValueError, match="unreadable"):
            p.write_bytes(b"xx")
            VLAD(4, cache_dir=str(tmp_path)).fit(None)

    def test_ragged_resume_reads_cache(self, rng, tmp_path):
        v = VLAD(4, cache_dir=str(tmp_path))
        v.fit(self._descs(rng))
        qs = [self._descs(rng, n) for n in (10, 20, 10)]
        ids = ["a", "b", "c"]
        first = np.asarray(v.generate_multi(qs, cache_ids=ids))
        # poison the inputs: a cached resume must NOT recompute from them
        again = np.asarray(v.generate_multi(
            [np.zeros_like(q) for q in qs], cache_ids=ids))
        np.testing.assert_allclose(again, first, atol=1e-6)

    def test_residual_cache_contract(self, rng, tmp_path):
        v = VLAD(4, cache_dir=str(tmp_path))
        v.fit(self._descs(rng))
        q = self._descs(rng, 12)
        assert not v.can_use_cache_ids(["r1"], only_residuals=True)
        res = np.asarray(v.generate_res_vec(q, cache_id="r1"))
        assert v.can_use_cache_ids(["r1"], only_residuals=True)
        # cached read returns the stored tensor even for poisoned input
        again = np.asarray(v.generate_res_vec(np.zeros_like(q),
                                              cache_id="r1"))
        np.testing.assert_allclose(again, res, atol=1e-6)
