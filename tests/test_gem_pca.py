"""GeM pooling vs the reference's complex-power formula (torch oracle) and
PCA vs sklearn."""

import numpy as np
import pytest

from anyloc_tpu.ops.gem import gem_pool, gem_pool_spatial
from anyloc_tpu.ops.pca import concat_desc_dists_clusters, reduce_pca
from anyloc_tpu.ops.pooling import (
    global_avg_pool,
    global_max_pool,
    mac_spatial,
    rmac_spatial,
    spoc_spatial,
)


def torch_gem_oracle(patch_descs, p=3.0, use_abs=False):
    """Direct transliteration of scripts/dino_v2_gem.py:170-190 semantics."""
    import torch

    t = torch.from_numpy(patch_descs)
    if use_abs:
        return (torch.mean(torch.abs(t) ** p, dim=-2) ** (1 / p)).numpy()
    x = torch.mean(t ** p, dim=-2)
    g = x.to(torch.complex64) ** (1 / p)
    return (torch.abs(g) * torch.sign(x)).numpy()


@pytest.mark.parametrize("use_abs", [False, True])
@pytest.mark.parametrize("p", [3.0, 2.0])
def test_gem_matches_torch_oracle(rng, use_abs, p):
    descs = rng.standard_normal((4, 50, 16)).astype(np.float32)
    ours = np.asarray(gem_pool(descs, p=p, use_abs=use_abs))
    oracle = torch_gem_oracle(descs, p=p, use_abs=use_abs)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_gem_spatial_positive(rng):
    x = np.abs(rng.standard_normal((2, 7, 7, 16))).astype(np.float32)
    out = np.asarray(gem_pool_spatial(x, p=3.0))
    expect = (np.clip(x, 1e-6, None) ** 3).mean(axis=(1, 2)) ** (1 / 3)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_global_pools(rng):
    descs = rng.standard_normal((3, 20, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(global_max_pool(descs)), descs.max(axis=1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(global_avg_pool(descs)), descs.mean(axis=1), atol=1e-6
    )
    fmap = rng.standard_normal((2, 6, 6, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mac_spatial(fmap)), fmap.max(axis=(1, 2)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(spoc_spatial(fmap)), fmap.mean(axis=(1, 2)), atol=1e-6
    )
    r = np.asarray(rmac_spatial(fmap))
    assert r.shape == (2, 8) and np.all(np.isfinite(r))


def test_reduce_pca_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    train = rng.standard_normal((100, 32)).astype(np.float32)
    test = rng.standard_normal((20, 32)).astype(np.float32)
    ours_tr, ours_te = reduce_pca(train, test, 8)
    pca = PCA(8, svd_solver="full")
    sk_tr = pca.fit_transform(train)
    sk_te = pca.transform(test)
    # Components match up to sign per-component; tolerance is loose because
    # our SVD runs in f32 on device while sklearn is f64 (recall-level
    # equivalence is what matters downstream).
    for j in range(8):
        ratio = ours_tr[:, j] / np.where(np.abs(sk_tr[:, j]) < 1e-9, 1, sk_tr[:, j])
        sign = np.sign(np.median(ratio))
        np.testing.assert_allclose(ours_tr[:, j], sign * sk_tr[:, j], atol=2e-2)
        np.testing.assert_allclose(ours_te[:, j], sign * sk_te[:, j], atol=2e-2)


def test_reduce_pca_whitening_unit_variance(rng):
    train = rng.standard_normal((200, 16)).astype(np.float32)
    test = rng.standard_normal((10, 16)).astype(np.float32)
    out_tr, _ = reduce_pca(train, test, 4, whitening=True)
    np.testing.assert_allclose(out_tr.std(axis=0), 1.0, atol=0.05)


def test_reduce_pca_low_factor_shapes(rng):
    train = rng.standard_normal((60, 40)).astype(np.float32)
    test = rng.standard_normal((10, 40)).astype(np.float32)
    out_tr, out_te = reduce_pca(train, test, 10, low_factor=0.3)
    assert out_tr.shape == (60, 10) and out_te.shape == (10, 10)


def test_reduce_pca_low_factor_fallback(rng):
    """n_samples < n_components triggers the fallback projection path."""
    train = rng.standard_normal((20, 64)).astype(np.float32)
    test = rng.standard_normal((5, 64)).astype(np.float32)
    out_tr, out_te = reduce_pca(train, test, 8, low_factor=0.5, fallback=16)
    assert out_tr.shape == (20, 8) and out_te.shape == (5, 8)
    assert np.all(np.isfinite(out_tr)) and np.all(np.isfinite(out_te))


def test_concat_desc_dists_clusters(rng):
    centers = rng.standard_normal((4, 8)).astype(np.float32)
    descs = rng.standard_normal((10, 8)).astype(np.float32)
    out = np.asarray(concat_desc_dists_clusters(centers, descs))
    assert out.shape == (10, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
