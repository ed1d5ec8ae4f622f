"""k-means tests: convergence on separable blobs, determinism, both modes."""

import jax
import numpy as np
import pytest

from anyloc_tpu.ops.kmeans import KMeans, assign_labels, kmeans_fit


def make_blobs(rng, n_per=100, c=4, d=8, spread=0.05):
    centers = rng.standard_normal((c, d)).astype(np.float32) * 3
    pts = (
        centers[:, None, :]
        + rng.standard_normal((c, n_per, d)).astype(np.float32) * spread
    )
    return pts.reshape(-1, d), centers


@pytest.mark.parametrize("mode", ["cosine", "euclidean"])
def test_kmeans_recovers_blobs(rng, mode):
    x, true_centers = make_blobs(rng)
    key = jax.random.PRNGKey(0)
    centers, labels = kmeans_fit(key, x, 4, mode=mode, max_iters=50)
    centers = np.asarray(centers)
    # Every true center has a fitted center nearby.
    for tc in true_centers:
        dists = np.linalg.norm(centers - tc, axis=1)
        assert dists.min() < 0.5, f"mode={mode}: no center near {dists.min()}"
    # Each blob maps to exactly one label.
    labels = np.asarray(labels).reshape(4, -1)
    for row in labels:
        assert len(set(row.tolist())) == 1


def test_kmeans_deterministic(rng):
    x, _ = make_blobs(rng)
    c1, _ = kmeans_fit(jax.random.PRNGKey(7), x, 4, max_iters=25)
    c2, _ = kmeans_fit(jax.random.PRNGKey(7), x, 4, max_iters=25)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_kmeans_class_api(rng):
    x, _ = make_blobs(rng)
    km = KMeans(4, mode="cosine", max_iters=25)
    km.fit(x)
    assert km.centroids.shape == (4, 8)
    labels = np.asarray(km.predict(x))
    assert labels.shape == (400,)
    assert set(labels.tolist()) == {0, 1, 2, 3}


def test_assign_labels_cosine_scale_invariant(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    centers = rng.standard_normal((4, 8)).astype(np.float32)
    l1 = np.asarray(assign_labels(x, centers, "cosine"))
    l2 = np.asarray(assign_labels(x * 10.0, centers, "cosine"))
    np.testing.assert_array_equal(l1, l2)


def test_kmeans_empty_cluster_stability(rng):
    """k > distinct points: empty clusters must not produce NaNs."""
    x = np.repeat(rng.standard_normal((3, 8)).astype(np.float32), 20, axis=0)
    centers, labels = kmeans_fit(jax.random.PRNGKey(0), x, 8, max_iters=10)
    assert np.all(np.isfinite(np.asarray(centers)))


def test_kmeans_streamed_matches_in_memory(rng, tmp_path):
    """kmeans_fit_streamed (beyond-HBM Lloyd, host-resident descriptors)
    == kmeans_fit on data that fits: same init, same trajectory up to
    float-sum reordering — identical centers/labels on separated blobs.
    Also composes with np.memmap input."""
    import jax
    import jax.numpy as jnp

    from anyloc_tpu.ops.kmeans import kmeans_fit, kmeans_fit_streamed

    blobs = np.concatenate([
        rng.standard_normal((120, 16)).astype(np.float32) * 0.05 + mu
        for mu in (np.eye(16)[i] * 4 for i in range(4))
    ])
    rng.shuffle(blobs)
    key = jax.random.PRNGKey(7)
    for mode in ("cosine", "euclidean"):
        c_ref, l_ref = kmeans_fit(key, jnp.asarray(blobs), 4, mode=mode,
                                  max_iters=10)
        path = tmp_path / f"descs_{mode}.npy"
        np.save(path, blobs)
        mm = np.load(path, mmap_mode="r")
        c_st, l_st = kmeans_fit_streamed(key, mm, 4, mode=mode,
                                         max_iters=10, shard_rows=70)
        np.testing.assert_allclose(np.asarray(c_st), np.asarray(c_ref),
                                   atol=1e-5)
        np.testing.assert_array_equal(l_st, np.asarray(l_ref))
