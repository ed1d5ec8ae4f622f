"""Golden-value regression tests: fixed inputs -> pinned outputs on CPU f32.
These catch silent numeric drift across refactors/rounds (the reference's
determinism-as-regression-control strategy, SURVEY.md §4). A legitimate
algorithm change must update the constants consciously."""

import numpy as np

import jax


def _fixed(shape, seed=1234):
    # deterministic pseudo-data independent of numpy RNG implementation
    n = int(np.prod(shape))
    x = np.arange(n, dtype=np.float64)
    vals = np.sin(x * 12.9898 + seed) * 43758.5453
    return ((vals - np.floor(vals)) - 0.5).astype(np.float32).reshape(shape)


def test_vlad_golden():
    from anyloc_tpu.ops.vlad import vlad_aggregate

    descs = _fixed((2, 30, 16))
    centers = _fixed((4, 16), 7)
    out = np.asarray(vlad_aggregate(descs, centers, impl="xla"))
    assert out.shape == (2, 64)
    np.testing.assert_allclose(float(np.abs(out).sum()), 14.098246, rtol=2e-5)
    np.testing.assert_allclose(float(out[0, 0]), -0.11336250, rtol=2e-4)
    soft = np.asarray(
        vlad_aggregate(descs, centers, vlad_mode="soft", impl="xla")
    )
    np.testing.assert_allclose(float(np.abs(soft).sum()), 12.761552, rtol=2e-5)
    np.testing.assert_allclose(float(soft[1, 5]), 0.07531667, rtol=2e-4)


def test_gem_golden():
    from anyloc_tpu.ops.gem import gem_pool

    g = np.asarray(gem_pool(_fixed((2, 30, 16))))
    np.testing.assert_allclose(float(np.abs(g).sum()), 5.5354719, rtol=2e-5)
    np.testing.assert_allclose(float(g[0, 0]), 0.18931539, rtol=2e-4)


def test_kmeans_golden():
    from anyloc_tpu.ops.kmeans import kmeans_fit

    centers, _ = kmeans_fit(
        jax.random.PRNGKey(3), _fixed((200, 8), 2), 4, max_iters=20
    )
    np.testing.assert_allclose(
        float(np.abs(np.asarray(centers)).sum()), 4.1011033, rtol=2e-5
    )


def test_topk_golden():
    from anyloc_tpu.ops.retrieval import top_k_search

    s, i = top_k_search(_fixed((50, 8), 5), _fixed((3, 8), 9), 4)
    assert np.asarray(i)[0].tolist() == [27, 37, 34, 40]
    np.testing.assert_allclose(float(np.asarray(s).sum()), 5.0410948, rtol=2e-5)
