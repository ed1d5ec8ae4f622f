"""TPU-native k-means (Lloyd iterations as a jitted ``lax.scan``).

Replaces the reference's ``fast_pytorch_kmeans`` CUDA dependency
(AnyLoc/AnyLoc ``utilities.py:766`` — ``fpk.KMeans(num_clusters, mode)``) with a
pure-JAX implementation that runs on TPU MXU:

  * assignment is one big ``[N, D] @ [D, C]`` matmul (cosine) or a
    ``||x||^2 - 2 x.c + ||c||^2`` expansion (euclidean) — MXU-friendly;
  * the centroid update is a one-hot matmul ``[C, N] @ [N, D]`` instead of a
    scatter (scatters are slow on TPU);
  * iterations are a ``lax.scan`` with a static trip count so the whole fit is
    one XLA program;
  * a sharded variant (data-parallel over the descriptor set, ``psum`` of
    per-cluster sums/counts over the mesh) lives in
    ``anyloc_tpu.parallel.distributed``.

Determinism: seeded via an explicit ``jax.random`` key (the reference relies on
global ``seed_everything(42)``; bit-parity with fast_pytorch_kmeans is not
possible — parity is defined at the recall level, per SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT, l2_normalize


def _similarity(descs: jnp.ndarray, centers: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Higher-is-closer similarity of each descriptor to each center: [N, C]."""
    if mode == "cosine":
        dn = l2_normalize(descs)
        cn = l2_normalize(centers)
        return jnp.dot(dn, cn.T, preferred_element_type=jnp.float32, precision=EXACT)
    elif mode == "euclidean":
        # -||x - c||^2 = -(||x||^2 - 2 x.c + ||c||^2); ||x||^2 constant per row.
        xc = jnp.dot(descs, centers.T, preferred_element_type=jnp.float32, precision=EXACT)
        c2 = jnp.sum(centers * centers, axis=-1)
        return 2.0 * xc - c2[None, :]
    raise ValueError(f"Unknown distance mode: {mode}")


def assign_labels(descs: jnp.ndarray, centers: jnp.ndarray, mode: str = "cosine") -> jnp.ndarray:
    """Hard cluster assignment. descs [N, D], centers [C, D] -> labels [N]."""
    return jnp.argmax(_similarity(descs, centers, mode), axis=-1)


def _update_centers(sums, counts, centers):
    """Mean update; empty clusters keep their previous center (fpk
    re-samples; keeping the old center is deterministic and equivalent for
    our convergence criterion). Shared by the in-memory and streamed fits."""
    new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, new_centers, centers)


def _lloyd_step(descs, centers, mode):
    """One Lloyd iteration. Returns (new_centers, shift)."""
    sums, counts = _shard_stats(descs, centers, centers.shape[0], mode)
    new_centers = _update_centers(sums, counts, centers)
    shift = jnp.max(jnp.linalg.norm(new_centers - centers, axis=-1))
    return new_centers, shift


@functools.partial(jax.jit, static_argnames=("n_clusters", "mode", "max_iters"))
def kmeans_fit(
    key: jax.Array,
    descs: jnp.ndarray,
    n_clusters: int,
    mode: str = "cosine",
    max_iters: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit k-means on ``descs`` [N, D]. Returns (centers [C, D], labels [N]).

    Init: k distinct descriptors sampled uniformly (matching
    fast_pytorch_kmeans' random-sample init in spirit).
    """
    n = descs.shape[0]
    descs = descs.astype(jnp.float32)
    init_idx = jax.random.choice(key, n, shape=(n_clusters,), replace=False)
    centers0 = descs[init_idx]

    def body(carry, _):
        centers, _prev_shift = carry
        new_centers, shift = _lloyd_step(descs, centers, mode)
        return (new_centers, shift), None

    (centers, _), _ = jax.lax.scan(body, (centers0, jnp.inf), None, length=max_iters)
    labels = assign_labels(descs, centers, mode)
    return centers, labels


class KMeans:
    """Stateful wrapper mirroring fast_pytorch_kmeans' ``KMeans`` API surface
    (``fit`` / ``predict`` / ``.centroids``) used by the reference's VLAD
    (``utilities.py:766,786,849``), backed by the jitted functional core."""

    def __init__(self, n_clusters: int, mode: str = "cosine", max_iters: int = 100, seed: int = 42):
        self.n_clusters = n_clusters
        self.mode = mode
        self.max_iters = max_iters
        self.seed = seed
        self.centroids: Optional[jnp.ndarray] = None

    def fit(self, descs) -> "KMeans":
        descs = jnp.asarray(descs, dtype=jnp.float32)
        key = jax.random.PRNGKey(self.seed)
        self.centroids, _ = kmeans_fit(
            key, descs, self.n_clusters, mode=self.mode, max_iters=self.max_iters
        )
        return self

    def predict(self, descs) -> jnp.ndarray:
        assert self.centroids is not None, "Call fit() first (or set .centroids)"
        descs = jnp.asarray(descs, dtype=jnp.float32)
        return assign_labels(descs, self.centroids, self.mode)

    def fit_predict(self, descs) -> jnp.ndarray:
        self.fit(descs)
        return self.predict(descs)


@functools.partial(jax.jit, static_argnames=("n_clusters", "mode"))
def _shard_stats(shard, centers, n_clusters: int, mode: str):
    """Per-shard Lloyd statistics: (sums [C, D], counts [C])."""
    labels = assign_labels(shard, centers, mode)
    onehot = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)
    sums = jnp.dot(onehot.T, shard.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision=EXACT)
    return sums, jnp.sum(onehot, axis=0)


def kmeans_fit_streamed(
    key: jax.Array,
    descs,
    n_clusters: int,
    mode: str = "cosine",
    max_iters: int = 100,
    shard_rows: int = 100_000,
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Lloyd iterations over a descriptor set BEYOND device memory.

    The fit-side sibling of the blocked retrieval engine: ``descs`` stays on
    host (any array-like incl. ``np.memmap``) and streams through the device
    in ``shard_rows`` slices per iteration; only the [C, D] sums / [C]
    counts accumulate on device. Same init (k distinct sampled rows, the
    given key) and update rule (mean, empty clusters keep their center) as
    ``kmeans_fit`` — on data that fits, the two agree to float-sum
    reordering. Global-vocabulary builds (multi-dataset patch sets that can
    exceed HBM at ViT-G dims) are the target.

    Returns (centers [C, D] on device, labels [N] on host).
    """
    n, _ = descs.shape
    init_idx = np.asarray(
        jax.random.choice(key, n, shape=(n_clusters,), replace=False))
    centers = jnp.asarray(
        np.ascontiguousarray(descs[init_idx]), jnp.float32)

    def shards():
        for lo in range(0, n, shard_rows):
            yield jnp.asarray(np.ascontiguousarray(
                descs[lo: lo + shard_rows]), jnp.float32)

    for _ in range(max_iters):
        sums = jnp.zeros((n_clusters, centers.shape[1]), jnp.float32)
        counts = jnp.zeros((n_clusters,), jnp.float32)
        for shard in shards():
            s, c = _shard_stats(shard, centers, n_clusters, mode)
            sums = sums + s
            counts = counts + c
        centers = _update_centers(sums, counts, centers)

    labels = np.concatenate([
        np.asarray(assign_labels(shard, centers, mode))
        for shard in shards()
    ]) if n else np.zeros((0,), np.int32)
    return centers, labels
