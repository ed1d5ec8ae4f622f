"""PCA dimensionality reduction on device.

Replaces the reference's sklearn PCA (AnyLoc/AnyLoc ``utilities.py:522-586``
``reduce_pca``) with a JAX SVD — same semantics: fit on train, transform both;
optional whitening; optional ``low_factor`` mixing of lowest-eigenvalue basis
vectors; fallback projection when n_samples < lower_dim.

This is a first-class distributed-ready op because the 250k-image retrieval
config (BASELINE.json config #5) needs 49152-d descriptors reduced before the
database fits per-chip (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT


@functools.partial(jax.jit, static_argnames=("n_components", "whiten"))
def pca_fit(
    x: jnp.ndarray, n_components: int, whiten: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fit PCA on x [N, D]. Returns (mean [D], components [n_components, D],
    scale [n_components]) where transform = ((x - mean) @ components.T) / scale.
    ``scale`` is 1 unless whitening (then sqrt(explained_variance), sklearn
    semantics)."""
    rank = min(x.shape)
    if n_components > rank:
        raise ValueError(
            f"n_components={n_components} exceeds min(n_samples, n_features)="
            f"{rank} (sklearn raises here too; use the low_factor fallback "
            "path of reduce_pca for few-sample regimes)"
        )
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    # full_matrices=False: U [N, r], s [r], vt [r, D]
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    components = vt[:n_components]
    if whiten:
        n = x.shape[0]
        scale = s[:n_components] / jnp.sqrt(jnp.maximum(n - 1, 1))
        scale = jnp.maximum(scale, 1e-12)
    else:
        scale = jnp.ones((n_components,), jnp.float32)
    return mean, components, scale


@jax.jit
def pca_transform(x, mean, components, scale) -> jnp.ndarray:
    return jnp.dot(x.astype(jnp.float32) - mean, components.T, precision=EXACT) / scale


def reduce_pca(
    train_descs: np.ndarray,
    test_descs: np.ndarray,
    lower_dim: int,
    low_factor: float = 0.0,
    fallback: int = 256,
    svd_solver: str = "full",  # API parity; JAX SVD is always exact
    whitening: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop-in equivalent of utilities.py:522-586."""
    del svd_solver
    assert 0 <= low_factor <= 1
    train = jnp.asarray(train_descs, jnp.float32)
    test = jnp.asarray(test_descs, jnp.float32)
    if low_factor == 0.0:
        mean, comps, scale = pca_fit(train, lower_dim, whiten=whitening)
        return (
            np.asarray(pca_transform(train, mean, comps, scale)),
            np.asarray(pca_transform(test, mean, comps, scale)),
        )
    n_samples, n_components = train.shape
    if n_samples < n_components:
        # Too few samples: project everything to `fallback` dims first
        # (fit on the concatenation, as the reference does, :566-575).
        allx = jnp.concatenate([train, test])
        mean, comps, scale = pca_fit(allx, fallback)
        alld = pca_transform(allx, mean, comps, scale)
        train = alld[:n_samples]
        test = alld[n_samples:]
    _down = int(low_factor * lower_dim)
    _up = lower_dim - _down
    n_samples, n_components = train.shape
    rank = min(n_samples, n_components)
    mean, comps, _ = pca_fit(train, rank)
    tf = jnp.concatenate([comps[:_up], comps[rank - _down :]])
    out_train = jnp.dot(train - mean, tf.T)
    out_test = jnp.dot(test - mean, tf.T)
    return np.asarray(out_train), np.asarray(out_test)


def concat_desc_dists_clusters(cluster_centers, descs) -> jnp.ndarray:
    """Residual-concat descriptor (utilities.py:590-619): per-descriptor
    concat of intra-normalized residuals to all centers.
    centers [C, D], descs [N, D] -> [N, C*D]."""
    from anyloc_tpu.ops.common import l2_normalize

    centers = jnp.asarray(cluster_centers, jnp.float32)
    descs = jnp.asarray(descs, jnp.float32)
    dists = descs[:, None, :] - centers[None, :, :]  # [N, C, D]
    ndists = l2_normalize(dists, axis=-1)
    cat = ndists.reshape(descs.shape[0], -1)
    return l2_normalize(cat, axis=-1)
