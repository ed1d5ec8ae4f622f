"""Exact top-k retrieval + Recall@K — the FAISS replacement.

The reference scores retrieval with ``faiss.IndexFlatIP`` (cosine) /
``IndexFlatL2`` and a per-query ``np.isin`` recall loop
(AnyLoc/AnyLoc ``utilities.py:390-469``). On TPU the same exact search is one
``[Q, D] @ [D, Ndb]`` matmul plus ``lax.top_k`` — MXU-bound and trivially
shardable over the database axis (see ``anyloc_tpu.parallel.distributed`` for
the multi-chip merge). Conventions match FAISS:

  * cosine -> returns inner-product scores, descending (IndexFlatIP);
  * l2     -> returns *squared* L2 distances, ascending (IndexFlatL2).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT, l2_normalize


@functools.partial(jax.jit, static_argnames=("k", "method", "score_dtype"))
def top_k_search(
    db: jnp.ndarray, qu: jnp.ndarray, k: int, method: str = "cosine",
    score_dtype: str = "float32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k. db [Ndb, D], qu [Q, D] -> (scores [Q, k], indices [Q, k]).

    ``score_dtype``: "float32" scores with full-precision matmul passes
    (ranking-exact — the default, matching FAISS); "bfloat16" scores on the
    fast MXU path with f32 accumulation — measured 1.65x qps at 100k x
    4096, but near-ties can flip (99.6% top-1 agreement on *random*
    vectors, the worst case; real descriptors with margins agree more).
    """
    from anyloc_tpu.ops.common import score_dot

    dot = score_dot(score_dtype)
    if method == "cosine":
        top, idx = jax.lax.top_k(dot(qu, db.T), k)
        return top, idx
    elif method == "l2":
        # ||q - x||^2 = ||q||^2 - 2 q.x + ||x||^2
        qu = qu.astype(jnp.float32)
        db32 = db.astype(jnp.float32)
        d2 = (
            jnp.sum(qu * qu, axis=-1, keepdims=True)
            - 2.0 * dot(qu, db.T)
            + jnp.sum(db32 * db32, axis=-1)[None, :]
        )
        top_neg, idx = jax.lax.top_k(-d2, k)
        return -top_neg, idx
    raise ValueError(f"Unknown method: {method}")


def _prepare_shard(db: np.ndarray, d0: int, d1: int, stream_dtype: str,
                   normalize_rows: bool = False):
    """Host-side shard packing for the streaming engine. Returns the arrays
    shipped to the device for shard [d0:d1). ``normalize_rows`` L2-normalizes
    the shard here — O(shard) extra memory, vs doubling host RAM by
    normalizing the whole beyond-HBM database up-front."""
    blk = db[d0:d1]
    if normalize_rows:
        blk = blk / np.maximum(
            np.linalg.norm(blk, axis=-1, keepdims=True), 1e-12
        )
    if stream_dtype == "float32":
        return (np.ascontiguousarray(blk, np.float32), None)
    if stream_dtype == "bfloat16":
        import ml_dtypes

        return (np.ascontiguousarray(blk, ml_dtypes.bfloat16), None)
    if stream_dtype == "int8":
        scale = np.maximum(np.abs(blk).max(axis=1, keepdims=True), 1e-12) / 127.0
        q = np.clip(np.rint(blk / scale), -127, 127).astype(np.int8)
        return (q, scale.astype(np.float32))
    raise ValueError(f"Unknown stream_dtype: {stream_dtype}")


def top_k_search_blocked(
    db: np.ndarray,
    qu: np.ndarray,
    k: int,
    method: str = "cosine",
    query_block: int = 1024,
    db_block: int = 131072,
    stream_dtype: str = "float32",
    normalize_rows: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-streaming exact top-k for databases too large for one device
    buffer (the reference's RAM-efficient eval, dvgl_benchmark/test.py:12-119,
    re-thought for TPU).

    Queries are device-resident for the whole search; the database streams
    through the device ONCE, shard by shard, double-buffered so the H2D copy
    of shard i+1 overlaps the matmul+merge of shard i. ``query_block`` only
    bounds the transient [qb, db_block] score matrix. ``stream_dtype``
    trades score precision for link bandwidth — the usual bottleneck of a
    streaming search: "bfloat16" halves the bytes; "int8" (per-row absmax
    quantization, dequantized on device after the matmul) is 4x.
    """
    n_db = db.shape[0]
    n_qu = qu.shape[0]
    k = min(k, n_db)
    if n_db == 0 or n_qu == 0:
        return (np.empty((n_qu, k), np.float32), np.empty((n_qu, k), np.int64))
    if n_db >= 2**31:
        # indices accumulate as int32 on device (int64 needs jax x64 mode);
        # fail loudly rather than silently overflowing the shard offset
        raise ValueError(
            f"blocked engine supports up to 2^31-1 database rows, got {n_db}"
        )
    sign = 1.0 if method == "cosine" else -1.0

    qu_dev = jax.device_put(np.ascontiguousarray(qu, np.float32))
    q_starts = list(range(0, n_qu, query_block))
    best_s = [jnp.full((min(query_block, n_qu - q0), k), -jnp.inf, jnp.float32)
              for q0 in q_starts]
    best_i = [jnp.zeros((min(query_block, n_qu - q0), k), jnp.int32)
              for q0 in q_starts]

    d_starts = list(range(0, n_db, db_block))
    next_dev = jax.device_put(_prepare_shard(
        db, d_starts[0], d_starts[0] + db_block, stream_dtype, normalize_rows))
    for si, d0 in enumerate(d_starts):
        shard = next_dev
        if si + 1 < len(d_starts):  # async prefetch overlaps the merge below
            next_dev = jax.device_put(_prepare_shard(
                db, d_starts[si + 1], d_starts[si + 1] + db_block,
                stream_dtype, normalize_rows))
        blk, scales = shard
        for qi, q0 in enumerate(q_starts):
            qb = jax.lax.dynamic_slice_in_dim(qu_dev, q0, best_s[qi].shape[0])
            best_s[qi], best_i[qi] = _blocked_merge(
                best_s[qi], best_i[qi], blk, scales, qb, d0, k, method, sign
            )
    out_scores = np.concatenate([np.asarray(sign * s) for s in best_s])
    out_idx = np.concatenate([np.asarray(i) for i in best_i]).astype(np.int64)
    return out_scores, out_idx


@functools.partial(jax.jit, static_argnames=("k", "method", "sign"))
def _blocked_merge(best_s, best_i, db_blk, db_scales, qu_blk, offset, k, method, sign):
    """Merge one database shard into the running top-k (module-level jit so
    repeated blocked searches reuse the compiled program).

    ``db_blk`` may be f32, bf16, or int8 (with ``db_scales`` [Nb, 1] for the
    int8 per-row dequantization). Narrow dtypes score via a bf16 matmul with
    f32 accumulation — exactness is already bounded by the quantization, and
    the streaming engine is link-bound, not MXU-bound.
    """
    kk = min(k, db_blk.shape[0])
    if db_blk.dtype == jnp.float32 and db_scales is None:
        s, i = top_k_search(db_blk, qu_blk, kk, method)
    else:
        if db_scales is None:  # bf16 stream
            x = db_blk
        else:  # int8 stream: dequantize into bf16 for the MXU
            x = db_blk.astype(jnp.bfloat16) * db_scales.astype(jnp.bfloat16)
        qx = jnp.dot(
            qu_blk.astype(jnp.bfloat16), x.T, preferred_element_type=jnp.float32
        )
        if method == "cosine":
            s, i = jax.lax.top_k(qx, kk)
        elif method == "l2":
            d2 = (
                jnp.sum(qu_blk * qu_blk, axis=-1, keepdims=True)
                - 2.0 * qx
                + jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)[None, :]
            )
            top_neg, i = jax.lax.top_k(-d2, kk)
            s = -top_neg
        else:
            raise ValueError(f"Unknown method: {method}")
    i = i.astype(jnp.int32) + offset
    cat_s = jnp.concatenate([best_s, sign * s], axis=1)
    cat_i = jnp.concatenate([best_i, i], axis=1)
    top, pos = jax.lax.top_k(cat_s, k)
    return top, jnp.take_along_axis(cat_i, pos, axis=1)


def compute_recalls(
    indices: np.ndarray,
    gt_pos: Sequence[np.ndarray],
    top_k: Sequence[int],
    use_percentage: bool = True,
    sub_sample_db: int = 1,
    sub_sample_qu: int = 1,
) -> Dict[int, float]:
    """Recall@K accumulation matching utilities.py:451-468 exactly, including
    the sub-sample index correction (qu index * sub_sample_qu into gt, and
    retrieved db index * sub_sample_db before membership test).

    Fully vectorized: one ``np.isin`` over composite (query, db) keys
    replaces the reference's per-query Python loop — at the 250k-db / 10k-
    query scale (BASELINE config #5) the loop itself was starting to show."""
    indices = np.asarray(indices)
    n_qu, max_k = indices.shape
    # composite int64 keys: query_row * stride + db_id (collision-free)
    gt_lists = [
        np.asarray(gt_pos[i * sub_sample_qu], np.int64).ravel()
        for i in range(n_qu)
    ]
    scaled = indices.astype(np.int64) * sub_sample_db
    stride = np.int64(
        max(int(scaled.max(initial=0)),
            max((int(g.max()) for g in gt_lists if g.size), default=0)) + 1
    )
    gt_keys = np.concatenate(
        [np.int64(i) * stride + g for i, g in enumerate(gt_lists)]
    ) if any(g.size for g in gt_lists) else np.empty(0, np.int64)
    retr_keys = np.arange(n_qu, dtype=np.int64)[:, None] * stride + scaled
    hits = np.isin(retr_keys, gt_keys)          # [n_qu, max_k]
    any_hit = np.cumsum(hits, axis=1) > 0
    recalls = {
        k: int(any_hit[:, min(k, max_k) - 1].sum()) for k in top_k
    }
    if use_percentage:
        recalls = {k: v / n_qu for k, v in recalls.items()}
    return recalls


def get_top_k_recall(
    top_k: List[int],
    db,
    qu,
    gt_pos,
    method: str = "cosine",
    norm_descs: bool = True,
    use_gpu: bool = False,  # kept for API parity; search always runs on the
    # default JAX device (TPU when available)
    use_percentage: bool = True,
    sub_sample_db: int = 1,
    sub_sample_qu: int = 1,
    engine: str = "device",
    score_dtype: str = "float32",
    ivf_index=None,
    n_probe: int = 8,
    pq_index=None,
    pq_m: int = 64,
    ivf_pq_index=None,
    opq_iters: int = 0,
) -> Tuple[np.ndarray, np.ndarray, Dict[int, float]]:
    """Drop-in equivalent of the reference's ``get_top_k_recall``
    (utilities.py:390-469): returns (distances [Q, max(top_k)],
    indices [Q, max(top_k)], {k: recall}).

    ``engine``: "device" (TPU matmul + lax.top_k, database resident in HBM),
    "blocked" (database streamed through the device shard-by-shard — for
    databases beyond device memory), "native" (the C++ exact-NN library,
    anyloc_tpu.native — host-side FAISS stand-in), "ivf" (approximate
    probed search, ops/ivf.py — the IndexIVFFlat counterpart for
    million-row databases; pass a prebuilt ``ivf_index`` to amortize the
    fit, and tune ``n_probe``), "pq" (compressed-database ADC search,
    ops/pq.py — the IndexPQ counterpart for databases past HBM even at
    int8; pass a prebuilt ``pq_index`` or tune ``pq_m`` bytes/row), or
    "ivf_pq" (probed cells + residual PQ codes, ops/ivf_pq.py — the
    IndexIVFPQ counterpart for >=1M rows at small/mid query batch; pass a
    prebuilt ``ivf_pq_index`` or tune ``pq_m`` + ``n_probe``).

    ``opq_iters > 0`` (pq/ivf_pq fits only) learns an OPQ rotation before
    quantizing — free at search time and worth 2.6-3.4x top-20 recall on
    PCA-projected descriptors (docs/PERFORMANCE.md "OPQ"); ignored when a
    prebuilt index is passed.
    """
    del use_gpu
    if engine == "ivf_pq":
        from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

        qu = np.asarray(qu, np.float32)
        if qu.ndim == 1:
            qu = qu[None, :]
        if norm_descs:
            qu = qu / np.maximum(
                np.linalg.norm(qu, axis=-1, keepdims=True), 1e-12)
        if ivf_pq_index is None:
            db = np.asarray(db, np.float32)
            if norm_descs:
                db = db / np.maximum(
                    np.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
            ivf_pq_index = ivf_pq_fit(db, m=pq_m, method=method,
                                      opq_iters=opq_iters)
        # l2 already returns positive squared distances (ops/ivf_pq.py);
        # score_dtype passes through to the one-hot matmuls
        dists, indices = ivf_pq_index.search(
            qu, int(max(top_k)), n_probe=n_probe, score_dtype=score_dtype)
        dists, indices = np.asarray(dists), np.asarray(indices)
        recalls = compute_recalls(
            indices, gt_pos, top_k, use_percentage,
            sub_sample_db, sub_sample_qu
        )
        return dists, indices, recalls
    if score_dtype != "float32" and engine == "ivf":
        # same contract as blocked/native: a silently ignored score_dtype
        # would misreport what ran
        raise ValueError(
            "score_dtype is only supported by the 'device' engine; the ivf "
            "engine scores in float32")
    if engine == "pq":
        from anyloc_tpu.ops.pq import pq_fit

        qu = np.asarray(qu, np.float32)
        if qu.ndim == 1:
            qu = qu[None, :]
        if norm_descs:
            qu = qu / np.maximum(
                np.linalg.norm(qu, axis=-1, keepdims=True), 1e-12)
        if pq_index is None:
            db = np.asarray(db, np.float32)
            if norm_descs:
                db = db / np.maximum(
                    np.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
            pq_index = pq_fit(db, pq_m, method=method, opq_iters=opq_iters)
        # PQ has its own MXU fast path, so score_dtype passes through
        dists, indices = pq_index.search(
            qu, int(max(top_k)), score_dtype=score_dtype)
        dists, indices = np.asarray(dists), np.asarray(indices)
        if method == "l2":
            # PQIndex.search scores -||q-x̂||^2 + ||q||^2 (higher=better);
            # the exact engines return POSITIVE squared distances
            dists = np.sum(qu * qu, axis=1, keepdims=True) - dists
        recalls = compute_recalls(
            indices, gt_pos, top_k, use_percentage,
            sub_sample_db, sub_sample_qu
        )
        return dists, indices, recalls
    if engine == "ivf":
        from anyloc_tpu.ops.ivf import ivf_fit

        qu = np.asarray(qu, np.float32)
        if qu.ndim == 1:
            qu = qu[None, :]
        if norm_descs:
            qu = qu / np.maximum(
                np.linalg.norm(qu, axis=-1, keepdims=True), 1e-12)
        if ivf_index is None:
            db = np.asarray(db, np.float32)
            if norm_descs:
                db = db / np.maximum(
                    np.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
            ivf_index = ivf_fit(db, method=method)
        # search() itself clamps k to the database size and the shortlist
        dists, indices = ivf_index.search(
            qu, int(max(top_k)), n_probe=n_probe)
        dists, indices = np.asarray(dists), np.asarray(indices)
        recalls = compute_recalls(
            indices, gt_pos, top_k, use_percentage,
            sub_sample_db, sub_sample_qu
        )
        return dists, indices, recalls
    if score_dtype != "float32" and engine != "device":
        # blocked has its own stream_dtype knob; native is host f32 — a
        # silently ignored score_dtype would misreport what ran
        raise ValueError(
            f"score_dtype={score_dtype!r} is only supported by the 'device' "
            f"engine (got engine={engine!r})"
        )
    if engine == "blocked":
        # db stays un-copied on host (it may barely fit RAM): no upfront
        # dtype cast — _prepare_shard converts per streamed shard, so even a
        # float64 input never doubles host RAM here
        db = np.asarray(db)
        qu = np.asarray(qu, dtype=np.float32)
        if qu.ndim == 1:
            qu = qu[None, :]
        if norm_descs:
            qu = qu / np.maximum(
                np.linalg.norm(qu, axis=-1, keepdims=True), 1e-12
            )
        max_k = min(int(max(top_k)), db.shape[0])
        dists, indices = top_k_search_blocked(
            db, qu, max_k, method, normalize_rows=norm_descs
        )
        recalls = compute_recalls(
            indices, gt_pos, top_k, use_percentage, sub_sample_db, sub_sample_qu
        )
        return dists, indices, recalls
    db = jnp.asarray(np.asarray(db), dtype=jnp.float32)
    qu = jnp.asarray(np.asarray(qu), dtype=jnp.float32)
    if qu.ndim == 1:
        qu = qu[None, :]
    if norm_descs:
        db = l2_normalize(db)
        qu = l2_normalize(qu)
    max_k = min(int(max(top_k)), db.shape[0])
    if engine == "native":
        from anyloc_tpu import native

        dists, indices = native.nn_search(
            np.asarray(db), np.asarray(qu), max_k, method
        )
    else:
        dists, indices = top_k_search(db, qu, max_k, method,
                                      score_dtype=score_dtype)
        dists = np.asarray(dists)
        indices = np.asarray(indices)
    recalls = compute_recalls(
        indices, gt_pos, top_k, use_percentage, sub_sample_db, sub_sample_qu
    )
    return dists, indices, recalls
