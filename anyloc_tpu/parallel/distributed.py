"""Sharded k-means, retrieval, and extraction over a device mesh.

TPU-native replacements for the reference's multi-device story (SURVEY.md
§2.4): instead of DataParallel replication + FAISS-GPU, the descriptor set /
database shards over the mesh ``data`` axis and the collectives are explicit:

  * k-means: local assignment + ``psum`` of per-cluster sums/counts — the
    classic distributed Lloyd step; result is identical to single-device
    k-means on the concatenated data (modulo f32 summation order);
  * retrieval: each shard computes a local top-k over its database slice,
    the [Q, k] partials all-gather over ICI and a final top-k merges them —
    exact, and the 250k x 49152-d database never materializes on one chip;
  * extraction: plain data parallelism (images sharded, params replicated) —
    no communication at all.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from anyloc_tpu.ops.common import EXACT
from anyloc_tpu.ops.kmeans import _similarity
from anyloc_tpu.parallel.mesh import pad_to_multiple


# ---------------------------------------------------------------------------
# Sharded k-means
# ---------------------------------------------------------------------------

def kmeans_fit_sharded(
    key: jax.Array,
    descs: np.ndarray,
    n_clusters: int,
    mesh: Mesh,
    mode: str = "cosine",
    max_iters: int = 100,
) -> jnp.ndarray:
    """Distributed Lloyd k-means. ``descs`` [N, D] on host; shards over the
    mesh 'data' axis. Returns replicated centers [C, D]."""
    n_dev = mesh.shape["data"]
    n, d = descs.shape
    padded, n_valid = pad_to_multiple(np.asarray(descs, np.float32), n_dev)
    weights = np.zeros((padded.shape[0],), np.float32)
    weights[:n_valid] = 1.0

    # Deterministic init on host: k distinct rows of the (unpadded) data.
    init_idx = np.asarray(
        jax.random.choice(key, n, shape=(n_clusters,), replace=False)
    )
    centers0 = jnp.asarray(padded[init_idx])

    x_sharded = jax.device_put(padded, NamedSharding(mesh, P("data", None)))
    w_sharded = jax.device_put(weights, NamedSharding(mesh, P("data")))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None)),
        out_specs=(P(None, None), P(None)),
        check_vma=False,
    )
    def _local_stats(x_local, w_local, centers):
        sim = _similarity(x_local, centers, mode)
        labels = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(labels, n_clusters, dtype=jnp.float32)
        onehot = onehot * w_local[:, None]
        sums = jnp.dot(
            onehot.T, x_local, preferred_element_type=jnp.float32, precision=EXACT
        )
        counts = jnp.sum(onehot, axis=0)
        # The collective: per-cluster statistics reduce over ICI.
        sums = jax.lax.psum(sums, "data")
        counts = jax.lax.psum(counts, "data")
        return sums, counts

    @jax.jit
    def _fit(x, w, centers0):
        def body(centers, _):
            sums, counts = _local_stats(x, w, centers)
            new = sums / jnp.maximum(counts, 1.0)[:, None]
            new = jnp.where(counts[:, None] > 0, new, centers)
            return new, None

        centers, _ = jax.lax.scan(body, centers0, None, length=max_iters)
        return centers

    return _fit(x_sharded, w_sharded, centers0)


# ---------------------------------------------------------------------------
# Sharded exact top-k retrieval
# ---------------------------------------------------------------------------

_SHARDED_SEARCH_CACHE: dict = {}


def _sharded_search_fn(mesh, method, local_n, n_valid, k, k_local, n_dev,
                       score_dtype="float32"):
    """Build (and cache) the jitted shard_map search — rebuilding the closure
    per call would force a full XLA recompile every invocation."""
    key = (mesh, method, local_n, n_valid, k, k_local, n_dev, score_dtype)
    if key in _SHARDED_SEARCH_CACHE:
        return _SHARDED_SEARCH_CACHE[key]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    def _search(db_local, qu_all):
        shard = jax.lax.axis_index("data")
        offset = shard * local_n
        from anyloc_tpu.ops.common import score_dot

        dot = score_dot(score_dtype)
        if method == "cosine":
            scores = dot(qu_all, db_local.T)
        else:
            qx = dot(qu_all, db_local.T)
            scores = -(
                jnp.sum(qu_all * qu_all, axis=-1, keepdims=True)
                - 2.0 * qx
                + jnp.sum(db_local * db_local, axis=-1)[None, :]
            )
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
        s, i = jax.lax.top_k(scores, k_local)
        return _merge_partials(s, i + offset, s.shape[0], n_dev, k)

    fn = jax.jit(_search)
    _SHARDED_SEARCH_CACHE[key] = fn
    return fn


def top_k_search_sharded(
    db,
    qu: np.ndarray,
    k: int,
    mesh: Mesh,
    method: str = "cosine",
    score_dtype: str = "float32",
    n_valid: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Database-sharded exact top-k. db [Ndb, D] shards over 'data'; queries
    replicate; per-shard top-k partials all-gather and merge. Exact equality
    with the single-device search (ties broken by global index order).
    ``score_dtype='bfloat16'`` scores on the fast MXU path (see
    ops.retrieval.top_k_search).

    ``db`` may be a RESIDENT ``jax.Array`` already padded to the mesh and
    sharded ``P('data', None)`` (long-lived callers like the serving
    daemon avoid a host->device upload per search); pass ``n_valid`` =
    the unpadded row count then, so the zero pad rows mask out."""
    from anyloc_tpu.ops.common import score_dot

    score_dot(score_dtype)  # validate before building the shard_map
    if method not in ("cosine", "l2"):
        raise ValueError(f"Unknown method: {method!r}")
    n_dev = mesh.shape["data"]
    if isinstance(db, jax.Array) and not isinstance(db, np.ndarray):
        if db.shape[0] % n_dev:
            raise ValueError(
                f"resident db rows ({db.shape[0]}) must be pre-padded to "
                f"the mesh ({n_dev}); use parallel.mesh.pad_to_multiple")
        db_sharded = db
        if n_valid is None:
            n_valid = db.shape[0]
    else:
        db_pad, pad_valid = pad_to_multiple(np.asarray(db, np.float32),
                                            n_dev)
        if n_valid is None:
            n_valid = pad_valid  # a caller-supplied count (pre-padded
            # numpy db) must never be overwritten: zero pad rows score
            # 0.0 and would outrank all-negative true matches
        db_sharded = jax.device_put(
            db_pad, NamedSharding(mesh, P("data", None)))
    # clamp like the single-device engine and the pq/ivf siblings — a k
    # beyond the valid rows would return pad indices with +-inf scores
    k = max(1, min(k, n_valid))
    local_n = db_sharded.shape[0] // n_dev
    k_local = min(k, local_n)
    qu_rep = jax.device_put(
        np.asarray(qu, np.float32), NamedSharding(mesh, P(None, None))
    )
    sign = 1.0 if method == "cosine" else -1.0
    fn = _sharded_search_fn(mesh, method, local_n, n_valid, k, k_local, n_dev,
                            score_dtype)
    s, i = fn(db_sharded, qu_rep)
    return np.asarray(sign * s), np.asarray(i)


def get_top_k_recall_sharded(
    top_k, db, qu, gt_pos, mesh, method="cosine", norm_descs=True,
    use_percentage=True, sub_sample_db=1, sub_sample_qu=1,
    score_dtype="float32", engine="device", pq_m=64, n_probe=8,
    opq_iters=0, index=None,
):
    """Sharded-database version of ops.retrieval.get_top_k_recall.

    ``engine``: "device" (exact rows sharded), "pq" (codes sharded,
    ``pq_search_sharded``), "ivf" (f32 cell buckets sharded,
    ``ivf_search_sharded``) or "ivf_pq" (residual-code cell buckets
    sharded, ``ivf_pq_search_sharded``) — the same engine names as the
    single-device API, scaled over the mesh. Pass a prebuilt ``index``
    (PQIndex / IVFIndex / IVFPQIndex) to amortize the fit; otherwise one
    is fit here from ``db`` with ``pq_m`` / ``opq_iters``.
    """
    from anyloc_tpu.ops.retrieval import compute_recalls

    qu = np.asarray(qu, np.float32)
    if qu.ndim == 1:
        qu = qu[None]
    if norm_descs:
        qu = qu / np.maximum(np.linalg.norm(qu, axis=-1, keepdims=True), 1e-12)
    if engine != "device" and index is not None:
        # prebuilt-index fast path: the raw database is NOT touched (at
        # the sharded engines' motivating scale it is tens of GB; two
        # host copies + a normalize pass here would defeat the point)
        db_rows = index.n_rows
    else:
        db = np.asarray(db, np.float32)
        if norm_descs:
            db = db / np.maximum(
                np.linalg.norm(db, axis=-1, keepdims=True), 1e-12)
        db_rows = db.shape[0]
    max_k = min(int(max(top_k)), db_rows)
    if engine == "pq":
        if index is None:
            from anyloc_tpu.ops.pq import pq_fit

            index = pq_fit(db, pq_m, method=method, opq_iters=opq_iters)
        dists, indices = pq_search_sharded(
            index, qu, max_k, mesh, score_dtype=score_dtype)
        if method == "l2":
            # PQIndex.search scores -||q-x̂||^2 + ||q||^2 (higher=better);
            # the recall API returns POSITIVE squared distances, exactly
            # as the single-device wrapper converts (ops/retrieval.py)
            dists = np.sum(qu * qu, axis=1, keepdims=True) - dists
    elif engine == "ivf":
        if score_dtype != "float32":
            # same contract as the single-device wrapper: a silently
            # ignored score_dtype would misreport what ran
            raise ValueError(
                "score_dtype is only supported by the 'device'/'pq'/"
                "'ivf_pq' sharded engines; ivf scores in float32")
        if index is None:
            from anyloc_tpu.ops.ivf import ivf_fit

            index = ivf_fit(db, method=method)
        dists, indices = ivf_search_sharded(
            index, qu, max_k, mesh, n_probe=n_probe)
    elif engine == "ivf_pq":
        if index is None:
            from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

            index = ivf_pq_fit(db, m=pq_m, method=method,
                               opq_iters=opq_iters)
        dists, indices = ivf_pq_search_sharded(
            index, qu, max_k, mesh, n_probe=n_probe,
            score_dtype=score_dtype)
    elif engine == "device":
        dists, indices = top_k_search_sharded(db, qu, max_k, mesh, method,
                                              score_dtype=score_dtype)
    else:
        raise ValueError(f"unknown sharded engine {engine!r}")
    recalls = compute_recalls(
        indices, gt_pos, top_k, use_percentage, sub_sample_db, sub_sample_qu
    )
    return dists, indices, recalls


# ---------------------------------------------------------------------------
# Sharded compressed (PQ/ADC) top-k retrieval
# ---------------------------------------------------------------------------

def _merge_partials(metric, ids, nq, n_dev, k):
    """Inside a shard_map over 'data': all-gather every shard's top-k
    partial and merge to the global top-k. ``metric`` is higher-is-better
    with invalid slots already at -inf (ids -1); the ONE copy of the
    tie/mask-handling merge shared by the exact, pq, ivf and ivf_pq
    sharded engines."""
    m_all = jax.lax.all_gather(metric, "data")
    i_all = jax.lax.all_gather(ids, "data")
    cols = metric.shape[1]
    m_cat = jnp.transpose(m_all, (1, 0, 2)).reshape(nq, n_dev * cols)
    i_cat = jnp.transpose(i_all, (1, 0, 2)).reshape(nq, n_dev * cols)
    best, pos = jax.lax.top_k(m_cat, k)
    return best, jnp.take_along_axis(i_cat, pos, axis=1)


_SHARDED_PQ_CACHE: dict = {}
_SHARDED_STATE_CACHE: dict = {}


def _sharded_index_state(index, mesh, build):
    """Per-(index, mesh) cache of the device-resident sharded arrays so
    repeated searches don't re-materialize + re-upload the code matrix
    (640 MB at 10M rows) every call. Keyed by object identity with a
    weakref guard: a dead or recycled id never serves stale state."""
    import weakref

    key = (id(index), mesh)
    hit = _SHARDED_STATE_CACHE.get(key)
    if hit is not None:
        ref, state = hit
        if ref() is index:
            return state
    state = build()
    try:
        ref = weakref.ref(
            index, lambda _: _SHARDED_STATE_CACHE.pop(key, None))
    except TypeError:  # un-weakref-able index type: don't cache
        return state
    _SHARDED_STATE_CACHE[key] = (ref, state)
    return state


def pq_search_sharded(
    index,
    qu: np.ndarray,
    k: int,
    mesh: Mesh,
    *,
    score_dtype: str = "float32",
    scan: str = "auto",
    db_block: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """PQ (ADC) search with the CODE matrix sharded over the mesh 'data'
    axis — the compressed engine's scale-out: one v5e holds ~10M rows of
    64 B codes (docs/PERFORMANCE.md "PQ"); sharded, an 8-chip slice holds
    ~80M+ while queries replicate and only [Q, k] partials cross ICI.

    ``index`` is a fitted ``ops.pq.PQIndex`` (OPQ rotation honored: the
    replicated queries rotate once on host). Each chip runs the same
    gather-free one-hot ADC scan (``ops/pq._pq_search_block``) over its
    shard; per-shard top-k partials all_gather and a final top-k merges —
    scores and (tie-free) ids equal single-device ``index.search``.
    Returns numpy ``(scores [Q, k], ids [Q, k])``, higher-is-better
    scores exactly like ``PQIndex.search``.
    """
    from anyloc_tpu.ops.pq import _pq_search_block

    qu = np.asarray(qu, np.float32)
    if qu.ndim != 2 or qu.shape[1] != index.dim:
        raise ValueError(f"queries must be [Q, {index.dim}], got {qu.shape}")
    if index.rotation is not None:
        qu = qu @ np.asarray(index.rotation, np.float32)
    n = index.n_rows
    n_dev = mesh.shape["data"]
    local_n = -(-n // n_dev)
    k = max(1, min(k, n))
    k_local = min(k, local_n)
    nq = qu.shape[0]
    if nq == 0:
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
    # queries pad to a block so distinct query counts share one program
    # (the single-device engine's query_block convention)
    qblk = 256
    qb = min(qblk, -(-nq // 8) * 8)
    qu_pad, _ = pad_to_multiple(qu, qb)
    method = index.method  # not index: the jitted closure must not pin it
    ds = index.dim // index.m
    if scan == "auto":
        scan = "decode" if qb > ds else "tables"
    nb = int(min(db_block, local_n))
    key = (mesh, method, local_n, n, k, k_local, qb,
           score_dtype, scan, nb, index.m, index.n_codes)
    fn = _SHARDED_PQ_CACHE.get(key)
    if fn is None:
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None, None), P("data", None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def _search(codebooks, codes_local, qu_all):
            shard = jax.lax.axis_index("data")
            offset = shard * local_n
            # pad rows mask BEFORE the running top-k (n_valid hook): a
            # zero code decodes to the codeword-0 reconstruction and can
            # otherwise evict a true top-k row from this shard's partial
            s, i = _pq_search_block(
                codebooks, codes_local, qu_all, k=k_local, nb=nb,
                method=method, score_dtype=score_dtype, scan=scan,
                n_valid=jnp.maximum(n - offset, 0))
            gi = jnp.where(s > -jnp.inf, i + offset, -1)
            return _merge_partials(s, gi, s.shape[0], n_dev, k)

        fn = jax.jit(_search)
        _SHARDED_PQ_CACHE[key] = fn

    def _build_state():
        codes_pad, _ = pad_to_multiple(np.asarray(index.codes), n_dev)
        return (
            jax.device_put(np.asarray(index.codebooks, np.float32),
                           NamedSharding(mesh, P(None, None, None))),
            jax.device_put(codes_pad, NamedSharding(mesh, P("data", None))),
        )

    cb, codes_dev = _sharded_index_state(index, mesh, _build_state)
    qu_dev = jax.device_put(qu_pad, NamedSharding(mesh, P(None, None)))
    s, i = fn(cb, codes_dev, qu_dev)
    return np.asarray(s)[:nq], np.asarray(i)[:nq]


_SHARDED_IVF_CACHE: dict = {}


def ivf_search_sharded(
    index,
    qu: np.ndarray,
    k: int,
    mesh: Mesh,
    *,
    n_probe: int = 8,
    query_block: int = 64,
    max_workset_mb: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """IVF-flat search with the CELL buckets sharded over the mesh 'data'
    axis — the f32-row pruned engine past one chip's HBM (ivf-flat
    buckets exceed 16 GB at 4M x 512-d, docs/PERFORMANCE.md "PQ" bulk
    table; sharded, the padded row store splits ~1/n_dev per chip).

    Same construction as ``ivf_pq_search_sharded``: replicated coarse
    centroids give every chip the identical global probe; only buckets a
    chip owns contribute candidates (foreign cells mask to id -1), shard
    0 scores the exact overflow pool, and per-shard top-k partials
    all_gather + merge. Results equal ``IVFIndex.search`` (tie-free ids),
    including the full-probe == exact-engine property. As with IVF-PQ,
    sharding buys MEMORY capacity (the [n_cells, cap, D] store splits
    ~1/n_dev per chip), not per-chip scan FLOPs — static shapes stream a
    full n_probe*cap block on every chip.
    """
    from anyloc_tpu.ops.ivf import _ivf_search

    qu = np.asarray(qu, np.float32)
    d = index.buckets.shape[2]
    if qu.ndim != 2 or qu.shape[1] != d:
        raise ValueError(f"queries must be [Q, {d}], got {qu.shape}")
    n_cells_g = index.n_cells
    n_probe = min(n_probe, n_cells_g)
    n_dev = mesh.shape["data"]
    cap = index.buckets.shape[1]
    local_c = -(-n_cells_g // n_dev)
    pad_c = local_c * n_dev - n_cells_g
    n_over = int(index.overflow.shape[0])
    shortlist = n_probe * cap + n_over
    k = max(1, min(k, index.n_rows or shortlist, shortlist))
    nq = qu.shape[0]
    if nq == 0:
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
    row_bytes = n_probe * cap * d * 4
    qb_budget = max(1, (max_workset_mb << 20) // max(1, row_bytes))
    qb = min(query_block, -(-nq // 8) * 8, qb_budget)
    qu_pad, _ = pad_to_multiple(qu, qb)
    nq_pad = qu_pad.shape[0]
    method = index.method

    key = (mesh, method, local_c, cap, d, n_over, k, n_probe, qb, nq_pad)
    fn = _SHARDED_IVF_CACHE.get(key)
    if fn is None:
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None), P("data", None, None),
                      P("data", None), P(None, None), P(None),
                      P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def _search(cells, buckets_l, bids_l, overflow, over_ids, qu_all):
            shard = jax.lax.axis_index("data")
            top, ids = _ivf_search(
                cells, buckets_l, bids_l, overflow, over_ids, qu_all,
                k=k, n_probe=n_probe, method=method, qb=qb,
                local_lo=shard * local_c,
                overflow_gate=(shard == 0).astype(jnp.int32))
            metric = -top if method == "l2" else top  # higher = better
            metric = jnp.where(ids >= 0, metric, -jnp.inf)
            best, mi = _merge_partials(metric, ids, nq_pad, n_dev, k)
            return (-best if method == "l2" else best), mi

        fn = jax.jit(_search)
        _SHARDED_IVF_CACHE[key] = fn

    put = jax.device_put
    shd = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731

    def _build_state():
        buckets_pad, _ = pad_to_multiple(np.asarray(index.buckets), n_dev)
        bids = np.asarray(index.bucket_ids)
        if pad_c:
            bids = np.concatenate(
                [bids, np.full((pad_c, cap), -1, bids.dtype)])
        return (
            put(np.asarray(index.cells, np.float32), shd(None, None)),
            put(buckets_pad, shd("data", None, None)),
            put(bids, shd("data", None)),
            put(np.asarray(index.overflow, np.float32), shd(None, None)),
            put(np.asarray(index.overflow_ids), shd(None)),
        )

    state = _sharded_index_state(index, mesh, _build_state)
    s, i = fn(*state, put(qu_pad, shd(None, None)))
    return np.asarray(s)[:nq], np.asarray(i)[:nq]


_SHARDED_IVFPQ_CACHE: dict = {}


def ivf_pq_search_sharded(
    index,
    qu: np.ndarray,
    k: int,
    mesh: Mesh,
    *,
    n_probe: int = 8,
    score_dtype: str = "float32",
    query_block: int = 16,
    max_workset_mb: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """IVF-PQ search with the CELL buckets sharded over the mesh 'data'
    axis — the serving-regime engine's scale-out (ivf_pq wins qb-8 past
    HBM, docs/PERFORMANCE.md "PQ"; its state is ~1.3 GB at 10M rows, so
    an 8-chip slice holds ~80M+ rows of residual codes).

    Coarse centroids replicate (tiny), so every chip computes the SAME
    global probe ranking; only cells a chip OWNS contribute candidates
    (window mask in ``ops/ivf_pq._ivf_pq_search``), shard 0 scores the
    shared overflow pool, and per-shard top-k partials all_gather + merge.
    The union of shard candidates is exactly the single-device candidate
    set, each bucket CONTRIBUTING once — scores and (tie-free) ids equal
    ``IVFPQIndex.search``. Returns numpy ``(scores, ids)`` with
    ``IVFPQIndex.search`` conventions (l2: positive distances ascending).

    What sharding buys: MEMORY capacity (the code/bucket store splits
    ~1/n_dev per chip), not scan latency — XLA's static shapes mean each
    chip still streams a full n_probe*cap candidate block (foreign cells
    score as masked garbage), so per-chip FLOPs match the single-device
    scan. Size the mesh for the index that doesn't fit, not for qps.
    """
    from anyloc_tpu.ops.ivf_pq import _ivf_pq_search

    qu = np.asarray(qu, np.float32)
    d = index.dim
    if qu.ndim != 2 or qu.shape[1] != d:
        raise ValueError(f"queries must be [Q, {d}], got {qu.shape}")
    if index.rotation is not None:
        qu = qu @ np.asarray(index.rotation, np.float32)
    n_cells_g = index.n_cells
    n_probe = min(n_probe, n_cells_g)
    n_dev = mesh.shape["data"]
    _, cap, m_sub = index.codes.shape
    local_c = -(-n_cells_g // n_dev)
    pad_c = local_c * n_dev - n_cells_g
    n_over = int(index.overflow_codes.shape[0])
    shortlist = n_probe * cap + n_over
    k = max(1, min(k, index.n_rows or shortlist, shortlist))
    nq = qu.shape[0]
    if nq == 0:
        return np.zeros((0, k), np.float32), np.zeros((0, k), np.int32)
    qb = min(query_block, -(-nq // 8) * 8)
    # pad the query count to the block so distinct counts share a program
    qu, _ = pad_to_multiple(qu, qb)
    nq_pad = qu.shape[0]
    mc = m_sub * index.n_codes
    el = 2 if score_dtype == "bfloat16" else 4
    cand_chunk = max(128, (max_workset_mb << 20) // max(1, qb * mc * el))
    cand_chunk = int(min(cand_chunk, n_probe * cap))
    over_chunk = int(max(128, (max_workset_mb << 20) // max(1, mc * el)))
    method = index.method

    key = (mesh, method, local_c, cap, m_sub, index.n_codes, n_over, k,
           n_probe, qb, nq_pad, cand_chunk, over_chunk, score_dtype)
    fn = _SHARDED_IVFPQ_CACHE.get(key)
    if fn is None:
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, None), P(None, None, None),
                      P("data", None, None), P("data", None), P("data", None),
                      P(None, None), P(None), P(None), P(None),
                      P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        def _search(cells, codebooks, codes_l, bids_l, rsq_l,
                    over_codes, over_cell, over_ids, over_rsq, qu_all):
            shard = jax.lax.axis_index("data")
            top, ids = _ivf_pq_search(
                cells, codebooks, codes_l, bids_l, rsq_l,
                over_codes, over_cell, over_ids, over_rsq, qu_all,
                k=k, n_probe=n_probe, method=method, qb=qb,
                cand_chunk=cand_chunk, over_chunk=over_chunk,
                score_dtype=score_dtype,
                local_lo=shard * local_c,
                overflow_gate=(shard == 0).astype(jnp.int32))
            metric = -top if method == "l2" else top  # higher = better
            metric = jnp.where(ids >= 0, metric, -jnp.inf)
            best, mi = _merge_partials(metric, ids, nq_pad, n_dev, k)
            return (-best if method == "l2" else best), mi

        fn = jax.jit(_search)
        _SHARDED_IVFPQ_CACHE[key] = fn

    put = jax.device_put
    shd = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731

    def _build_state():
        codes_pad, _ = pad_to_multiple(np.asarray(index.codes), n_dev)
        bids = np.asarray(index.bucket_ids)
        rsq = np.asarray(index.recon_sq, np.float32)
        if pad_c:  # padded cells are never probed; ids -1 for safety
            bids = np.concatenate(
                [bids, np.full((pad_c, cap), -1, bids.dtype)])
            rsq = np.concatenate(
                [rsq, np.zeros((pad_c, cap), np.float32)])
        return (
            put(np.asarray(index.cells, np.float32), shd(None, None)),
            put(np.asarray(index.codebooks, np.float32),
                shd(None, None, None)),
            put(codes_pad, shd("data", None, None)),
            put(bids, shd("data", None)),
            put(rsq, shd("data", None)),
            put(np.asarray(index.overflow_codes), shd(None, None)),
            put(np.asarray(index.overflow_cell), shd(None)),
            put(np.asarray(index.overflow_ids), shd(None)),
            put(np.asarray(index.overflow_recon_sq, np.float32),
                shd(None)),
        )

    state = _sharded_index_state(index, mesh, _build_state)
    s, i = fn(*state, put(qu, shd(None, None)))
    return np.asarray(s)[:nq], np.asarray(i)[:nq]


# ---------------------------------------------------------------------------
# Data-parallel extraction
# ---------------------------------------------------------------------------

def sharded_extract_fn(apply_fn, mesh: Mesh, as_numpy: bool = True):
    """Wrap a (params, images) -> descriptors function for data-parallel
    execution: images shard over 'data', params replicate, outputs shard.
    No collectives — extraction is embarrassingly parallel across images.

    ``as_numpy=False`` returns the (sharded) device array with the padded
    tail still attached, plus the valid count — for callers that feed the
    result into more device work (fused aggregation) and must not pay a
    host round-trip of the full patch tensor."""
    img_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    jitted = jax.jit(
        apply_fn,
        in_shardings=(rep, img_sharding),
        out_shardings=img_sharding,
    )

    def run(params, images: np.ndarray):
        n_dev = mesh.shape["data"]
        padded, n_valid = pad_to_multiple(np.asarray(images), n_dev)
        out = jitted(params, padded)
        if as_numpy:
            return np.asarray(out)[:n_valid]
        return out, n_valid

    return run
