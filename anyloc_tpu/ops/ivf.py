"""IVF (inverted-file) approximate nearest-neighbor index, TPU-native.

The reference retrieves with FAISS ``IndexFlat`` only — exact search
(utilities.py:390-469). Exact device search here is already fast (a single
[Q, D] x [D, N] matmul + ``lax.top_k``; docs/PERFORMANCE.md), but at
serving scale (millions of rows) the full-database matmul stops paying.
This is the IVF counterpart of FAISS' ``IndexIVFFlat``, designed for the
MXU and XLA's static shapes instead of CPU posting lists:

  * **fit**: k-means the database rows into ``n_cells`` coarse cells
    (ops/kmeans.py — itself one XLA program), then bucket rows into a
    DENSE padded store ``[n_cells, cap, D]`` with a validity mask.
    Cells are capped at ``cap = ceil(N / n_cells * bucket_factor)``;
    overflow rows (cluster skew) go to a small EXACT side pool that every
    query scans, so no row is ever silently unsearchable (FAISS-style
    "quantizer loss" shows up as recall decay, never as a missing item).
  * **search**: queries score the cell centroids (one small matmul), take
    the top ``n_probe`` cells, gather those buckets ([Q, n_probe*cap, D]
    static shape), score them with one batched matmul, merge with the
    overflow pool, ``lax.top_k``. Everything under one jit; gathers are
    contiguous bucket rows (XLA lowers to efficient dynamic-slices).

Recall/speed is the standard IVF dial: n_probe/n_cells. Exactness when
probing every cell is test-enforced (tests/test_retrieval.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT, l2_normalize


@dataclasses.dataclass
class IVFIndex:
    """Fitted IVF index (host-built, device-searchable)."""

    cells: jnp.ndarray        # [n_cells, D] coarse centroids (normalized if cosine)
    buckets: jnp.ndarray      # [n_cells, cap, D] padded row store
    bucket_ids: jnp.ndarray   # [n_cells, cap] int32 original row ids (-1 pad)
    overflow: jnp.ndarray     # [n_over, D] exact side pool (0-row if none)
    overflow_ids: jnp.ndarray  # [n_over] int32
    n_rows: int = 0           # database size (for k clamping)
    # "cosine" scores RAW inner product (the exact engine's FAISS
    # IndexFlatIP semantics; pre-normalize rows for true cosine) with
    # normalized-centroid cell probing; "l2" scores negative squared L2
    method: str = "cosine"

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    def search(self, qu, k: int, n_probe: int = 8,
               query_block: int = 64, max_workset_mb: int = 1024):
        """(scores [Q, k], indices [Q, k]) over the original row ids.

        ``query_block`` bounds the materialized shortlist
        ([qb, n_probe*cap, D] per step — the IVF working set); queries are
        processed in jitted blocks via lax.map. The block is additionally
        auto-clamped so that shortlist gather stays under
        ``max_workset_mb`` — with a skewed database ``cap`` can be large
        (bucket_factor x mean cell size), and qb * n_probe * cap * D * 4
        bytes otherwise scales past HBM (256 queries x 16 probes x
        cap 1954 x 512d = 16 GB, a measured OOM on v5e).

        ``k`` is clamped to the database size and to each query's shortlist
        (n_probe * cap + overflow) — asking for more than the probes can
        surface returns that many columns, like the exact engines clamp to N.
        """
        n_probe = min(n_probe, self.n_cells)
        qu = jnp.asarray(qu, jnp.float32)
        cap = self.buckets.shape[1]
        d = self.buckets.shape[2]
        shortlist = n_probe * cap + int(self.overflow.shape[0])
        k = max(1, min(k, self.n_rows or shortlist, shortlist))
        if qu.shape[0] == 0:
            return (jnp.zeros((0, k), jnp.float32),
                    jnp.zeros((0, k), jnp.int32))
        row_bytes = n_probe * cap * d * 4
        qb_budget = max(1, (max_workset_mb << 20) // max(1, row_bytes))
        qb = min(query_block, qu.shape[0], qb_budget)
        return _ivf_search(
            self.cells, self.buckets, self.bucket_ids,
            self.overflow, self.overflow_ids,
            qu, k=k, n_probe=n_probe, method=self.method, qb=qb,
        )


def ivf_fit(
    db,
    n_cells: Optional[int] = None,
    *,
    method: str = "cosine",
    bucket_factor: float = 2.0,
    max_iters: int = 25,
    seed: int = 0,
    as_numpy: bool = False,
) -> IVFIndex:
    """Build an IVF index over ``db`` [N, D].

    ``n_cells`` defaults to ~sqrt(N) (the FAISS rule of thumb). Bucketing
    runs on host (one pass of numpy scatter) — fit cost is dominated by the
    on-device k-means.
    """
    from anyloc_tpu.ops.kmeans import kmeans_fit

    if method not in ("cosine", "l2"):
        raise ValueError(f"method must be 'cosine' or 'l2', got {method!r}")
    db = np.asarray(db, np.float32)
    n, d = db.shape
    if n_cells is None:
        n_cells = max(1, int(np.sqrt(n)))
    n_cells = min(n_cells, n)
    dev_db = jnp.asarray(db)
    if method == "cosine":
        dev_db = l2_normalize(dev_db, axis=-1)
    centers, labels = kmeans_fit(
        jax.random.PRNGKey(seed), dev_db, n_cells,
        mode="cosine" if method == "cosine" else "euclidean",
        max_iters=max_iters,
    )
    if method == "cosine":
        # store UNIT-NORM centroids: probing ranks cells by q^.c, and raw
        # k-means means have varying norms that would bias the ranking away
        # from the assignment geometry (argmax q^.c^) — rows could sit in
        # cells the probe never ranks first
        centers = l2_normalize(centers, axis=-1)
    labels = np.asarray(labels)
    cap = max(1, int(np.ceil(n / n_cells * bucket_factor)))

    buckets = np.zeros((n_cells, cap, d), np.float32)
    ids = np.full((n_cells, cap), -1, np.int32)
    # vectorized bucketing: rank of each row within its cell via one stable
    # sort (a Python per-row loop would dominate fit at million-row scale)
    order = np.argsort(labels, kind="stable")
    sl = labels[order]
    starts = np.searchsorted(sl, np.arange(n_cells))
    rank = np.arange(n) - starts[sl]
    in_cap = rank < cap
    rows = order[in_cap]
    buckets[sl[in_cap], rank[in_cap]] = db[rows]
    ids[sl[in_cap], rank[in_cap]] = rows
    over = order[~in_cap]
    overflow = db[over] if over.size else np.zeros((0, d), np.float32)
    # as_numpy keeps the per-row stores HOST-resident: callers destined
    # for the sharded engines (serve --mesh) must not pay a full-index
    # upload to device 0 that the sharding exists to avoid
    arr = np.asarray if as_numpy else jnp.asarray
    return IVFIndex(
        cells=np.asarray(centers) if as_numpy else centers,
        buckets=arr(buckets),
        bucket_ids=arr(ids),
        overflow=arr(overflow),
        overflow_ids=arr(over.astype(np.int32)),
        method=method,
        n_rows=n,
    )


@partial(jax.jit, static_argnames=("k", "n_probe", "method", "qb"))
def _ivf_search(cells, buckets, bucket_ids, overflow, overflow_ids, qu,
                *, k: int, n_probe: int, method: str, qb: int,
                local_lo=None, overflow_gate=None):
    """``local_lo``/``overflow_gate``: the cell-sharded hooks, exactly as
    in ops/ivf_pq.py::_ivf_pq_search — ``buckets``/``bucket_ids`` hold
    only the cell window [local_lo, local_lo + buckets.shape[0]) while
    probing stays global over the replicated ``cells``; foreign probed
    cells mask to id -1, and ``overflow_gate`` (traced 0/1) lets exactly
    one shard score the shared overflow pool."""
    nq, d = qu.shape
    n_cells, cap, _ = buckets.shape
    n_blocks = -(-nq // qb)
    pad = n_blocks * qb - nq
    qu = jnp.pad(qu, ((0, pad), (0, 0)))
    def block(q):  # q: [qb, D]
        if method == "cosine":
            # probe with the normalized query against normalized cells
            # (assignment geometry); SCORES stay raw inner product — the
            # exact engine's FAISS IndexFlatIP semantics
            cell_scores = jnp.einsum(
                "qd,cd->qc", l2_normalize(q, axis=-1), cells,
                precision=EXACT)
        else:
            cell_scores = -(
                jnp.sum(q ** 2, -1, keepdims=True)
                - 2.0 * jnp.einsum("qd,cd->qc", q, cells, precision=EXACT)
                + jnp.sum(cells ** 2, -1)[None]
            )
        _, probe = jax.lax.top_k(cell_scores, n_probe)  # [qb, n_probe]
        # shortlist gather: [qb, n_probe*cap, D] — the IVF working set
        if local_lo is None:
            cand = buckets[probe].reshape(qb, n_probe * cap, d)
            cand_ids = bucket_ids[probe].reshape(qb, n_probe * cap)
        else:
            in_loc = (probe >= local_lo) & (probe < local_lo + n_cells)
            lp = jnp.clip(probe - local_lo, 0, n_cells - 1)
            cand = buckets[lp].reshape(qb, n_probe * cap, d)
            cand_ids = jnp.where(
                jnp.broadcast_to(in_loc[:, :, None], (qb, n_probe, cap)),
                bucket_ids[lp], -1).reshape(qb, n_probe * cap)

        if method == "cosine":
            s = jnp.einsum("qnd,qd->qn", cand, q, precision=EXACT)
        else:
            s = -(jnp.sum(cand ** 2, -1)
                  - 2.0 * jnp.einsum("qnd,qd->qn", cand, q, precision=EXACT)
                  + jnp.sum(q ** 2, -1)[:, None])
        s = jnp.where(cand_ids >= 0, s, -jnp.inf)  # mask bucket padding

        if overflow.shape[0]:
            if method == "cosine":
                so = jnp.einsum("nd,qd->qn", overflow, q, precision=EXACT)
            else:
                so = -(jnp.sum(overflow ** 2, -1)[None]
                       - 2.0 * jnp.einsum("nd,qd->qn", overflow, q,
                                          precision=EXACT)
                       + jnp.sum(q ** 2, -1)[:, None])
            o_ids = jnp.broadcast_to(
                overflow_ids[None], (qb, overflow_ids.shape[0]))
            if overflow_gate is not None:
                so = jnp.where(overflow_gate > 0, so, -jnp.inf)
                o_ids = jnp.where(overflow_gate > 0, o_ids, -1)
            s = jnp.concatenate([s, so], axis=1)
            cand_ids = jnp.concatenate([cand_ids, o_ids], axis=1)
        top, pos = jax.lax.top_k(s, k)
        if method == "l2":
            top = -top  # exact engine returns POSITIVE squared distances
        return top, jnp.take_along_axis(cand_ids, pos, axis=1)

    tops, ids = jax.lax.map(block, qu.reshape(n_blocks, qb, d))
    return tops.reshape(-1, k)[:nq], ids.reshape(-1, k)[:nq]


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_ivf(index: IVFIndex, path: str) -> None:
    """Persist a fitted index as one .npz (array-native, no pickles — the
    repo's cache convention; reference FAISS users write_index). The
    ``.npz`` suffix is added if missing (np.savez appends it anyway;
    load_ivf normalizes the same way so a suffix-less path round-trips)."""
    np.savez(
        _npz_path(path),
        cells=np.asarray(index.cells),
        buckets=np.asarray(index.buckets),
        bucket_ids=np.asarray(index.bucket_ids),
        overflow=np.asarray(index.overflow),
        overflow_ids=np.asarray(index.overflow_ids),
        method=np.asarray(index.method),
        n_rows=np.asarray(index.n_rows),
    )


def load_ivf(path: str) -> IVFIndex:
    z = np.load(_npz_path(path), allow_pickle=False)
    return IVFIndex(
        cells=jnp.asarray(z["cells"]),
        buckets=jnp.asarray(z["buckets"]),
        bucket_ids=jnp.asarray(z["bucket_ids"]),
        overflow=jnp.asarray(z["overflow"]),
        overflow_ids=jnp.asarray(z["overflow_ids"]),
        method=str(z["method"]),
        n_rows=int(z["n_rows"]),
    )
