"""IVF-PQ: probed cells + residual PQ codes, TPU-native.

The reference retrieves with FAISS ``IndexFlat`` only (utilities.py:390-469);
FAISS' standard answer past ~1M rows is ``IndexIVFPQ`` — coarse cells prune
the scan, product-quantized residuals compress the rows. This module is that
composition for the MXU, built from this repo's two halves:

  * ops/ivf.py: dense padded cell buckets + overflow pool (no posting
    lists, no silently unsearchable rows);
  * ops/pq.py: gather-free ADC — codes one-hot-expand on the VPU and hit
    score tables with a matmul instead of the CPU/GPU LUT-gather.

Why the composition exists (measured regimes in docs/PERFORMANCE.md "PQ"):
exact search pays O(N*D) per query batch and needs the full-precision rows
in HBM; plain PQ cuts memory ~30x but still scans all N codes per batch —
and its shared one-hot only amortizes at LARGE query batches (at query
batch 8 it collapses: 77 qps at 250k where this engine holds 414); IVF-flat
prunes to n_probe cells but keeps f32 rows. IVF-PQ prunes AND compresses:
per query it touches n_probe*cap codes at M bytes/row. Measured place in
the lineup (v5e, 512-d, uniform db): wherever the f32 database fits HBM
(<= ~4M rows at 512-d) exact still wins outright; past HBM this engine owns
the SMALL-BATCH (serving) regime and plain PQ the bulk regime — the
qb8/qb256 tables in the PQ section.

The scoring identity that keeps the TPU path simple: with residual encoding
x̂ = c_p + decode(code), the inner product splits as

    <q, x̂> = <q, c_p> + sum_m <q_m, cb[m, code_m]>

so the per-query ADC tables t[m, c] = <q_m, cb[m, c]> are CELL-INDEPENDENT
(one [M, C] table per query, not per probed cell), and the cell term is one
row of the q @ cells.T matmul the probe already computed. L2 needs only one
extra query-independent scalar per row, ||x̂||^2, precomputed at fit:

    -||q - x̂||^2 = -(||q||^2 - 2 <q, x̂> + ||x̂||^2).

Bucket rows score through a per-query-block batched one-hot matvec
(chunked so the transient one-hot stays bounded); the shared overflow pool
scores through plain PQ's shared one-hot matmul. Probing every cell is
exact over the reconstructions — test-enforced (tests/test_ivf_pq.py).
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
class IVFPQIndex:
    """Fitted IVF-PQ index. Search state is cells + codebooks + uint8 codes
    (+ one f32 per row for l2) — original vectors are NOT kept."""

    cells: jnp.ndarray          # [n_cells, D] coarse centroids
    codebooks: jnp.ndarray      # [M, C, ds] RESIDUAL codebooks (shared)
    codes: jnp.ndarray          # [n_cells, cap, M] uint8 bucketed codes
    bucket_ids: jnp.ndarray     # [n_cells, cap] int32 original ids (-1 pad)
    recon_sq: jnp.ndarray       # [n_cells, cap] f32 ||x̂||^2 (0 at pads)
    overflow_codes: jnp.ndarray   # [n_over, M] uint8 (cluster-skew spill)
    overflow_cell: jnp.ndarray    # [n_over] int32 assigned cell per row
    overflow_ids: jnp.ndarray     # [n_over] int32
    overflow_recon_sq: jnp.ndarray  # [n_over] f32
    n_rows: int = 0
    # "cosine" scores the raw inner product <q, x̂> (the exact engine's
    # FAISS IndexFlatIP semantics; pre-normalize rows for true cosine);
    # "l2" returns POSITIVE approximate squared distances like ops/ivf.py
    method: str = "cosine"
    # optional OPQ rotation [D, D] (FAISS "OPQ,IVF...,PQ" pretransform):
    # cells AND codes live in the rotated space; queries rotate at search.
    # Orthogonality preserves inner products and L2, so probe geometry and
    # scores keep their original-space meaning exactly.
    rotation: Optional[jnp.ndarray] = None

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def n_codes(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dim(self) -> int:
        return self.cells.shape[1]

    def search(self, qu, k: int, n_probe: int = 8,
               query_block: int = 16, max_workset_mb: int = 256,
               score_dtype: str = "float32"):
        """ADC top-k over probed cells. qu [Q, D] -> (scores [Q, k],
        indices [Q, k]) in original row ids.

        Scores follow ops/ivf.py's conventions: "cosine" returns the raw
        inner product of the query with the PQ reconstruction (higher is
        better); "l2" returns positive approximate squared distances
        (lower is better; columns ascend). ``score_dtype`` is the operand
        dtype of the one-hot matmuls — "float32" reproduces ADC exactly,
        "bfloat16" takes the fast MXU path (~1e-2 relative).

        ``max_workset_mb`` bounds the transient one-hot block
        (qb x cand_chunk x M*C elements) — the scan's only large
        intermediate; the candidate axis chunks to fit.
        """
        n_probe = min(n_probe, self.n_cells)
        qu = jnp.asarray(qu, jnp.float32)
        d = self.dim
        if qu.ndim != 2 or qu.shape[1] != d:
            raise ValueError(f"queries must be [Q, {d}], got {qu.shape}")
        if self.rotation is not None:
            qu = qu @ self.rotation  # into the OPQ-rotated index space
        cap = self.codes.shape[1]
        n_over = int(self.overflow_codes.shape[0])
        shortlist = n_probe * cap + n_over
        k = max(1, min(k, self.n_rows or shortlist, shortlist))
        if qu.shape[0] == 0:
            return (jnp.zeros((0, k), jnp.float32),
                    jnp.zeros((0, k), jnp.int32))
        if score_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"Unknown score_dtype: {score_dtype!r}")
        qb = min(query_block, qu.shape[0])
        mc = self.m * self.n_codes
        el = 2 if score_dtype == "bfloat16" else 4
        # candidate rows per one-hot chunk, floor 128 (sublane-friendly)
        cand_chunk = max(128, (max_workset_mb << 20) // max(1, qb * mc * el))
        cand_chunk = min(cand_chunk, n_probe * cap)
        over_chunk = max(128, (max_workset_mb << 20) // max(1, mc * el))
        return _ivf_pq_search(
            self.cells, self.codebooks, self.codes, self.bucket_ids,
            self.recon_sq, self.overflow_codes, self.overflow_cell,
            self.overflow_ids, self.overflow_recon_sq, qu,
            k=k, n_probe=n_probe, method=self.method, qb=qb,
            cand_chunk=int(cand_chunk), over_chunk=int(over_chunk),
            score_dtype=score_dtype)

    def decode(self, rows: Optional[np.ndarray] = None) -> np.ndarray:
        """Reconstructions x̂ = c_cell + decode(code) [*, D] for ``rows``
        (default: all, in original row order) — what ADC scores against."""
        cells = np.asarray(self.cells)
        cb = np.asarray(self.codebooks)          # [M, C, ds]
        m = cb.shape[0]
        out = np.zeros((self.n_rows, cells.shape[1]), np.float32)
        ids = np.asarray(self.bucket_ids)         # [n_cells, cap]
        codes = np.asarray(self.codes)            # [n_cells, cap, M]
        valid = ids >= 0
        cell_of = np.broadcast_to(
            np.arange(ids.shape[0])[:, None], ids.shape)[valid]
        res = cb[np.arange(m)[None], codes[valid].astype(np.int64)]
        out[ids[valid]] = cells[cell_of] + res.reshape(res.shape[0], -1)
        o_ids = np.asarray(self.overflow_ids)
        if o_ids.size:
            o_res = cb[np.arange(m)[None],
                       np.asarray(self.overflow_codes).astype(np.int64)]
            out[o_ids] = (cells[np.asarray(self.overflow_cell)]
                          + o_res.reshape(o_ids.size, -1))
        if rows is not None:
            out = out[np.asarray(rows)]
        if self.rotation is not None:  # back to the original space
            out = out @ np.asarray(self.rotation).T
        return out


@partial(jax.jit, static_argnames=(
    "k", "n_probe", "method", "qb", "cand_chunk", "over_chunk",
    "score_dtype"))
def _ivf_pq_search(cells, codebooks, codes, bucket_ids, recon_sq,
                   over_codes, over_cell, over_ids, over_rsq, qu, *,
                   k, n_probe, method, qb, cand_chunk, over_chunk,
                   score_dtype, local_lo=None, overflow_gate=None):
    """``local_lo``/``overflow_gate`` are the cell-sharded hooks
    (parallel/distributed.py::ivf_pq_search_sharded): when ``local_lo`` is
    a traced scalar, ``codes``/``bucket_ids``/``recon_sq`` hold only the
    cell window [local_lo, local_lo + codes.shape[0]) of a cell-sharded
    index — probing stays GLOBAL over the replicated ``cells``, and probed
    cells outside the window mask out via id -1 (so the union over shards
    scores exactly the single-device candidate set, each bucket once).
    ``overflow_gate`` (traced 0/1) masks the shared overflow pool so only
    one shard scores it. ``None``/``None`` is the unsharded behavior."""
    nq, d = qu.shape
    n_cells, cap, m = codes.shape
    c = codebooks.shape[1]
    n_over = over_codes.shape[0]
    if method not in ("cosine", "l2"):
        raise ValueError(f"Unknown method: {method}")
    # bf16 one-hot + tables on the MXU; XLA:CPU has no bf16 dot thunk, so
    # off-TPU tests emulate with rounded-to-bf16 values in an f32 dot
    # (same rounding) — mirrors ops/pq.py
    if score_dtype == "bfloat16":
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        prec = None

        def cast(x):
            return x.astype(jnp.bfloat16).astype(dt)
    else:
        dt, prec = jnp.float32, EXACT

        def cast(x):
            return x

    code_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    n_blocks = -(-nq // qb)
    qu = jnp.pad(qu, ((0, n_blocks * qb - nq), (0, 0)))

    # candidate axis padded so chunks tile evenly; pad slots mask via id -1
    L = n_probe * cap
    n_chunks = -(-L // cand_chunk)
    pad_l = n_chunks * cand_chunk - L
    n_ochunks = -(-n_over // over_chunk) if n_over else 0
    pad_o = n_ochunks * over_chunk - n_over

    def block(q):  # q: [qb, D]
        # one matmul serves probing AND the per-row cell term <q, c_p>
        cell_dot = jnp.einsum("qd,cd->qc", q, cells, precision=EXACT,
                              preferred_element_type=jnp.float32)
        if method == "l2":
            probe_score = 2.0 * cell_dot - jnp.sum(cells * cells, -1)[None]
        else:
            # cosine cells are unit-norm (fit), so raw <q, c> ranks cells
            # identically to the normalized-query probe (positive scale)
            probe_score = cell_dot
        _, probe = jax.lax.top_k(probe_score, n_probe)    # [qb, n_probe]

        # cell-independent ADC tables: t[q, m, c] = <q_m, cb[m, c]>
        t = jnp.einsum("qmd,mcd->qmc", q.reshape(qb, m, d // m), codebooks,
                       precision=EXACT, preferred_element_type=jnp.float32)
        t_flat = cast(t.reshape(qb, m * c))               # [qb, M*C]

        if local_lo is None:
            cand_codes = codes[probe].reshape(qb, L, m)   # uint8 gather
            cand_ids = bucket_ids[probe].reshape(qb, L)
            cand_rsq = recon_sq[probe].reshape(qb, L)
        else:
            # cell-sharded window: gather clamps into the local slab;
            # probed cells another shard owns mask to id -1 (their clamped
            # garbage scores fall to -inf below)
            in_loc = (probe >= local_lo) & (probe < local_lo + n_cells)
            lp = jnp.clip(probe - local_lo, 0, n_cells - 1)
            cand_codes = codes[lp].reshape(qb, L, m)
            cand_ids = jnp.where(
                jnp.broadcast_to(in_loc[:, :, None], (qb, n_probe, cap)),
                bucket_ids[lp], -1).reshape(qb, L)
            cand_rsq = recon_sq[lp].reshape(qb, L)
        bias = jnp.take_along_axis(cell_dot, probe, axis=1)  # [qb, n_probe]
        bias = jnp.broadcast_to(bias[:, :, None],
                                (qb, n_probe, cap)).reshape(qb, L)
        if pad_l:
            cand_codes = jnp.pad(cand_codes, ((0, 0), (0, pad_l), (0, 0)))
            cand_ids = jnp.pad(cand_ids, ((0, 0), (0, pad_l)),
                               constant_values=-1)
            cand_rsq = jnp.pad(cand_rsq, ((0, 0), (0, pad_l)))
            bias = jnp.pad(bias, ((0, 0), (0, pad_l)))

        def score_chunk(cc):  # cc: [qb, cand_chunk, M] uint8
            oh = (cc.astype(jnp.int32)[..., None] ==
                  code_iota[None]).astype(dt)              # [qb, R, M, C]
            return jnp.einsum(
                "qrx,qx->qr", oh.reshape(qb, cand_chunk, m * c), t_flat,
                precision=prec, preferred_element_type=jnp.float32)

        adc = jax.lax.map(
            score_chunk,
            jnp.moveaxis(
                cand_codes.reshape(qb, n_chunks, cand_chunk, m), 1, 0))
        core = jnp.moveaxis(adc, 0, 1).reshape(qb, n_chunks * cand_chunk)
        core = core + bias                                  # <q, x̂>
        if method == "l2":
            q2 = jnp.sum(q * q, -1, keepdims=True)
            s = -(q2 - 2.0 * core + cand_rsq)
        else:
            s = core
        s = jnp.where(cand_ids >= 0, s, -jnp.inf)

        if n_over:
            # shared pool: plain-PQ-style one-hot SHARED across the block
            oc = jnp.pad(over_codes, ((0, pad_o), (0, 0)))

            def over_chunk_fn(occ):  # [over_chunk, M] uint8
                oh = (occ.astype(jnp.int32)[..., None] ==
                      code_iota).astype(dt)
                return jnp.dot(oh.reshape(over_chunk, m * c), t_flat.T,
                               precision=prec,
                               preferred_element_type=jnp.float32)

            so = jax.lax.map(
                over_chunk_fn, oc.reshape(n_ochunks, over_chunk, m))
            so = so.reshape(n_ochunks * over_chunk, qb)[:n_over].T
            so = so + cell_dot[:, over_cell]                # <q, c_of_row>
            if method == "l2":
                so = -(q2 - 2.0 * so + over_rsq[None])
            over_ids_b = jnp.broadcast_to(over_ids[None], (qb, n_over))
            if overflow_gate is not None:
                # cell-sharded: one shard owns the shared pool; the rest
                # mask it so merged candidates never duplicate a row
                so = jnp.where(overflow_gate > 0, so, -jnp.inf)
                over_ids_b = jnp.where(overflow_gate > 0, over_ids_b, -1)
            s = jnp.concatenate([s, so], axis=1)
            cand_ids = jnp.concatenate([cand_ids, over_ids_b], axis=1)
        top, pos = jax.lax.top_k(s, k)
        if method == "l2":
            top = -top  # positive squared distances, like ops/ivf.py
        return top, jnp.take_along_axis(cand_ids, pos, axis=1)

    tops, ids = jax.lax.map(block, qu.reshape(n_blocks, qb, d))
    return tops.reshape(-1, k)[:nq], ids.reshape(-1, k)[:nq]


def ivf_pq_fit(
    db,
    n_cells: Optional[int] = None,
    *,
    m: int = 64,
    n_codes: int = 256,
    method: str = "cosine",
    bucket_factor: float = 2.0,
    coarse_iters: int = 25,
    pq_iters: int = 25,
    seed: int = 0,
    train_rows: int = 1 << 18,
    encode_block: int = 1 << 16,
    opq_iters: int = 0,
    as_numpy: bool = False,
) -> IVFPQIndex:
    """Build an IVF-PQ index over ``db`` [N, D] (numpy or memmap).

    Coarse k-means and the M per-subspace residual k-means both train on a
    uniform sample of at most ``train_rows`` rows (the FAISS practice —
    fitting codebooks on every row buys nothing); encoding then streams the
    whole database through the device in ``encode_block`` chunks, so fit
    memory never holds the f32 database on-chip. ``n_cells`` defaults to
    ~sqrt(N). Residuals are encoded against the ASSIGNED cell (cosine:
    unit-norm cells; assignment by inner product, which is scale-invariant
    in the row) with codebooks shared across cells, exactly the
    IndexIVFPQ layout.

    ``opq_iters > 0`` first learns an OPQ rotation on the raw sample
    (ops/pq.py ``opq_train`` — the FAISS "OPQ,IVF...,PQ" pretransform);
    cells and codes then live in the rotated space and queries rotate
    transparently at search.
    """
    from anyloc_tpu.ops.kmeans import kmeans_fit

    if method not in ("cosine", "l2"):
        raise ValueError(f"method must be 'cosine' or 'l2', got {method!r}")
    if not 2 <= n_codes <= 256:
        raise ValueError(f"n_codes must be in [2, 256], got {n_codes}")
    n, d = db.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible into m={m} subspaces")
    if n < n_codes:
        raise ValueError(f"need >= n_codes={n_codes} rows, got {n}")
    if n_cells is None:
        n_cells = max(1, int(np.sqrt(n)))
    # coarse centers come from the sample, so it must cover them
    n_cells = min(n_cells, n, train_rows)
    ds = d // m

    rng = np.random.default_rng(seed)
    if n > train_rows:
        sample = np.asarray(
            db[np.sort(rng.choice(n, train_rows, replace=False))],
            np.float32)
    else:
        sample = np.asarray(db, np.float32)
    rotation = None
    if opq_iters:
        from anyloc_tpu.ops.pq import opq_train

        rotation = opq_train(sample, m, n_codes=n_codes,
                             opq_iters=opq_iters, seed=seed)
        sample = sample @ rotation
    dev_sample = jnp.asarray(sample)
    if method == "cosine":
        dev_sample = l2_normalize(dev_sample, axis=-1)
    cells, _ = kmeans_fit(
        jax.random.PRNGKey(seed), dev_sample, n_cells,
        mode="cosine" if method == "cosine" else "euclidean",
        max_iters=coarse_iters)
    if method == "cosine":
        # unit-norm cells: probe ranking (raw <q, c>) then matches the
        # assignment geometry — see ops/ivf.py ivf_fit for the rationale
        cells = l2_normalize(cells, axis=-1)

    # residual codebooks on the sample's residuals, one vmapped program
    lab_s = np.asarray(_assign_cells(cells, jnp.asarray(sample), method))
    res_s = sample - np.asarray(cells)[lab_s]
    sub = jnp.asarray(res_s.reshape(-1, m, ds).transpose(1, 0, 2))
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), m)
    fit = partial(kmeans_fit, n_clusters=n_codes, mode="euclidean",
                  max_iters=pq_iters)
    codebooks, _ = jax.vmap(fit)(keys, sub)               # [M, C, ds]

    # stream-encode every row: cell label + residual codes + ||x̂||^2
    labels = np.empty(n, np.int32)
    all_codes = np.empty((n, m), np.uint8)
    rsq = np.empty(n, np.float32)
    if rotation is None:
        enc = jax.jit(partial(_encode_block, method=method))
    else:
        rot_dev = jnp.asarray(rotation)
        enc = jax.jit(lambda ce, cb, ch: _encode_block(
            ce, cb, ch @ rot_dev, method=method))
    for i0 in range(0, n, encode_block):
        chunk = jnp.asarray(np.asarray(db[i0:i0 + encode_block], np.float32))
        lab, cod, r2 = enc(cells, codebooks, chunk)
        sl = slice(i0, i0 + chunk.shape[0])
        labels[sl] = np.asarray(lab)
        all_codes[sl] = np.asarray(cod)
        rsq[sl] = np.asarray(r2)

    # dense bucketing, vectorized exactly like ops/ivf.py ivf_fit
    cap = max(1, int(np.ceil(n / n_cells * bucket_factor)))
    b_codes = np.zeros((n_cells, cap, m), np.uint8)
    ids = np.full((n_cells, cap), -1, np.int32)
    b_rsq = np.zeros((n_cells, cap), np.float32)
    order = np.argsort(labels, kind="stable")
    sl = labels[order]
    starts = np.searchsorted(sl, np.arange(n_cells))
    rank = np.arange(n) - starts[sl]
    in_cap = rank < cap
    rows = order[in_cap]
    b_codes[sl[in_cap], rank[in_cap]] = all_codes[rows]
    ids[sl[in_cap], rank[in_cap]] = rows
    b_rsq[sl[in_cap], rank[in_cap]] = rsq[rows]
    over = order[~in_cap].astype(np.int32)
    arr = np.asarray if as_numpy else jnp.asarray
    return IVFPQIndex(
        cells=arr(cells),
        codebooks=arr(codebooks),
        codes=arr(b_codes),
        bucket_ids=arr(ids),
        recon_sq=arr(b_rsq),
        overflow_codes=arr(all_codes[over]
                           if over.size else np.zeros((0, m), np.uint8)),
        overflow_cell=arr(labels[over].astype(np.int32)),
        overflow_ids=arr(over),
        overflow_recon_sq=arr(rsq[over]),
        n_rows=n,
        method=method,
        rotation=None if rotation is None else arr(rotation),
    )


def _assign_cells(cells, x, method):
    """Coarse cell per row: cosine by inner product against unit-norm cells
    (scale-invariant in x), l2 by squared distance."""
    dot = jnp.einsum("bd,cd->bc", x, cells, precision=EXACT,
                     preferred_element_type=jnp.float32)
    if method == "l2":
        return jnp.argmax(2.0 * dot - jnp.sum(cells * cells, -1)[None], -1)
    return jnp.argmax(dot, -1)


def _encode_block(cells, codebooks, chunk, *, method):
    """(labels, residual codes, ||x̂||^2) for one streamed chunk."""
    m, _, ds = codebooks.shape
    lab = _assign_cells(cells, chunk, method)
    res = chunk - cells[lab]
    xs = res.reshape(res.shape[0], m, ds)
    xc = jnp.einsum("bmd,mcd->bmc", xs, codebooks, precision=EXACT,
                    preferred_element_type=jnp.float32)
    c2 = jnp.sum(codebooks * codebooks, axis=-1)
    cod = jnp.argmax(2.0 * xc - c2[None], axis=-1)
    res_hat = jnp.take_along_axis(
        codebooks[None], cod[:, :, None, None], axis=2)[:, :, 0]
    xhat = cells[lab] + res_hat.reshape(res.shape[0], -1)
    return lab.astype(jnp.int32), cod.astype(jnp.uint8), jnp.sum(
        xhat * xhat, axis=-1)


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_ivf_pq(index: IVFPQIndex, path: str) -> None:
    np.savez_compressed(
        _npz_path(path),
        cells=np.asarray(index.cells),
        codebooks=np.asarray(index.codebooks),
        codes=np.asarray(index.codes),
        bucket_ids=np.asarray(index.bucket_ids),
        recon_sq=np.asarray(index.recon_sq),
        overflow_codes=np.asarray(index.overflow_codes),
        overflow_cell=np.asarray(index.overflow_cell),
        overflow_ids=np.asarray(index.overflow_ids),
        overflow_recon_sq=np.asarray(index.overflow_recon_sq),
        n_rows=np.asarray(index.n_rows),
        method=np.asarray(index.method),
        **({"rotation": np.asarray(index.rotation)}
           if index.rotation is not None else {}),
    )


def load_ivf_pq(path: str) -> IVFPQIndex:
    z = np.load(_npz_path(path), allow_pickle=False)
    return IVFPQIndex(
        cells=jnp.asarray(z["cells"]),
        codebooks=jnp.asarray(z["codebooks"]),
        codes=jnp.asarray(z["codes"]),
        bucket_ids=jnp.asarray(z["bucket_ids"]),
        recon_sq=jnp.asarray(z["recon_sq"]),
        overflow_codes=jnp.asarray(z["overflow_codes"]),
        overflow_cell=jnp.asarray(z["overflow_cell"]),
        overflow_ids=jnp.asarray(z["overflow_ids"]),
        overflow_recon_sq=jnp.asarray(z["overflow_recon_sq"]),
        n_rows=int(z["n_rows"]),
        method=str(z["method"]),
        rotation=jnp.asarray(z["rotation"]) if "rotation" in z.files
        else None,
    )
