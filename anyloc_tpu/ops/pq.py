"""Product-quantization (PQ) compressed search, TPU-native.

The reference retrieves with FAISS ``IndexFlat`` only (utilities.py:390-469)
— exact search over the full-precision database. This repo already covers
that regime (ops/retrieval.py device/blocked/sharded engines, ops/ivf.py
probed ANN); what none of those can do is hold a database that does not fit
HBM even compressed to int8: the SOTA 49152-dim descriptor at 10M rows is
2 TB f32, and even PCA-512 f32 is 20 GB. PQ is the classic answer (FAISS
``IndexPQ`` / the PQ half of ``IndexIVFPQ``, Jegou et al. TPAMI 2011):
split D into M subspaces, k-means each to 256 codewords, store each row as
M uint8 codes (e.g. 512d -> 64 B/row: 10M rows = 640 MB on-chip), and
score queries against codes via per-subspace lookup tables (asymmetric
distance, ADC).

ADC is a gather workload on CPU/GPU (SIMD shuffles / shared-memory LUTs).
TPUs hate gathers — so the scan here is reformulated for the MXU with NO
gather at all, in two interchangeable forms (``search(scan=...)``):

  * "tables" (small query batches): per-query lookup tables
    ``[Qb, M, ds] x [M, C, ds] -> [M, C, Qb]`` (tiny), then codes
    one-hot-expand on the VPU (an iota compare) to ``[nb, M*C]`` and hit
    the flattened tables with ONE matmul ``[nb, M*C] @ [M*C, Qb]`` per
    database chunk — the one-hot rows select exactly the M table entries
    ADC would have gathered. Cost: nb x (M*C) x Qb MACs.
  * "decode" (batched queries): the same one-hot instead reconstructs the
    chunk rows (``[nb, M, C] x [M, C, ds]``, query-independent) and the
    reconstruction dots the queries — q.x̂ IS the ADC table sum, and the
    C-fold compute inflation of per-query tables drops out. Cost:
    nb x D x (C + Qb) MACs — ~M*C/(D) = C/ds times cheaper per query at
    large Qb (16x for PQ64 @ 512d); crossover near Qb = ds.

Chunks merge through a running top-k (same pattern as the streaming
engine), so HBM holds only the uint8 codes plus one [nb, Qb] score block
(and the transient one-hot, which XLA materializes per chunk).

Regime guidance (measured: docs/PERFORMANCE.md "PQ"): exact search wins
EVERYWHERE the f32 database fits HBM (on v5e at 512-d that is ~4M rows —
exact beat this engine 5.6k vs 0.7k qps at 4M, bulk batch); PQ's regime is
memory, not speed: it is the single-chip route once the database cannot be
HBM-resident (>= ~8M rows at 512-d; at the raw 49152-d SOTA descriptor,
>= ~80k rows), where its ~30x compression (64 B/row) keeps the scan
on-chip. Within PQ, the decode scan + bf16 scoring wins bulk batches
(2.7k qps at 1M/qb256 vs 0.5-0.6k for table scan); small query batches
belong to ivf_pq (ops/ivf_pq.py), which prunes the scan PQ always pays.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.common import EXACT


@dataclasses.dataclass
class PQIndex:
    """Fitted PQ index. Search state is the codebooks + uint8 codes only —
    the original vectors are NOT kept (that is the point)."""

    codebooks: jnp.ndarray   # [M, C, ds] f32 per-subspace centroids
    codes: jnp.ndarray       # [N, M] uint8 database codes (device)
    # "cosine" scores the raw inner product <q, decode(code)> (the exact
    # engine's FAISS IndexFlatIP semantics; pre-normalize rows for true
    # cosine); "l2" scores -||q - decode(code)||^2 (+ ||q||^2, constant
    # per query — ranking-equivalent)
    method: str = "l2"
    # optional OPQ rotation [D, D] (orthogonal; FAISS OPQMatrix
    # counterpart, Ge et al. CVPR 2013): codes live in the rotated space
    # x @ R, queries rotate at search. Rotation preserves inner products
    # and L2, so scores keep their original-space meaning exactly.
    rotation: Optional[jnp.ndarray] = None

    @property
    def n_rows(self) -> int:
        return self.codes.shape[0]

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def n_codes(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dim(self) -> int:
        return self.codebooks.shape[0] * self.codebooks.shape[2]

    def search(self, qu, k: int, query_block: int = 256,
               db_block: int = 8192, score_dtype: str = "float32",
               scan: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ADC top-k. qu [Q, D] -> (scores [Q, k], indices [Q, k]).

        Scores are the asymmetric PQ approximation of the exact engine's
        (higher is better; for "l2" they are -||q-x̂||^2 + ||q||^2 —
        identical ranking, shifted value). ``score_dtype`` is the operand
        dtype of the one-hot matmuls: "float32" reproduces ADC exactly;
        "bfloat16" rounds operands to bf16 (~1e-2 relative) on the fast
        MXU path.

        ``scan`` picks the ADC formulation (same math, different FLOPs):

          * "tables": one-hot codes hit per-query lookup tables —
            ``nb x (M*C) x Qb`` MACs. Wins for small query batches.
          * "decode": one-hot codes reconstruct the chunk
            (``nb x C x D`` MACs, query-independent) and the chunk dots
            the queries (``nb x D x Qb``). The C-fold table inflation
            drops out; wins once the query batch exceeds roughly the
            subspace width ds = D/M (crossover Qb* = ds*C/(C-ds)).
          * "auto": decode iff the padded query block > ds.
        """
        qu = jnp.asarray(qu, jnp.float32)
        n, d = self.n_rows, self.dim
        if qu.ndim != 2 or qu.shape[1] != d:
            raise ValueError(f"queries must be [Q, {d}], got {qu.shape}")
        if self.rotation is not None:
            qu = qu @ self.rotation  # into the OPQ-rotated code space
        k = max(1, min(k, n))
        if qu.shape[0] == 0:
            return (jnp.zeros((0, k), jnp.float32),
                    jnp.zeros((0, k), jnp.int32))
        nb = int(min(db_block, max(1, n)))
        qb = int(min(query_block, qu.shape[0]))
        if scan == "auto":
            scan = "decode" if qb > d // self.m else "tables"
        if scan not in ("tables", "decode"):
            raise ValueError(f"Unknown scan: {scan!r}")
        outs, idxs = [], []
        for q0 in range(0, qu.shape[0], qb):
            blk = qu[q0:q0 + qb]
            pad = qb - blk.shape[0]
            if pad:  # last block pads up so every block shares one program
                blk = jnp.concatenate(
                    [blk, jnp.zeros((pad, d), jnp.float32)], axis=0)
            s, i = _pq_search_block(
                self.codebooks, self.codes, blk, k=k, nb=nb,
                method=self.method, score_dtype=score_dtype, scan=scan)
            outs.append(s[:qb - pad] if pad else s)
            idxs.append(i[:qb - pad] if pad else i)
        return jnp.concatenate(outs, axis=0), jnp.concatenate(idxs, axis=0)

    def decode(self, rows: Optional[np.ndarray] = None) -> np.ndarray:
        """Reconstructed vectors x̂ [*, D] for ``rows`` (default: all) —
        the reconstruction PQ scores against; tests + reranking."""
        codes = np.asarray(self.codes)
        if rows is not None:
            codes = codes[np.asarray(rows)]
        cb = np.asarray(self.codebooks)  # [M, C, ds]
        out = cb[np.arange(self.m)[None, :], codes.astype(np.int64)]
        out = out.reshape(codes.shape[0], -1)
        if self.rotation is not None:  # back to the original space
            out = out @ np.asarray(self.rotation).T
        return out


@partial(jax.jit,
         static_argnames=("k", "nb", "method", "score_dtype", "scan"))
def _pq_search_block(codebooks, codes, qu, *, k, nb, method, score_dtype,
                     scan, n_valid=None):
    """``n_valid`` (traced scalar, sharded hook): rows with local id >=
    n_valid are PADDING (a sharded code matrix pads to even shards) and
    must mask to -inf BEFORE the running top-k — zero-padded codes decode
    to the codeword-0 reconstruction, a legitimate vector that can
    otherwise evict true top-k rows from a shard's partial (the exact
    sharded engine's pad-before-top-k invariant, distributed.py)."""
    m, c, ds = codebooks.shape
    n = codes.shape[0]
    qb = qu.shape[0]
    if method not in ("l2", "cosine"):
        raise ValueError(f"Unknown method: {method}")
    # "bfloat16": bf16 operands (the fast MXU path) — and, as important,
    # a bf16 one-hot block, halving the HBM round-trip of the scan's only
    # large intermediate. XLA:CPU has no bf16 dot thunk, so tests emulate
    # with rounded-to-bf16 values in an f32 dot (same rounding, same
    # single-pass semantics). "float32" forces exact multi-pass scoring
    # for oracle parity.
    if score_dtype == "bfloat16":
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        prec = None

        def cast(x):
            return x.astype(jnp.bfloat16).astype(dt)
    elif score_dtype == "float32":
        dt, prec = jnp.float32, EXACT

        def cast(x):
            return x
    else:
        raise ValueError(f"Unknown score_dtype: {score_dtype}")

    if scan == "tables":
        # ADC tables [M, C, Qb]: similarity of every query subvector to
        # every codeword; flattened to [M*C, Qb] the one-hot matmul sums
        # exactly the M entries classic ADC gathers per row
        qsub = qu.reshape(qb, m, ds)
        t = jnp.einsum("qmd,mcd->mcq", qsub, codebooks,
                       precision=EXACT, preferred_element_type=jnp.float32)
        if method == "l2":
            c2 = jnp.sum(codebooks * codebooks, axis=-1)      # [M, C]
            t = 2.0 * t - c2[:, :, None]
        t_flat = cast(t.reshape(m * c, qb))
    else:
        # decode scan: chunk rows reconstruct via the same one-hot
        # (query-independent, C*D MACs/row) and dot the queries directly
        # (D*Qb MACs/row) — q.x̂ = sum_m q_m.c_m is EXACTLY the ADC table
        # sum, without the C-fold compute inflation of per-query tables
        cb = cast(codebooks)
        quT = cast(qu.T)                                      # [D, Qb]
    code_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
    nb = min(nb, n)
    n_chunks = -(-n // nb)

    def body(i, carry):
        best_s, best_i = carry
        start = i * nb
        # the final chunk's start clamps back so the slice stays in
        # bounds; rows re-scored from the previous chunk mask to -inf
        base = jnp.minimum(start, n - nb)
        cc = jax.lax.dynamic_slice(codes, (base, 0), (nb, m))
        # one-hot [nb, M, C]: exactly one 1 per (row, m)
        oh = (cc.astype(jnp.int32)[:, :, None] == code_iota).astype(dt)
        if scan == "tables":
            s = jnp.dot(oh.reshape(nb, m * c), t_flat,
                        preferred_element_type=jnp.float32,
                        precision=prec)                        # [nb, Qb]
        else:
            xhat = jnp.einsum(
                "nmc,mcd->nmd", oh, cb, precision=prec,
                preferred_element_type=jnp.float32).reshape(nb, m * ds)
            s = jnp.dot(cast(xhat), quT, precision=prec,
                        preferred_element_type=jnp.float32)    # [nb, Qb]
            if method == "l2":
                # subspaces are disjoint coordinates, so the decoded row
                # norm IS the per-subspace codeword-norm sum of ADC
                s = 2.0 * s - jnp.sum(xhat * xhat, axis=-1)[:, None]
        ids = base + jnp.arange(nb, dtype=jnp.int32)
        keep = ids >= start
        if n_valid is not None:
            keep = keep & (ids < n_valid)
        s = jnp.where(keep[None, :], s.T, -jnp.inf)            # [Qb, nb]
        cat_s = jnp.concatenate([best_s, s], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids[None, :], (qb, nb))], axis=1)
        best_s, sel = jax.lax.top_k(cat_s, k)
        return best_s, jnp.take_along_axis(cat_i, sel, axis=1)

    init = (jnp.full((qb, k), -jnp.inf, jnp.float32),
            jnp.zeros((qb, k), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def opq_train(
    sample: np.ndarray,
    m: int,
    *,
    n_codes: int = 256,
    opq_iters: int = 10,
    inner_iters: int = 6,
    seed: int = 0,
) -> np.ndarray:
    """Learn an orthogonal OPQ rotation R [D, D] minimizing PQ
    reconstruction error ||X R - decode(encode(X R))||^2 on ``sample``
    [S, D] (non-parametric OPQ, Ge et al. CVPR 2013 alg. 2 — the FAISS
    ``OPQMatrix`` pretransform).

    Alternation: fit per-subspace codebooks on X R (``inner_iters`` Lloyd
    steps, vmapped over subspaces on device), encode + reconstruct, then
    the Procrustes update R = U V^T from SVD(X^T X̂) — the closed-form
    orthogonal minimizer. Init is a random orthogonal matrix (QR of a
    Gaussian), which already spreads anisotropic variance across
    subspaces before alternation sharpens it. The Gram matmul runs on
    device; only the [D, D] SVD runs on host.

    Where it matters (measured: docs/PERFORMANCE.md "PQ"): PCA-projected
    descriptors — this framework's actual compressed-retrieval input —
    have a decaying eigenvalue spectrum, so unrotated subspaces are
    wildly unbalanced (the first carries most of the variance and 256
    codes can't cover it; the last quantize noise). Isotropic data gains
    nothing, by symmetry.
    """
    from anyloc_tpu.ops.kmeans import kmeans_fit

    n, d = sample.shape
    ds = d // m
    x = np.asarray(sample, np.float32)
    rng = np.random.default_rng(seed)
    q_mat, r_mat = np.linalg.qr(
        rng.standard_normal((d, d)).astype(np.float64))
    rot = (q_mat * np.sign(np.diag(r_mat))[None]).astype(np.float32)
    x_dev = jnp.asarray(x)
    keys = jax.random.split(jax.random.PRNGKey(seed), m)
    fit = jax.vmap(partial(kmeans_fit, n_clusters=n_codes,
                           mode="euclidean", max_iters=inner_iters))

    @jax.jit
    def step(x_arg, rot_dev):
        # ``x_arg`` is a jit ARGUMENT, not a closure constant: a captured
        # [S, D] sample would be baked into the program as a constant,
        # ballooning the (remote-)compile payload by the sample's full
        # bytes (the bench_retrieval round-4 lesson; observed: a 512 MB
        # constant wedged the compile tunnel for 30+ min).
        xr = x_arg @ rot_dev                                # [S, D]
        sub = xr.reshape(n, m, ds).transpose(1, 0, 2)       # [M, S, ds]
        codebooks, _ = fit(keys, sub)                       # [M, C, ds]
        cod = _pq_assign(codebooks, xr)                     # [S, M]
        xhat = jnp.take_along_axis(
            codebooks[None], cod.astype(jnp.int32)[:, :, None, None],
            axis=2)[:, :, 0].reshape(n, d)
        gram = jnp.einsum("sd,se->de", x_arg, xhat, precision=EXACT,
                          preferred_element_type=jnp.float32)
        err = jnp.mean(jnp.sum((xr - xhat) ** 2, axis=-1))
        return gram, err

    for _ in range(opq_iters):
        gram, _ = step(x_dev, jnp.asarray(rot))
        u, _, vt = np.linalg.svd(np.asarray(gram, np.float64),
                                 full_matrices=False)
        rot = (u @ vt).astype(np.float32)
    return rot


def pq_fit(
    db,
    m: int,
    *,
    n_codes: int = 256,
    method: str = "l2",
    max_iters: int = 25,
    seed: int = 0,
    train_rows: int = 1 << 18,
    encode_block: int = 1 << 16,
    opq_iters: int = 0,
    as_numpy: bool = False,
) -> PQIndex:
    """Train per-subspace codebooks and encode ``db`` [N, D] (numpy or
    memmap; D must divide into ``m`` equal subspaces). ``as_numpy`` keeps
    the fitted arrays host-resident (for the sharded engines, which
    upload 1/n_dev shards themselves).

    Training k-means runs as ONE vmapped program over all M subspaces
    (ops/kmeans.py, euclidean mode — the standard PQ objective regardless
    of search method) on a uniform row sample of at most ``train_rows``.
    Encoding streams the database through the device in chunks; the
    returned index holds only codebooks + uint8 codes.

    ``opq_iters > 0`` first learns an OPQ rotation (``opq_train``) on the
    sample; codebooks/codes then live in the rotated space and queries
    rotate transparently at search.
    """
    if method not in ("cosine", "l2"):
        raise ValueError(f"method must be 'cosine' or 'l2', got {method!r}")
    if not 2 <= n_codes <= 256:
        raise ValueError(f"n_codes must be in [2, 256], got {n_codes}")
    n, d = db.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible into m={m} subspaces")
    if n < n_codes:
        raise ValueError(f"need >= n_codes={n_codes} rows, got {n}")
    ds = d // m
    from anyloc_tpu.ops.kmeans import kmeans_fit

    rng = np.random.default_rng(seed)
    if n > train_rows:
        sample = np.asarray(
            db[np.sort(rng.choice(n, train_rows, replace=False))], np.float32)
    else:
        sample = np.asarray(db, np.float32)
    rotation = None
    if opq_iters:
        rotation = opq_train(sample, m, n_codes=n_codes,
                             opq_iters=opq_iters, seed=seed)
        sample = sample @ rotation
    sub = jnp.asarray(sample.reshape(-1, m, ds).transpose(1, 0, 2))  # [M,S,ds]
    keys = jax.random.split(jax.random.PRNGKey(seed), m)
    fit = partial(kmeans_fit, n_clusters=n_codes, mode="euclidean",
                  max_iters=max_iters)
    codebooks, _ = jax.vmap(fit)(keys, sub)                 # [M, C, ds]

    codes = np.empty((n, m), np.uint8)
    if rotation is None:
        enc = jax.jit(_pq_assign)
    else:
        rot_dev = jnp.asarray(rotation)
        enc = jax.jit(lambda cb, ch: _pq_assign(cb, ch @ rot_dev))
    for i0 in range(0, n, encode_block):
        chunk = jnp.asarray(np.asarray(db[i0:i0 + encode_block], np.float32))
        codes[i0:i0 + chunk.shape[0]] = np.asarray(enc(codebooks, chunk))
    arr = np.asarray if as_numpy else jnp.asarray
    return PQIndex(codebooks=arr(codebooks), codes=arr(codes),
                   method=method,
                   rotation=None if rotation is None else arr(rotation))


def _pq_assign(codebooks, x):
    """Nearest codeword per subspace: x [B, D] -> codes [B, M] uint8."""
    mm, _, ds = codebooks.shape
    xs = x.reshape(x.shape[0], mm, ds)
    xc = jnp.einsum("bmd,mcd->bmc", xs, codebooks,
                    precision=EXACT, preferred_element_type=jnp.float32)
    c2 = jnp.sum(codebooks * codebooks, axis=-1)            # [M, C]
    return jnp.argmax(2.0 * xc - c2[None], axis=-1).astype(jnp.uint8)


def pq_encode(codebooks, x) -> jnp.ndarray:
    """Public encoder (e.g. for adding rows): [B, D] -> [B, M] uint8."""
    return jax.jit(_pq_assign)(codebooks, jnp.asarray(x, jnp.float32))


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_pq(index: PQIndex, path: str) -> None:
    extra = {}
    if index.rotation is not None:
        extra["rotation"] = np.asarray(index.rotation)
    np.savez_compressed(
        _npz_path(path),
        codebooks=np.asarray(index.codebooks),
        codes=np.asarray(index.codes),
        method=np.asarray(index.method),
        **extra,
    )


def load_pq(path: str) -> PQIndex:
    z = np.load(_npz_path(path), allow_pickle=False)
    return PQIndex(
        codebooks=jnp.asarray(z["codebooks"]),
        codes=jnp.asarray(z["codes"]),
        method=str(z["method"]),
        rotation=jnp.asarray(z["rotation"]) if "rotation" in z.files
        else None,
    )
