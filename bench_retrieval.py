"""Large-scale retrieval benchmark — BASELINE.json config #5 (Pitts-250k /
MSLS-scale global-vocab VLAD retrieval with a sharded database).

Three engines over the same synthetic database:
  * device   — single-device matmul + lax.top_k (db must fit HBM);
  * blocked  — host-streaming shards through the device
    (ops.retrieval.top_k_search_blocked) for databases beyond HBM;
  * native   — the C++ exact-NN library (host-only baseline).

At the full 250k x 49152-dim f32 scale the database is ~49 GB: on real pods
it shards across chips (parallel.top_k_search_sharded); on this 1-chip rig
use --pca-dim (the reference's reduce_pca path) or the blocked engine.

Prints one JSON line per engine.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-db", type=int, default=100_000)
    p.add_argument("--n-qu", type=int, default=1_000)
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--engines", nargs="*",
                   default=["device", "blocked"])
    p.add_argument("--n-cells", type=int, default=None,
                   help="ivf engine: coarse cells (default ~sqrt(N))")
    p.add_argument("--n-probe", type=int, default=16)
    p.add_argument("--stream-dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="blocked-engine streaming dtype (bandwidth knob)")
    p.add_argument("--pq-m", type=int, default=64,
                   help="pq engine: subquantizers (bytes/row)")
    p.add_argument("--pq-db-block", type=int, default=8192,
                   help="pq engine: database rows per ADC matmul chunk")
    p.add_argument("--pq-score-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pq-scan", default="auto",
                   choices=["auto", "tables", "decode"],
                   help="pq engine: ADC formulation (ops/pq.py)")
    p.add_argument("--query-batch", type=int, default=None,
                   help="queries per search call (default: min(256, n_qu));"
                        " the small-batch serving regime is --query-batch 8")
    p.add_argument("--db-dist", default="uniform",
                   choices=["uniform", "clustered", "pca_spectrum"],
                   help="clustered = the 256-component power-law Gaussian "
                        "mixture of tools/bench_ivf.py (the skewed geometry "
                        "real VLAD/PCA descriptors have — the honest recall "
                        "test for pruned/compressed engines); pca_spectrum "
                        "= independent dims with a decaying (i+1)^-0.5 "
                        "eigenvalue spectrum, the geometry of reduce_pca "
                        "output and the case OPQ rotation exists for")
    p.add_argument("--opq-iters", type=int, default=0,
                   help="learn an OPQ rotation for the pq/ivf_pq engines "
                        "(this many alternations; 0 = off)")
    p.add_argument("--query-noise", type=float, default=0.0,
                   help="perturb query rows by this Gaussian sigma (0 = "
                        "queries ARE database rows)")
    p.add_argument("--recall-vs-exact", action="store_true",
                   help="score pq/ivf/ivf_pq top-k overlap against the "
                        "exact engine's neighbors (db must fit HBM)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anyloc_tpu.ops.retrieval import top_k_search, top_k_search_blocked

    rng = np.random.default_rng(0)
    if args.db_dist == "clustered":
        # power-law-sized Gaussian mixture (tools/bench_ivf.py make_db):
        # sizes ~ Zipf over 256 components, sigma 0.35 around means of 2.0
        n_comp = 256
        w = 1.0 / np.arange(1, n_comp + 1) ** 0.8
        sizes = rng.multinomial(args.n_db, w / w.sum())
        means = rng.standard_normal((n_comp, args.dim)).astype(np.float32)
        parts = [m * 2.0 + 0.35 * rng.standard_normal(
                     (s, args.dim)).astype(np.float32)
                 for m, s in zip(means, sizes) if s]
        db = np.concatenate(parts, axis=0)
        rng.shuffle(db)
    elif args.db_dist == "pca_spectrum":
        # decaying per-dim variance (lambda_i ~ (i+1)^-0.5): what PCA
        # projection actually hands the compressed engines — unrotated PQ
        # subspaces are wildly unbalanced here
        lam = (1.0 + np.arange(args.dim, dtype=np.float32)) ** -0.5
        db = (rng.standard_normal((args.n_db, args.dim)).astype(np.float32)
              * lam[None])
    else:
        db = rng.standard_normal((args.n_db, args.dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qu_rows = rng.choice(args.n_db, args.n_qu, replace=False)
    qu = db[qu_rows]
    if args.query_noise:
        qu = qu + args.query_noise * rng.standard_normal(
            qu.shape).astype(np.float32)

    exact_ids = None
    if args.recall_vs_exact:
        n_chk = min(256, args.n_qu)
        exact_ids = np.asarray(top_k_search(
            jnp.asarray(db), jnp.asarray(qu[:n_chk]), args.k)[1])

    results = {}
    qbatch = args.query_batch or min(256, args.n_qu)

    def index_consts(index):
        """The index's device-array fields, as a dict suitable for a jit
        ARGUMENT — closure-capturing them would ship the whole database as
        a compile-time constant (the axon tunnel rejects the request body
        past ~hundreds of MB, and constants bloat every cache entry)."""
        import dataclasses as dc

        return {f.name: jnp.asarray(getattr(index, f.name))
                for f in dc.fields(index)
                if isinstance(getattr(index, f.name), (np.ndarray, jax.Array))
                and getattr(index, f.name).size > 0}

    def recall_vs_exact_line(tag, i_c):
        """Mean top-k overlap of engine ids ``i_c`` with the exact engine's
        neighbors (--recall-vs-exact; the round-3 IVF section's metric)."""
        if exact_ids is None:
            return
        n_chk = exact_ids.shape[0]
        ov = np.mean([len(set(i_c[q].tolist())
                          & set(exact_ids[q].tolist())) / args.k
                      for q in range(n_chk)])
        top1 = np.mean(i_c[:n_chk, 0] == exact_ids[:, 0])
        print(json.dumps({
            "metric": f"{tag}_recall_at_{args.k}_vs_exact",
            "value": round(float(ov), 4),
            "unit": f"mean top-{args.k} overlap with the exact engine "
                    f"over {n_chk} queries (top-1 agreement: "
                    f"{float(top1):.4f}; db {args.db_dist}, "
                    f"query noise {args.query_noise})",
            "vs_baseline": None,
        }))

    def chip_qps(search_fn, consts, iters=10):
        """Chip-side qps at --query-batch: ``iters`` searches of one query
        block inside ONE jit, per-iteration input perturbation, outputs
        consumed through a dependent scalar — the measurement-hygiene
        harness (docs/PERFORMANCE.md): single dispatches through the
        device tunnel are noise-dominated, so dispatch/host overhead is
        excluded here (that end-to-end story is docs/SERVING.md's).
        ``search_fn(q, consts)`` must reach all large arrays through the
        ``consts`` pytree argument, never by closure."""
        quj = jnp.asarray(qu[:qbatch])

        @jax.jit
        def loop(q, consts):
            def body(i, acc):
                s, idx = search_fn(q + i * 1e-6, consts)
                return (acc + jnp.sum(s[:, 0])
                        + jnp.sum(idx[:, 0]).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((), jnp.float32))

        float(loop(quj, consts))  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(quj, consts))
            dt = time.perf_counter() - t0
            best = max(best, qbatch * iters / dt)
        return best

    if "device" in args.engines:
        results["device"] = chip_qps(
            lambda q, c: top_k_search(c["db"], q, args.k),
            {"db": jnp.asarray(db)})
    if "blocked" in args.engines:
        top_k_search_blocked(db[:65536], qu, args.k, query_block=256,
                             db_block=65536,
                             stream_dtype=args.stream_dtype)  # warm/compile
        t0 = time.perf_counter()
        s, i = top_k_search_blocked(db, qu, args.k, query_block=256,
                                    db_block=65536,
                                    stream_dtype=args.stream_dtype)
        dt = time.perf_counter() - t0
        results[f"blocked_{args.stream_dtype}"] = args.n_qu / dt
    if "ivf" in args.engines:
        from anyloc_tpu.ops.ivf import ivf_fit

        import dataclasses as dc

        index = ivf_fit(db, args.n_cells, bucket_factor=2.0)
        results[f"ivf_p{args.n_probe}"] = chip_qps(
            lambda q, c: dc.replace(index, **c).search(
                q, args.k, n_probe=args.n_probe,
                query_block=min(256, qbatch)),
            index_consts(index))
        if exact_ids is not None:
            recall_vs_exact_line(
                f"ivf_p{args.n_probe}",
                np.asarray(index.search(
                    jnp.asarray(qu[:exact_ids.shape[0]]), args.k,
                    n_probe=args.n_probe)[1]))
    def quality_and_memory(tag, search_fn, codes_size):
        """Self-recall + memory lines shared by the pq / ivf_pq engines:
        queries ARE database rows (unless --query-noise), so exact top-1 is
        the row itself — report how often the compressed engine keeps it in
        the top-k; with --recall-vs-exact, additionally the mean top-k
        overlap with the exact engine's neighbors (the metric the round-3
        IVF section uses)."""
        n_chk = min(256, args.n_qu)
        i_c = np.asarray(search_fn(qu[:n_chk]))
        hits = [qu_rows[q] in set(i_c[q].tolist()) for q in range(n_chk)]
        hits1 = np.mean(i_c[:, 0] == qu_rows[:n_chk])
        print(json.dumps({
            "metric": f"{tag}_self_recall_at_{args.k}",
            "value": round(float(np.mean(hits)), 4),
            "unit": f"fraction of {n_chk} db-row queries whose own row "
                    f"survives in the {tag} top-{args.k} "
                    f"(at top-1: {float(hits1):.4f})",
            "vs_baseline": None,
        }))
        recall_vs_exact_line(tag, i_c)
        print(json.dumps({
            "metric": f"{tag}_codes_mb",
            "value": round(codes_size / 2**20, 1),
            "unit": f"MB on-chip ({args.n_db} rows; f32 db would be "
                    f"{args.n_db * args.dim * 4 / 2**30:.1f} GB)",
            "vs_baseline": None,
        }))

    if "pq" in args.engines:
        from anyloc_tpu.ops.pq import pq_fit

        import dataclasses as dc

        opq = f"_opq{args.opq_iters}" if args.opq_iters else ""
        index = pq_fit(db, args.pq_m, method="cosine",
                       opq_iters=args.opq_iters)
        results[f"pq{args.pq_m}{opq}_{args.pq_scan}"] = chip_qps(
            lambda q, c: dc.replace(index, **c).search(
                q, args.k, query_block=min(256, qbatch),
                db_block=args.pq_db_block, score_dtype=args.pq_score_dtype,
                scan=args.pq_scan),
            index_consts(index))
        quality_and_memory(
            f"pq{args.pq_m}{opq}",
            lambda q: index.search(q, args.k,
                                   score_dtype=args.pq_score_dtype)[1],
            index.codes.size)
        del index
    if "ivf_pq" in args.engines:
        from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

        import dataclasses as dc

        opq = f"_opq{args.opq_iters}" if args.opq_iters else ""
        index = ivf_pq_fit(db, args.n_cells, m=args.pq_m, method="cosine",
                           opq_iters=args.opq_iters)
        results[f"ivf_pq{args.pq_m}{opq}_p{args.n_probe}"] = chip_qps(
            lambda q, c: dc.replace(index, **c).search(
                q, args.k, n_probe=args.n_probe,
                query_block=min(16, qbatch),
                score_dtype=args.pq_score_dtype),
            index_consts(index))
        quality_and_memory(
            f"ivf_pq{args.pq_m}{opq}_p{args.n_probe}",
            lambda q: index.search(q, args.k, n_probe=args.n_probe,
                                   score_dtype=args.pq_score_dtype)[1],
            index.codes.size + index.overflow_codes.size
            + index.recon_sq.size * 4 + index.overflow_recon_sq.size * 4
            + index.cells.size * 4)
    if "native" in args.engines:
        from anyloc_tpu import native

        if native.available():
            t0 = time.perf_counter()
            s, i = native.nn_search(db, qu, args.k)
            dt = time.perf_counter() - t0
            results["native"] = args.n_qu / dt

    for engine, qps in results.items():
        print(json.dumps({
            "metric": f"retrieval_qps_{engine}",
            "value": round(qps, 2),
            "unit": f"queries/sec ({args.n_db} db x {args.dim}d, "
                    f"top-{args.k}, query-batch {qbatch})",
            "vs_baseline": None,
        }))


if __name__ == "__main__":
    main()
