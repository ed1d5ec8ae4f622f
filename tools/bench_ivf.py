"""IVF vs exact retrieval throughput + n_probe sweep (run on the real chip).

In-jit loop harness per docs/PERFORMANCE.md measurement hygiene (outputs
consumed via a dependent scalar; iters >= 20 amortize the tunnel RPC).

  python tools/bench_ivf.py --n-db 1000000 --dim 512 --sweep
  python tools/bench_ivf.py --n-db 1000000 --dim 512 --n-probe 16

--clustered (default true) draws the database from a 256-component Gaussian
mixture with power-law component sizes — the skewed geometry real VLAD/PCA
descriptor sets have (uniform random vectors are IVF's best case: every
cell is equally full and probes are maximally informative; clustered data
is the honest test because posting lists are imbalanced).
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_db(rng, n_db, dim, clustered: bool):
    if not clustered:
        db = rng.standard_normal((n_db, dim)).astype(np.float32)
        db /= np.linalg.norm(db, axis=-1, keepdims=True)
        return db
    # power-law-sized Gaussian mixture: sizes ~ Zipf over 256 components
    n_comp = 256
    w = 1.0 / np.arange(1, n_comp + 1) ** 0.8
    w /= w.sum()
    sizes = rng.multinomial(n_db, w)
    means = rng.standard_normal((n_comp, dim)).astype(np.float32) * 2.0
    parts = []
    for m, s in zip(means, sizes):
        if s == 0:
            continue
        parts.append(m + 0.35 * rng.standard_normal((s, dim)).astype(np.float32))
    db = np.concatenate(parts, axis=0)
    rng.shuffle(db)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    return db


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-db", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--n-queries", type=int, default=256)
    p.add_argument("--n-cells", type=int, default=1024)
    p.add_argument("--n-probe", type=int, default=16)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--sweep", action="store_true",
                   help="sweep n_probe in {1,2,4,8,16,32,64}: recall + qps")
    p.add_argument("--qbatch-sweep", action="store_true",
                   help="sweep the QUERY batch {1,4,16,64,256} at fixed "
                        "--n-probe: exact vs ivf qps per regime. The "
                        "engines cross over: exact amortizes one db scan "
                        "over the whole batch (MXU-bound), ivf pays a "
                        "per-query gather (bandwidth-bound), so ivf wins "
                        "the low-latency single-query regime only.")
    p.add_argument("--uniform", action="store_true",
                   help="uniform random db instead of the clustered default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anyloc_tpu.ops.ivf import ivf_fit
    from anyloc_tpu.ops.retrieval import top_k_search

    rng = np.random.default_rng(0)
    db = make_db(rng, args.n_db, args.dim, clustered=not args.uniform)
    qu = db[:: max(1, args.n_db // args.n_queries)][: args.n_queries].copy()
    qu += 0.05 * rng.standard_normal(qu.shape).astype(np.float32)
    qu /= np.linalg.norm(qu, axis=-1, keepdims=True)

    t0 = time.perf_counter()
    index = ivf_fit(db, args.n_cells, bucket_factor=2.0)
    print(f"fit: {time.perf_counter() - t0:.1f}s "
          f"(cap {index.buckets.shape[1]}, "
          f"overflow {index.overflow.shape[0]}, "
          f"{'uniform' if args.uniform else 'clustered'} db)")

    quj = jnp.asarray(qu)
    dbj = jnp.asarray(db)

    def timed(fn, label):
        out = fn(quj)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(args.iters):
            s, _ = fn(quj + i * 1e-6)  # perturb: no loop hoisting
            acc += float(jnp.max(s))  # dependent-scalar fetch = real fence
        dt = (time.perf_counter() - t0) / args.iters
        qps = args.n_queries / dt
        print(f"{label}: {qps:,.0f} qps   ({acc:.3f})")
        return qps

    if args.qbatch_sweep:
        print(f"{'q_batch':>8} {'exact qps':>10} {'ivf qps':>10} "
              f"(n_probe={args.n_probe})")
        for qb in (1, 4, 16, 64, 256):
            if qb > args.n_queries:
                continue
            quj_b = quj[:qb]

            def timed_q(fn):
                out = fn(quj_b)
                jax.block_until_ready(out)
                iters = max(args.iters, 256 // qb)
                t0 = time.perf_counter()
                acc = 0.0
                for i in range(iters):
                    s, _ = fn(quj_b + i * 1e-6)
                    acc += float(jnp.max(s))
                return qb / ((time.perf_counter() - t0) / iters)

            e = timed_q(lambda q: top_k_search(dbj, q, args.k))
            v = timed_q(lambda q: index.search(
                q, args.k, n_probe=args.n_probe, query_block=qb))
            print(f"{qb:>8} {e:>10,.0f} {v:>10,.0f}")
        return

    # exact ground truth (top-k sets for recall@k, top-1 for agreement)
    _, ie = top_k_search(dbj, quj, args.k)
    ie = np.asarray(ie)
    exact_qps = timed(lambda q: top_k_search(dbj, q, args.k), "exact")

    probes = [1, 2, 4, 8, 16, 32, 64] if args.sweep else [args.n_probe]
    print(f"{'n_probe':>8} {'qps':>10} {'vs exact':>9} {'R1':>6} {'R@'+str(args.k):>7}")
    for np_ in probes:
        if np_ > args.n_cells:
            continue
        qps = timed(
            lambda q, np_=np_: index.search(
                q, args.k, n_probe=np_, query_block=args.n_queries),
            f"ivf n_probe={np_}")
        _, ii = index.search(quj, args.k, n_probe=np_)
        ii = np.asarray(ii)
        r1 = (ii[:, 0] == ie[:, 0]).mean()
        # recall@k: fraction of exact top-k retained in ivf top-k, per query
        rk = np.mean([
            len(set(ii[q].tolist()) & set(ie[q].tolist())) / args.k
            for q in range(ii.shape[0])
        ])
        print(f"{np_:>8} {qps:>10,.0f} {qps / exact_qps:>8.1f}x "
              f"{r1:>6.3f} {rk:>7.3f}")


if __name__ == "__main__":
    main()
