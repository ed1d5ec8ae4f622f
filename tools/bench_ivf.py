"""IVF vs exact retrieval throughput (run on the real chip).

In-jit loop harness per docs/PERFORMANCE.md measurement hygiene (outputs
consumed via a dependent scalar; iters >= 20 amortize the tunnel RPC).

  python tools/bench_ivf.py --n-db 1000000 --dim 512 --n-probe 16
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-db", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--n-queries", type=int, default=256)
    p.add_argument("--n-cells", type=int, default=1024)
    p.add_argument("--n-probe", type=int, default=16)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anyloc_tpu.ops.ivf import ivf_fit
    from anyloc_tpu.ops.retrieval import top_k_search

    rng = np.random.default_rng(0)
    db = rng.standard_normal((args.n_db, args.dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    qu = db[:: max(1, args.n_db // args.n_queries)][: args.n_queries].copy()
    qu += 0.05 * rng.standard_normal(qu.shape).astype(np.float32)

    t0 = time.perf_counter()
    index = ivf_fit(db, args.n_cells, bucket_factor=2.0)
    print(f"fit: {time.perf_counter() - t0:.1f}s "
          f"(cap {index.buckets.shape[1]}, "
          f"overflow {index.overflow.shape[0]})")

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
        print(f"{label}: {args.n_queries / dt:,.0f} qps   ({acc:.3f})")
        return dt

    timed(lambda q: index.search(q, args.k, n_probe=args.n_probe,
                                 query_block=args.n_queries),
          f"ivf n_probe={args.n_probe}")
    timed(lambda q: top_k_search(dbj, q, args.k), "exact")

    # recall of ivf vs exact top-1
    _, ie = top_k_search(dbj, quj, 1)
    _, ii = index.search(quj, 1, n_probe=args.n_probe)
    agree = (np.asarray(ii)[:, 0] == np.asarray(ie)[:, 0]).mean()
    print(f"top-1 agreement vs exact: {agree:.3f}")


if __name__ == "__main__":
    main()
