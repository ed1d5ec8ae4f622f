"""PQ / IVF / IVF-PQ regime matrix on the real chip — the measurement run
behind docs/PERFORMANCE.md "PQ" (round-4 verdict item 1/2).

Runs bench_retrieval.main() repeatedly in ONE process (one tunnel warmup,
one compile cache) over the crossover grid:

  * 512-d rows (the PCA width of the reference's reduce_pca path) at
    {250k, 1M, 4M} rows, plus a 10M-row shape the exact engine cannot hold;
  * engines: device (exact), ivf, pq (both ADC scans), ivf_pq;
  * query batches 8 (serving regime) and 256 (bulk re-ranking regime);
  * f32 and bf16 ADC scoring.

Each line of output is bench_retrieval's JSON with a ``run`` prefix line;
redirect to a file and paste into the PERFORMANCE.md table. ~30 min warm.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench_retrieval  # noqa: E402


def run(tag, argv):
    print(json.dumps({"run": tag, "argv": argv}), flush=True)
    sys.argv = ["bench_retrieval.py"] + argv
    t0 = time.perf_counter()
    bench_retrieval.main()
    print(json.dumps({"run": tag, "wall_s": round(time.perf_counter() - t0,
                                                  1)}), flush=True)


BASE = ["--dim", "512", "--n-qu", "256", "--k", "20", "--pq-m", "64"]

RUNS = [
    # bulk regime (qb 256): exact vs pruned vs compressed across scale
    ("250k_qb256", ["--n-db", "250000", "--query-batch", "256",
                    "--engines", "device", "ivf", "pq", "ivf_pq",
                    "--n-probe", "16"]),
    ("1M_qb256", ["--n-db", "1000000", "--query-batch", "256",
                  "--engines", "device", "ivf", "pq", "ivf_pq",
                  "--n-probe", "16"]),
    ("4M_qb256", ["--n-db", "4000000", "--query-batch", "256",
                  "--engines", "device", "pq", "ivf_pq",
                  "--n-probe", "16"]),  # ivf-flat buckets: 16 GB > HBM
    # serving regime (qb 8): where pruning beats the shared-one-hot scan
    ("250k_qb8", ["--n-db", "250000", "--query-batch", "8",
                  "--engines", "device", "ivf", "pq", "ivf_pq",
                  "--n-probe", "16"]),
    ("1M_qb8", ["--n-db", "1000000", "--query-batch", "8",
                "--engines", "device", "ivf", "pq", "ivf_pq",
                "--n-probe", "16"]),
    ("4M_qb8", ["--n-db", "4000000", "--query-batch", "8",
                "--engines", "device", "pq", "ivf_pq",
                "--n-probe", "16"]),
    # ADC formulation + dtype crossovers at 1M
    ("1M_pq_tables_f32", ["--n-db", "1000000", "--query-batch", "256",
                          "--engines", "pq", "--pq-scan", "tables",
                          "--pq-score-dtype", "float32"]),
    ("1M_pq_tables_bf16", ["--n-db", "1000000", "--query-batch", "256",
                           "--engines", "pq", "--pq-scan", "tables",
                           "--pq-score-dtype", "bfloat16"]),
    ("1M_pq_decode_f32", ["--n-db", "1000000", "--query-batch", "256",
                          "--engines", "pq", "--pq-scan", "decode",
                          "--pq-score-dtype", "float32"]),
    ("1M_ivfpq_f32", ["--n-db", "1000000", "--query-batch", "8",
                      "--engines", "ivf_pq", "--n-probe", "16",
                      "--pq-score-dtype", "float32"]),
    # probe dial at 4M (recall/qps trade)
    ("4M_ivfpq_p8", ["--n-db", "4000000", "--query-batch", "8",
                     "--engines", "ivf_pq", "--n-probe", "8"]),
    ("4M_ivfpq_p32", ["--n-db", "4000000", "--query-batch", "8",
                      "--engines", "ivf_pq", "--n-probe", "32"]),
    # clustered-db recall (the honest case for pruned/compressed engines:
    # the round-3 IVF geometry, perturbed queries, graded vs exact)
    ("250k_clustered_recall",
     ["--n-db", "250000", "--query-batch", "256",
      "--engines", "device", "ivf", "pq", "ivf_pq", "--n-probe", "16",
      "--db-dist", "clustered", "--query-noise", "0.05",
      "--recall-vs-exact"]),
    # the bytes/row dial on the clustered hard case: 128 B/row (4 dims per
    # subspace) vs the 64 B/row the rest of the matrix uses (per-run flags
    # come after BASE, so this --pq-m wins)
    ("250k_clustered_recall_m128",
     ["--n-db", "250000", "--query-batch", "256",
      "--engines", "pq", "ivf_pq", "--n-probe", "16",
      "--db-dist", "clustered", "--query-noise", "0.05",
      "--recall-vs-exact", "--pq-m", "128"]),
    # OPQ rotation on the PCA-spectrum geometry (the reduce_pca output the
    # compressed engines actually serve) — same budget, learned rotation
    ("250k_pca_recall",
     ["--n-db", "250000", "--query-batch", "256",
      "--engines", "pq", "ivf_pq", "--n-probe", "16",
      "--db-dist", "pca_spectrum", "--query-noise", "0.05",
      "--recall-vs-exact"]),
    ("250k_pca_recall_opq",
     ["--n-db", "250000", "--query-batch", "256",
      "--engines", "pq", "ivf_pq", "--n-probe", "16",
      "--db-dist", "pca_spectrum", "--query-noise", "0.05",
      "--recall-vs-exact", "--opq-iters", "10"]),
    # past-HBM showcase: 10M x 512d f32 = 20.5 GB > 16 GB HBM — the
    # regime pq.py's header motivates; exact/ivf-flat cannot run here
    ("10M_qb8", ["--n-db", "10000000", "--query-batch", "8",
                 "--engines", "pq", "ivf_pq", "--n-probe", "16"]),
    ("10M_qb256", ["--n-db", "10000000", "--query-batch", "256",
                   "--engines", "pq", "ivf_pq", "--n-probe", "16"]),
]


def main():
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for tag, argv in RUNS:
        if only and tag not in only:
            continue
        run(tag, BASE + argv)  # BASE first: per-run flags override it


if __name__ == "__main__":
    main()
