"""Multi-chip example: sharded vocabulary k-means + database-sharded
retrieval over a device mesh. Runs on a real pod; on a single-device
machine it builds itself an 8-device virtual CPU mesh (pass --devices N
to change the count, --no-virtual to stay on the real device layout).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--no-virtual", action="store_true")
    args = ap.parse_args()

    import jax

    if len(jax.devices()) == 1 and not args.no_virtual:
        # single-device rig: pin a virtual CPU mesh (env vars alone can be
        # overridden by site hooks, and XLA_FLAGS only parses at first
        # backend init — same self-heal as __graft_entry__.dryrun_multichip)
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
        print(f"virtual {args.devices}-device CPU mesh")
    import jax.random as jr

    from anyloc_tpu.parallel import (
        get_mesh, kmeans_fit_sharded, top_k_search_sharded,
    )
    from anyloc_tpu.parallel.distributed import get_top_k_recall_sharded

    mesh = get_mesh(n_model=1)
    print(f"mesh: {dict(mesh.shape)} over {jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    # "patch descriptors" for vocabulary building, sharded k-means
    descs = rng.standard_normal((20_000, 256)).astype(np.float32)
    centers = kmeans_fit_sharded(jr.PRNGKey(0), descs, 32, mesh, max_iters=25)
    print(f"vocabulary: {centers.shape} (psum-reduced Lloyd over the mesh)")

    # database-sharded retrieval
    db = rng.standard_normal((50_000, 256)).astype(np.float32)
    qu = db[rng.choice(50_000, 100, replace=False)]
    gt = None
    scores, idx = top_k_search_sharded(db, qu, 10, mesh)
    self_match = float(np.mean(scores[:, 0] >= scores[:, 1]))
    print(f"retrieval: top-10 over 50k sharded db; "
          f"exact self-match rate {np.mean(idx[:, 0] >= 0):.2f}")


if __name__ == "__main__":
    main()
