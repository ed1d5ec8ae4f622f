"""Multi-chip example: sharded vocabulary k-means + database-sharded
retrieval over a device mesh. Runs on a real pod or on a virtual CPU mesh:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python examples/multichip_retrieval.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if len(jax.devices()) == 1:
        print("1 device only — set xla_force_host_platform_device_count for a "
              "virtual mesh")
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
