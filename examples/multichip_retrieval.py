"""Multi-chip example: sharded vocabulary k-means, database-sharded
retrieval, expert-parallel routed VLAD and sequence-parallel extraction
over a device mesh.

Defaults to a VIRTUAL 8-device CPU mesh (--devices N changes the count) so
the demo runs anywhere without probing a possibly-unreachable accelerator
(jax.devices() blocks when a remote-device tunnel is down). On a real pod,
pass ``--no-virtual`` to run on the actual device layout.
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

    if not args.no_virtual:
        # default to a virtual CPU mesh WITHOUT probing the real backend
        # first: jax.devices() blocks indefinitely when a remote-device
        # tunnel is down, and a demo should not hang on that. Pin
        # programmatically (env vars alone can be overridden by site
        # hooks) — same self-heal as __graft_entry__.dryrun_multichip.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
        print(f"virtual {args.devices}-device CPU mesh")
    elif len(jax.devices()) < 2:
        raise SystemExit("--no-virtual needs a real multi-device backend")
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

    # compressed retrieval past one chip's memory: PQ codes / IVF-PQ cell
    # buckets shard over the same mesh (round-5 engines; every engine in
    # get_top_k_recall has a sharded twin — docs/SERVING.md engine table,
    # and the HTTP daemon serves them via `serve --mesh N`)
    from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
    from anyloc_tpu.ops.pq import pq_fit
    from anyloc_tpu.parallel import ivf_pq_search_sharded, pq_search_sharded

    dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
    sel = rng.choice(50_000, 64, replace=False)
    qun = dbn[sel]
    pq_index = pq_fit(dbn, 32, method="cosine")
    _, i_pq = pq_search_sharded(pq_index, qun, 5, mesh)
    ipq_index = ivf_pq_fit(dbn, 64, m=32, method="cosine")
    _, i_ipq = ivf_pq_search_sharded(ipq_index, qun, 5, mesh, n_probe=8)
    print(f"sharded PQ/IVF-PQ: {pq_index.codes.nbytes / 2**20:.1f} MB of "
          f"codes vs {dbn.nbytes / 2**20:.0f} MB f32, sharded "
          f"1/{mesh.shape['data']} per chip; self top-1 "
          f"pq {float(np.mean(i_pq[:, 0] == sel)):.2f} / "
          f"ivf_pq {float(np.mean(i_ipq[:, 0] == sel)):.2f}")

    # expert parallelism: domain vocabularies sharded over a 2-D mesh,
    # images routed to their domain's chip (parallel/ep.py)
    import jax.numpy as jnp

    from anyloc_tpu.parallel import ep_vlad_aggregate, route_by_domain

    mesh2 = get_mesh(n_model=2)
    n_dom = 4
    experts = jnp.asarray(
        rng.standard_normal((n_dom, 32, 256)), jnp.float32)
    patch = jnp.asarray(
        rng.standard_normal((len(jax.devices()) * 2, 49, 256)), jnp.float32)
    domains = jnp.asarray(rng.standard_normal((n_dom, 256)), jnp.float32)
    route = route_by_domain(patch, domains)
    vlads, kept = ep_vlad_aggregate(patch, route, experts, mesh2,
                                    capacity_factor=float(n_dom))
    print(f"expert-parallel VLAD: {vlads.shape} "
          f"(routed over {n_dom} domain vocabularies, kept={int(kept.sum())})")

    # sequence parallelism: ring-attention facet extraction (parallel/sp.py)
    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViTConfig
    from anyloc_tpu.parallel import SPFacetExtractor

    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=96, depth=4,
                    num_heads=4, dtype=jnp.float32)
    sp = SPFacetExtractor(cfg, init_params(cfg, seed=0), 3, "value", mesh2)
    facets = sp(jnp.asarray(
        rng.standard_normal((mesh2.shape["data"] * 2, 56, 56, 3)),
        jnp.float32))
    print(f"sequence-parallel facets: {facets.shape} "
          f"(tokens ring-sharded over {mesh2.shape['model']} chips)")


if __name__ == "__main__":
    main()
