"""Multi-chip execution: device meshes + sharded k-means / retrieval / extraction.

Replaces the reference's single-process ``torch.nn.DataParallel`` (the only
multi-device execution in AnyLoc — dvgl_benchmark/train.py:55) with
jax.sharding meshes: collectives ride ICI, expressed via shard_map + psum /
all_gather, per SURVEY.md §2.4 and §5.
"""

from anyloc_tpu.parallel.mesh import get_mesh, init_distributed, local_mesh
from anyloc_tpu.parallel.distributed import (
    ivf_pq_search_sharded,
    ivf_search_sharded,
    kmeans_fit_sharded,
    pq_search_sharded,
    sharded_extract_fn,
    top_k_search_sharded,
)
from anyloc_tpu.parallel.ep import ep_vlad_aggregate, route_by_domain
from anyloc_tpu.parallel.pp import pipeline_facet_extract, stack_stage_params
from anyloc_tpu.parallel.sp import (
    SPFacetExtractor,
    ring_attention,
    sp_facet_extract,
)

__all__ = [
    "ep_vlad_aggregate",
    "route_by_domain",
    "get_mesh",
    "init_distributed",
    "local_mesh",
    "ivf_pq_search_sharded",
    "ivf_search_sharded",
    "kmeans_fit_sharded",
    "pq_search_sharded",
    "sharded_extract_fn",
    "top_k_search_sharded",
    "pipeline_facet_extract",
    "stack_stage_params",
    "ring_attention",
    "SPFacetExtractor",
    "sp_facet_extract",
]
