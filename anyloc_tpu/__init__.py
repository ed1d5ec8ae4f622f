"""anyloc_tpu — a TPU-native (JAX/Flax/Pallas/pjit) visual place recognition framework.

A ground-up rebuild of the capabilities of AnyLoc (arXiv 2308.00688): training-free
global descriptors from frozen ViT foundation models (DINOv2 / DINO / CLIP / MAE /
SAM / ImageBind-vision), aggregated with VLAD / GeM / global pooling over a k-means
vocabulary, retrieved by exact top-k search, and scored with Recall@K.

Design stance (vs the PyTorch reference at AnyLoc/AnyLoc):
  * no forward hooks — extractors return intermediate-layer facets functionally
    (ref: utilities.py:219-288 DinoV2ExtractFeatures uses qkv hooks);
  * no per-image Python loops — everything batched, jit-compiled, vmap/scan;
  * device-mesh sharding (pjit/shard_map) instead of torch DataParallel;
  * brute-force sharded matmul top-k instead of FAISS;
  * array-native .npz caches instead of .pt pickles.
"""

__version__ = "0.1.0"

from anyloc_tpu.ops.vlad import VLAD, vlad_aggregate
from anyloc_tpu.ops.kmeans import KMeans, kmeans_fit
from anyloc_tpu.ops.retrieval import get_top_k_recall, top_k_search
from anyloc_tpu.ops.gem import gem_pool
from anyloc_tpu.ops.pooling import global_avg_pool, global_max_pool
from anyloc_tpu.ops.pca import reduce_pca

__all__ = [
    "VLAD",
    "vlad_aggregate",
    "KMeans",
    "kmeans_fit",
    "get_top_k_recall",
    "top_k_search",
    "gem_pool",
    "global_avg_pool",
    "global_max_pool",
    "reduce_pca",
]
