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

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a per-user directory.

    TPU cold starts are dominated by compilation (and, behind a remote-device
    tunnel, by shipping each program to the backend); caching compiled
    executables across processes turns minutes of warmup into seconds on every
    run after the first. Opt out with ANYLOC_TPU_NO_COMPILE_CACHE=1 or
    override the location with JAX_COMPILATION_CACHE_DIR (which JAX itself
    honors, so we never clobber an explicit user setting).
    """
    if _os.environ.get("ANYLOC_TPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu":
        # CPU-first runs (unit tests, virtual meshes) compile fast anyway, and
        # persisted XLA:CPU AOT executables are machine-feature-pinned —
        # reloading them elsewhere risks SIGILL. Cache only device backends.
        return
    import jax

    if jax.config.jax_compilation_cache_dir is not None:
        return  # user already configured it programmatically
    if (jax.config.jax_platforms or "").split(",")[0] == "cpu":
        return  # programmatically pinned to CPU (tests, virtual meshes)
    cache_home = _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache"))
    path = _os.path.join(cache_home, "anyloc_tpu", "xla_cache")
    try:
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that takes noticeable time; default threshold (1s)
        # skips the many small programs (kmeans steps, recalls) that still
        # cost a round-trip each on remote backends.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from anyloc_tpu.ops.vlad import VLAD, vlad_aggregate
from anyloc_tpu.ops.kmeans import KMeans, kmeans_fit, kmeans_fit_streamed
from anyloc_tpu.ops.retrieval import get_top_k_recall, top_k_search
from anyloc_tpu.ops.gem import gem_pool
from anyloc_tpu.ops.pooling import global_avg_pool, global_max_pool
from anyloc_tpu.ops.pca import reduce_pca
from anyloc_tpu.ops.ivf import IVFIndex, ivf_fit
from anyloc_tpu.ops.pq import PQIndex, pq_fit

__all__ = [
    "VLAD",
    "vlad_aggregate",
    "KMeans",
    "kmeans_fit",
    "kmeans_fit_streamed",
    "get_top_k_recall",
    "top_k_search",
    "gem_pool",
    "global_avg_pool",
    "global_max_pool",
    "reduce_pca",
    "IVFIndex",
    "ivf_fit",
    "PQIndex",
    "pq_fit",
]
