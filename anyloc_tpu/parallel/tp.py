"""Tensor-parallel sharding specs for the ViT trunk.

Megatron-style TP expressed the JAX way: parameter sharding annotations only —
XLA GSPMD inserts the all-reduces after the row-parallel matmuls. The MLP is
where DINOv2-G's parameters live (SwiGLU 1536x4096x3 per block), so TP shards:

  * mlp.fc1 kernel [D, H]  -> P(None, 'model')   (column-parallel)
  * mlp.fc2 kernel [H, D]  -> P('model', None)   (row-parallel; bias replicated)
  * swiglu w3 kernel       -> row-parallel
  * swiglu w12             -> replicated (the fused [x1|x2] layout's split
    point only aligns with even shard counts; replicating it costs ~2/3 of
    the potential TP saving on giant but avoids a resharding all-to-all —
    revisit by storing w1/w2 unfused)

Attention stays replicated: the fused qkv layout (kept for facet parity with
the reference hook, utilities.py:274-281) splits q/k/v at D boundaries that
don't align with head-sharding; attention is <40% of ViT-G params.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if "mlp" in joined:
        if joined.endswith("fc1/kernel"):
            return P(None, "model")
        if joined.endswith("fc1/bias"):
            return P("model")
        if joined.endswith("fc2/kernel") or joined.endswith("w3/kernel"):
            return P("model", None)
    return P()


def vit_tp_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings implementing MLP tensor parallelism."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def replicated_shardings(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params
    )
