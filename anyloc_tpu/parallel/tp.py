"""Tensor-parallel sharding specs for the ViT trunk.

Megatron-style TP expressed the JAX way: parameter sharding annotations only —
XLA GSPMD inserts the all-reduces after the row-parallel matmuls. With
``ViTConfig(tp_split=True)`` the trunk stores its big matrices in shardable
layouts, and TP covers essentially all block parameters:

  * attention wq/wk/wv kernels [D, D] -> P(None, 'model')  (column-parallel,
    head-aligned: heads are column-minor so a contiguous shard holds whole
    heads whenever n_model divides num_heads)
  * attention proj [D, D]      -> P('model', None)  (row-parallel; GSPMD
    psums the partial outputs; bias replicated, added post-reduction)
  * swiglu w1/w2 [D, H]        -> P(None, 'model')  (gate-aligned — the
    silu(x@w1) * (x@w2) product is shard-local)
  * swiglu w3 / mlp.fc2 [H, D] -> P('model', None)
  * mlp.fc1 [D, H]             -> P(None, 'model')

Without ``tp_split`` the fused qkv [D, 3D] / w12 [D, 2H] layouts (kept for
the int8 fused kernels and single-chip serving) cannot shard column-aligned
and stay replicated — only fc1/fc2/w3 shard. The round-1 "TP barely shards
anything on giant" gap is exactly this: serve ViT-G across chips with
``tp_split=True`` (converters split checkpoints automatically, models/
dinov2.py), serve single-chip int8 with the fused layouts.

Replaced reference precedent: whole-model DataParallel replication
(dvgl_benchmark/train.py:55).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("wq/kernel", "wk/kernel", "wv/kernel",
                 "w1/kernel", "w2/kernel", "fc1/kernel")
_COL_BIAS = ("wq/bias", "wk/bias", "wv/bias",
             "w1/bias", "w2/bias", "fc1/bias")
_ROW_PARALLEL = ("fc2/kernel", "w3/kernel", "attn/proj/kernel")


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if any(joined.endswith(s) for s in _COL_PARALLEL):
        return P(None, "model")
    if any(joined.endswith(s) for s in _COL_BIAS):
        return P("model")
    if any(joined.endswith(s) for s in _ROW_PARALLEL):
        return P("model", None)
    return P()


def split_fused_params(params: Any) -> Any:
    """Rewrite a fused-layout param tree (attn qkv [D,3D], swiglu w12
    [D,2H]) into the tp_split layout (wq/wk/wv, w1/w2) — the same split
    ``convert_dinov2(tp_split=True)`` applies to torch checkpoints, exposed
    for trees that were initialized (not converted) in the fused layout.
    Returns a new tree; non-fused leaves pass through unchanged."""
    import flax
    import numpy as np

    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if k.endswith("attn/qkv/kernel"):
            for t, nm in enumerate(("wq", "wk", "wv")):
                out[k.replace("qkv/kernel", f"{nm}/kernel")] = (
                    np.split(v, 3, axis=1)[t])
        elif k.endswith("attn/qkv/bias"):
            for t, nm in enumerate(("wq", "wk", "wv")):
                out[k.replace("qkv/bias", f"{nm}/bias")] = np.split(v, 3)[t]
        elif k.endswith("mlp/w12/kernel"):
            for t, nm in enumerate(("w1", "w2")):
                out[k.replace("w12/kernel", f"{nm}/kernel")] = (
                    np.split(v, 2, axis=1)[t])
        elif k.endswith("mlp/w12/bias"):
            for t, nm in enumerate(("w1", "w2")):
                out[k.replace("w12/bias", f"{nm}/bias")] = np.split(v, 2)[t]
        else:
            out[k] = v
    return {"params": flax.traverse_util.unflatten_dict(out, sep="/")}


def vit_tp_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings implementing trunk tensor parallelism."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), params
    )


def replicated_shardings(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params
    )


def params_bytes_per_device(params: Any) -> int:
    """Max per-device bytes actually held by ``params`` (sums each leaf's
    addressable shards on device 0) — the TP-footprint diagnostic used by the
    dryrun and tests."""
    import numpy as np

    total = 0
    dev0 = jax.devices()[0]
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "addressable_shards"):
            for sh in leaf.addressable_shards:
                if sh.device == dev0:
                    total += int(np.prod(sh.data.shape)) * sh.data.dtype.itemsize
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total
