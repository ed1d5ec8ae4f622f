"""Pipeline parallelism for the ViT trunk — GPipe-style microbatching over a
mesh axis, expressed with ``shard_map`` + ``ppermute`` (ICI neighbor pushes),
the TPU-native shape of pipelining.

Stage ``s`` of ``S`` holds a contiguous run of transformer blocks as ONE
stacked param shard (leaves ``[S, K, ...]`` sharded on the leading axis), so
per-device parameter bytes drop ~1/S — the alternative to tensor parallelism
(`parallel/tp.py`) for serving ViT-G on small-HBM chips: PP moves one
``[mb, N, D]`` activation per step over ICI where TP all-reduces every
matmul's output.

Schedule: plain GPipe fill-and-drain. With M microbatches the loop runs
``M + S - 1`` steps; each step every stage runs its K blocks on its current
microbatch and ``ppermute``s the activations to the right neighbor. Bubble
fraction = (S-1)/(M+S-1) — pick ``n_micro >= S`` to amortize.

The reference has no pipelining anywhere (its largest model runs single-GPU
inference, DataParallel at best — dvgl_benchmark/train.py:55); this exists
because a TPU-first framework serves the 1.1B-param trunk across chips.

Facet semantics match ``ViT.__call__`` exactly (vit.py): query/key/value runs
blocks ``0..layer-1`` through the pipeline then block ``layer``'s norm1+qkv
outside it; ``token`` runs blocks ``0..layer`` through the pipeline.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anyloc_tpu.models.vit import Block, ViT, ViTConfig


def stack_stage_params(
    params: Dict, n_run: int, n_stages: int
) -> Tuple[Dict, np.ndarray, int]:
    """Stack blocks ``0..n_run-1`` into a ``[S*K, ...]``-leaved tree
    (K = ceil(n_run / S)); slots past ``n_run`` repeat block 0's params as
    inert fillers (their output is masked off, real values avoid div-by-zero
    in quantized paths). Returns ``(stacked_tree, active_mask [S*K], K)``."""
    import flax

    p = params["params"]
    k_per = -(-n_run // n_stages)
    total = k_per * n_stages
    b0 = flax.traverse_util.flatten_dict(p["blocks_0"], sep="/")
    rows = []
    for i in range(total):
        src = p[f"blocks_{i}"] if i < n_run else p["blocks_0"]
        rows.append(flax.traverse_util.flatten_dict(src, sep="/"))
    stacked = {
        # jnp.stack: also trace-safe (sp.py stacks inside a jitted forward)
        key: jnp.stack([r[key] for r in rows]) for key in b0
    }
    mask = (np.arange(total) < n_run)
    return (
        flax.traverse_util.unflatten_dict(stacked, sep="/"),
        mask,
        k_per,
    )


def stage_shardings(stacked: Dict, mesh: Mesh, stage_axis: str = "model"):
    """NamedShardings placing each stage's block shard on its device row
    (leading stacked axis over ``stage_axis``)."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(stage_axis)), stacked
    )


def _pipeline_blocks(
    cfg: ViTConfig,
    stacked: Dict,
    mask: jnp.ndarray,
    embedded: jnp.ndarray,
    *,
    mesh: Mesh,
    n_micro: int,
    data_axis: str,
    stage_axis: str,
) -> jnp.ndarray:
    """Run the stacked blocks over ``embedded`` [B, T, D] with the GPipe
    schedule. Output is bit-equal to applying the blocks sequentially."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[stage_axis]
    total = mask.shape[0]
    k_per = total // n_stages
    # reshape [S*K, ...] -> [S, K, ...] so the leading axis shards per stage
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, k_per) + a.shape[1:]), stacked
    )
    mask2 = jnp.asarray(mask).reshape(n_stages, k_per)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_fn(staged_loc, mask_loc, emb_loc):
        # local shards: staged_loc leaves [1, K, ...]; emb_loc [b_loc, T, D]
        s = lax.axis_index(stage_axis)
        blocks = jax.tree_util.tree_map(lambda a: a[0], staged_loc)
        act = mask_loc[0]
        b_loc, t_len, d = emb_loc.shape
        if b_loc % n_micro:
            raise ValueError(
                f"per-device batch {b_loc} must divide into n_micro={n_micro}"
            )
        mb = b_loc // n_micro
        micro = emb_loc.reshape(n_micro, mb, t_len, d)

        def run_stage(x):
            def body(xc, inp):
                p_k, on = inp
                y = Block(cfg).apply({"params": p_k}, xc)
                return jnp.where(on, y, xc), None

            x, _ = lax.scan(body, x, (blocks, act))
            return x

        n_steps = n_micro + n_stages - 1

        def step(state, tstep):
            inject = micro[jnp.clip(tstep, 0, n_micro - 1)]
            x_in = jnp.where(s == 0, inject, state)
            y = run_stage(x_in)
            nxt = lax.ppermute(y, stage_axis, perm)
            return nxt, y

        init = jnp.zeros((mb, t_len, d), emb_loc.dtype)
        # mark the carry as varying over the mesh axes (jax>=0.7 VMA typing:
        # ppermute's output is varying, the carry must match)
        if hasattr(lax, "pcast"):
            init = lax.pcast(init, (data_axis, stage_axis), to="varying")
        elif hasattr(lax, "pvary"):
            init = lax.pvary(init, (data_axis, stage_axis))
        _, ys = lax.scan(step, init, jnp.arange(n_steps))
        # microbatch m finishes on the LAST stage at step S-1+m; psum the
        # masked emissions so every stage row holds the final activations
        out = lax.psum(jnp.where(s == n_stages - 1, ys, 0), stage_axis)
        return out[n_stages - 1:].reshape(b_loc, t_len, d)

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(stage_axis), staged),
            P(stage_axis, None),
            P(data_axis, None, None),
        ),
        out_specs=P(data_axis, None, None),
    )
    return fn(staged, mask2, embedded)


def pipeline_facet_extract(
    cfg: ViTConfig,
    params: Dict,
    imgs: jnp.ndarray,
    mesh: Mesh,
    layer: int,
    facet: str = "value",
    *,
    n_micro: Optional[int] = None,
    data_axis: str = "data",
    stage_axis: str = "model",
    stacked: Optional[Tuple[Dict, np.ndarray, int]] = None,
) -> jnp.ndarray:
    """Facet extraction with the trunk's blocks pipelined over
    ``mesh[stage_axis]`` (embedding and the capture-block qkv run data-
    parallel outside the pipeline; both are <2% of trunk FLOPs).

    Matches ``ViT.apply(..., capture_layer=layer, capture_facet=facet)``
    exactly. Pass ``stacked=stack_stage_params(...)`` (optionally pre-placed
    with ``stage_shardings``) to amortize the stacking across calls.
    """
    if facet not in ("query", "key", "value", "token"):
        raise ValueError(f"pipeline route supports q/k/v/token, got {facet}")
    n_stages = mesh.shape[stage_axis]
    n_run = layer + 1 if facet == "token" else layer
    if n_micro is None:
        # largest divisor of the per-device batch up to 2S: >=S microbatches
        # amortize the fill/drain bubble, more just shrinks the matmuls
        b_loc = max(imgs.shape[0] // mesh.shape[data_axis], 1)
        n_micro = max(
            (d for d in range(1, min(b_loc, 2 * n_stages) + 1)
             if b_loc % d == 0),
            default=1,
        )
    if stacked is None:
        stacked = stack_stage_params(params, n_run, n_stages)
    stacked_tree, mask, _ = stacked

    embedded = ViT(cfg).apply(params, imgs, embed_only=True)
    x = _pipeline_blocks(
        cfg, stacked_tree, mask, embedded,
        mesh=mesh, n_micro=n_micro,
        data_axis=data_axis, stage_axis=stage_axis,
    )
    if facet == "token":
        return x
    qkv = Block(cfg).apply(
        {"params": params["params"][f"blocks_{layer}"]}, x, qkv_only=True
    )
    d = cfg.embed_dim
    off = {"query": 0, "key": 1, "value": 2}[facet]
    return qkv[..., off * d: (off + 1) * d]


def pipeline_params_bytes_per_device(stacked_sharded: Any) -> int:
    """Per-device bytes of a ``stage_shardings``-placed stacked tree (the
    PP footprint diagnostic, mirroring ``tp.params_bytes_per_device``)."""
    from anyloc_tpu.parallel.tp import params_bytes_per_device

    return params_bytes_per_device(stacked_sharded)
