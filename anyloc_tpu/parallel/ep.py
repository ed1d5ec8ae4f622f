"""Expert parallelism — domain vocabularies sharded across chips with
all_to_all routed dispatch.

AnyLoc's method keyword is the *domain* vocabulary: separate VLAD center
banks per deployment domain (indoor/urban/aerial — demo cache layout
``vocabulary/.../{domain}/c_centers.pt``), and the HF-space demo picks the
vocabulary for a user image by projecting its GeM descriptor against cached
per-dataset descriptors (hf_imgs_vlad_clusters.py:257-356). At production
scale that cache is MANY banks — per domain x layer x cluster-count x
dataset (the ablation grids build dozens) — and a serving fleet wants them
*sharded*, not replicated.

This module is the TPU-native shape of that: a bank of E experts
([E, C, D] VLAD vocabularies) lives sharded over a mesh axis, a router
assigns each image an expert, and a capacity-based ``all_to_all`` dispatch
(the standard MoE exchange) moves each image's patch descriptors to the
chip holding its expert, aggregates there, and combines the results back —
images only ever cross ICI once in each direction.

The reference has no multi-device execution at all (SURVEY §2.4); this is
the ep axis of the framework's dp/tp/pp/sp/ep set (parallel/).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from anyloc_tpu.ops.common import l2_normalize
from anyloc_tpu.ops.gem import gem_pool
from anyloc_tpu.ops.vlad import vlad_aggregate


def route_by_domain(
    descs: jnp.ndarray, domain_centroids: jnp.ndarray, p: float = 3.0
) -> jnp.ndarray:
    """Nearest-domain router: GeM-pool each image's patch descriptors and
    pick the cosine-nearest domain centroid — the functional core of the
    HF-space domain picker (hf_imgs_vlad_clusters.py:257-356, which projects
    GeM descriptors against per-dataset caches). [B, N, D], [E, D] -> [B]."""
    g = l2_normalize(gem_pool(descs, p=p, use_abs=True), axis=-1)
    c = l2_normalize(domain_centroids.astype(jnp.float32), axis=-1)
    return jnp.argmax(g @ c.T, axis=-1).astype(jnp.int32)


def ep_vlad_aggregate(
    descs: jnp.ndarray,
    route: jnp.ndarray,
    experts: jnp.ndarray,
    mesh: Mesh,
    *,
    capacity_factor: float = 1.25,
    data_axis: str = "data",
    expert_axis: str = "model",
    **vlad_kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Routed VLAD: image ``i`` is aggregated against expert ``route[i]``.

    ``descs`` [B, T, D] shards over BOTH mesh axes (every chip holds
    B / (n_data * n_exp) images); ``experts`` [E, C, D] shards over
    ``expert_axis`` (replicated across ``data_axis``). Each chip builds a
    [n_exp, capacity, T, D] dispatch buffer (capacity =
    ceil(B_loc / n_exp * capacity_factor) slots per target chip),
    ``all_to_all``s it across its expert row, aggregates the received
    images against its local expert shard, and ``all_to_all``s the
    [capacity, C*D] results back to their sources.

    Returns ``(vlads [B, C*D], kept [B] bool)`` — images beyond a target
    chip's capacity are dropped (zeros, kept=False), the standard MoE
    overflow contract; size ``capacity_factor`` for the expected skew or
    set it >= n_exp to make dropping impossible.
    """
    n_exp = mesh.shape[expert_axis]
    e_total, n_clusters, d = experts.shape
    if e_total % n_exp:
        raise ValueError(f"experts ({e_total}) must divide the "
                         f"{expert_axis!r} axis ({n_exp})")
    e_loc = e_total // n_exp

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    import math

    b = descs.shape[0]
    n_chips = mesh.shape[data_axis] * n_exp
    if b % n_chips:
        raise ValueError(f"batch ({b}) must divide the mesh ({n_chips})")
    b_loc = b // n_chips
    capacity = max(1, int(math.ceil(b_loc * capacity_factor / n_exp)))
    agg = functools.partial(vlad_aggregate, **vlad_kw)

    def fn(descs_loc, route_loc, experts_loc):
        # dispatch plan (per data row, everything [B_loc]-local)
        in_range = (route_loc >= 0) & (route_loc < e_total)
        target = route_loc // e_loc  # chip on the expert axis
        e_local = route_loc % e_loc  # expert slot on that chip
        onehot_t = jax.nn.one_hot(target, n_exp, dtype=jnp.int32)
        onehot_t = onehot_t * in_range[:, None].astype(jnp.int32)
        pos = jnp.cumsum(onehot_t, axis=0) * onehot_t - onehot_t  # rank
        pos = pos.sum(-1)  # [B_loc] position within the target's buffer
        # out-of-range routes are dropped (kept=False), same contract as
        # capacity overflow — a zero descriptor must never read as valid
        kept = (pos < capacity) & in_range
        # D[b, t, c]: image b occupies slot c of target t's buffer
        disp = (
            onehot_t.astype(bool)[:, :, None]
            & (jax.nn.one_hot(pos, capacity, dtype=jnp.int32) > 0)[:, None, :]
            & kept[:, None, None]
        ).astype(descs_loc.dtype)

        x = jnp.einsum("btc,bnd->tcnd", disp, descs_loc)
        slot_e = jnp.einsum("btc,b->tc", disp, e_local.astype(descs_loc.dtype))
        x = lax.all_to_all(x, expert_axis, 0, 0)  # [n_src, cap, T, D]
        slot_e = lax.all_to_all(slot_e[..., None], expert_axis, 0, 0)[..., 0]

        # aggregate against the local expert shard (centers picked per slot)
        centers = jnp.einsum(
            "sce,ekd->sckd",
            jax.nn.one_hot(slot_e.astype(jnp.int32), e_loc,
                           dtype=jnp.float32),
            experts_loc.astype(jnp.float32),
        )
        flat_x = x.reshape(n_exp * capacity, *x.shape[2:])
        flat_c = centers.reshape(n_exp * capacity, n_clusters, d)
        y = jax.vmap(lambda dd, cc: agg(dd[None], cc)[0])(flat_x, flat_c)
        y = y.reshape(n_exp, capacity, n_clusters * d)

        y = lax.all_to_all(y, expert_axis, 0, 0)  # back at the source
        out = jnp.einsum("btc,tcv->bv", disp.astype(y.dtype), y)
        return out, kept

    batch_spec = P((data_axis, expert_axis))
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(batch_spec, batch_spec, P(expert_axis)),
        out_specs=(batch_spec, batch_spec),
    )(descs, route, experts)
