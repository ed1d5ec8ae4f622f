"""Global pooling descriptors (max / avg / MAC / SPoC / R-MAC).

Covers the reference's global-pooling pipelines (``scripts/dino_v2_gp.py``)
and the functional aggregators of ``dvgl_benchmark/model/functional.py:29-84``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def global_max_pool(descs: jnp.ndarray) -> jnp.ndarray:
    """[..., N, D] -> [..., D] max over patches (MAC over tokens)."""
    return jnp.max(descs, axis=-2)


@jax.jit
def global_avg_pool(descs: jnp.ndarray) -> jnp.ndarray:
    """[..., N, D] -> [..., D] mean over patches (SPoC over tokens)."""
    return jnp.mean(descs, axis=-2)


@jax.jit
def mac_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """MAC over a spatial feature map [..., H, W, C] -> [..., C]
    (dvgl functional.py:29-31)."""
    return jnp.max(x, axis=(-3, -2))


@jax.jit
def spoc_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """SPoC over a spatial feature map (dvgl functional.py:34-36)."""
    return jnp.mean(x, axis=(-3, -2))


def rmac_regions(h: int, w: int, levels: int = 3, overlap: float = 0.4):
    """R-MAC region grid (static python — shapes known at trace time).

    Mirrors the multi-scale square-region scheme of dvgl
    ``model/functional.py:50-84``: at level l, l x ~l grid of square regions
    with ~40% overlap. Returns a list of (y0, x0, size) ints.
    """
    min_hw = min(h, w)
    regions = []
    for l in range(1, levels + 1):
        size = max(1, int(2 * min_hw / (l + 1)))
        if l == 1 and h == w:
            regions.append((0, 0, size))
            continue
        n_h = max(1, int(round((h - size) / max(size * (1 - overlap), 1))) + 1)
        n_w = max(1, int(round((w - size) / max(size * (1 - overlap), 1))) + 1)
        ys = [0] if n_h == 1 else [int(round(i * (h - size) / (n_h - 1))) for i in range(n_h)]
        xs = [0] if n_w == 1 else [int(round(i * (w - size) / (n_w - 1))) for i in range(n_w)]
        for y0 in ys:
            for x0 in xs:
                regions.append((y0, x0, size))
    return regions


def rmac_spatial(x: jnp.ndarray, levels: int = 3) -> jnp.ndarray:
    """R-MAC over [..., H, W, C]: per-region MAC, L2-norm each, sum, per the
    dvgl R-MAC aggregator. Returns [..., C]."""
    from anyloc_tpu.ops.common import l2_normalize

    h, w = x.shape[-3], x.shape[-2]
    acc = None
    for (y0, x0, s) in rmac_regions(h, w, levels):
        r = jnp.max(x[..., y0 : y0 + s, x0 : x0 + s, :], axis=(-3, -2))
        r = l2_normalize(r, axis=-1)
        acc = r if acc is None else acc + r
    return acc
