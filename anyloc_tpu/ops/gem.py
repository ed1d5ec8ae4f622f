"""GeM (generalized-mean) pooling over patch descriptors.

Reference: AnyLoc/AnyLoc ``scripts/dino_v2_gem.py:170-190``
(``get_gem_descriptors``) — p-mean over the patch axis with a complex-power
trick so negative means keep their sign:

    x = mean(descs ** p, axis=-2)
    g = |x ** (1/p)| * sign(x)        # == sign(x) * |x| ** (1/p)

(For odd-ish behavior with negative inputs to ``descs ** p``, the reference
relies on torch real powers producing NaN→complex path only at the 1/p step;
for the default p=3 the patch term ``d**3`` is real and sign-preserving, and
the complex-power output reduces exactly to ``sign(x) * |x|**(1/p)``, which is
what we compute directly — no complex dtype needed on TPU.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("p", "use_abs", "eps"))
def gem_pool(
    descs: jnp.ndarray, p: float = 3.0, use_abs: bool = False, eps: float = 0.0
) -> jnp.ndarray:
    """GeM pool patch descriptors [..., N, D] -> [..., D].

    ``use_abs`` mirrors ``--gem-use-abs`` (mean of |d|^p); otherwise the
    signed complex-power variant (the reference default).
    """
    descs = descs.astype(jnp.float32)
    if use_abs:
        x = jnp.mean(jnp.abs(descs) ** p, axis=-2)
        return x ** (1.0 / p)
    x = jnp.mean(descs ** p, axis=-2)
    if eps:
        x = jnp.where(jnp.abs(x) < eps, jnp.sign(x) * eps, x)
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / p)


@functools.partial(jax.jit, static_argnames=("p", "eps"))
def gem_pool_spatial(x: jnp.ndarray, p: float = 3.0, eps: float = 1e-6) -> jnp.ndarray:
    """CNN-style GeM over spatial dims for non-negative (post-ReLU) feature
    maps [..., H, W, C] -> [..., C] (dvgl_benchmark/model/functional.py:43-47
    semantics: clamp(min=eps) then p-mean)."""
    x = jnp.clip(x.astype(jnp.float32), eps, None)
    return jnp.mean(x ** p, axis=(-3, -2)) ** (1.0 / p)
