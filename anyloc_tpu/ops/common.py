"""Shared numeric helpers for the ops layer."""

from __future__ import annotations

import jax.numpy as jnp

# torch.nn.functional.normalize uses eps=1e-12 with x / max(||x||, eps); we match
# that semantics exactly so descriptors agree with the reference
# (utilities.py:282, :785, :960 in AnyLoc/AnyLoc).
NORM_EPS = 1e-12

# Matmul precision for ranking- and parity-critical ops (cluster assignment,
# retrieval scores, VLAD residual sums). On TPU the default f32 matmul runs in
# bf16 passes (~1e-3 relative noise) which is fine inside the ViT trunk but
# flips near-tie rankings and breaks descriptor parity; these small matmuls are
# negligible FLOPs next to the ViT forward, so we always run them at HIGHEST
# (true f32 accumulation).
import jax  # noqa: E402

EXACT = jax.lax.Precision.HIGHEST


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = NORM_EPS) -> jnp.ndarray:
    """L2-normalize along ``axis`` with torch.F.normalize semantics.

    ``x / max(||x||, eps)`` — zero vectors stay zero (no NaN), matching
    ``torch.nn.functional.normalize``.
    """
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
