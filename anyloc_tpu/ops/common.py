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


def score_dot(score_dtype: str = "float32"):
    """Return the scoring matmul for retrieval engines.

    "float32": full-precision passes (ranking-exact, FAISS semantics);
    "bfloat16": fast MXU path with f32 accumulation (measured ~3.5x qps;
    near-ties can flip). Shared by the device and sharded engines so the
    dtype menu can't drift between them.
    """
    if score_dtype == "bfloat16":
        def dot(a, b):
            return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
    elif score_dtype == "float32":
        def dot(a, b):
            return jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=EXACT)
    else:
        raise ValueError(f"Unknown score_dtype: {score_dtype}")
    return dot


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
