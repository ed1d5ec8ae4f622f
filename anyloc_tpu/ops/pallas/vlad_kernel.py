"""Fused VLAD aggregation kernel.

One pallas grid cell per image fuses the full AnyLoc-VLAD pipeline that the
XLA path expresses as separate ops (normalize -> assignment matmul -> one-hot
-> residual matmul -> intra-norm -> final norm): descriptors stream HBM->VMEM
once per image, every intermediate ([N, C] similarities, one-hot weights,
[C, D] residual sums) lives and dies in VMEM, and only the [C*D] descriptor
returns to HBM.

VMEM budget per cell at the SOTA shape (N=529+pad, D=1536, C=32, f32):
descs ~3.3 MB + centers/sums ~0.4 MB — comfortably inside 16 MB.

Supports hard (cosine/euclidean) and the reference's soft assignment
(all-centers residual sum, utilities.py:880-884). CPU and masked batches use
the XLA path in ops.vlad (identical semantics, tested against the same
oracle).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from anyloc_tpu.ops.common import round_up as _round_up


def _vlad_kernel(
    x_ref, c_ref, cn_ref, o_ref, *,
    n_valid: int, dist_mode: str, intra_norm: bool, norm_descs: bool,
    vlad_mode: str = "hard", soft_temp: float = 1.0,
):
    """x [1, Np, D] descriptors; c [C, D] centers; cn [C, D] unit centers;
    o [1, C*D] output."""
    x = x_ref[0].astype(jnp.float32)                      # [Np, D]
    centers = c_ref[:].astype(jnp.float32)                # [C, D]
    n_p, d = x.shape
    c = centers.shape[0]

    if norm_descs:
        inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24))
        x = x * inv
    # Assignment similarity
    if dist_mode == "cosine" or vlad_mode == "soft":
        sim = jax.lax.dot_general(
            x, cn_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Np, C] cosine (x normalized when norm_descs; for soft mode the
        # reference always uses cosine regardless of dist_mode)
        if vlad_mode == "soft" and not norm_descs:
            xin = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
            )
            sim = sim * xin
    else:  # euclidean hard: -||x-c||^2 up to const
        xc = jax.lax.dot_general(
            x, centers, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sim = 2.0 * xc - jnp.sum(centers * centers, axis=-1)[None, :]
    # Mask padded tokens out of the assignment
    row = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    valid = row < n_valid
    if vlad_mode == "hard":
        # Hard one-hot: argmax (ties -> lowest index, jnp semantics) compared
        # against a column iota — no gather/scatter, VPU-only.
        labels = jnp.argmax(sim, axis=-1)  # [Np]
        col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        a = jnp.where((col == labels[:, None]) & valid, 1.0, 0.0)
    else:
        e = jnp.exp(soft_temp * sim
                    - jnp.max(soft_temp * sim, axis=-1, keepdims=True))
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        a = jnp.where(valid, a, 0.0)

    wsum = jax.lax.dot_general(
        a, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [C, D]
    counts = jnp.sum(a, axis=0)  # [C]
    if vlad_mode == "hard":
        v = wsum - counts[:, None] * centers
    else:
        # reference soft semantics (utilities.py:880-884): residuals to ALL
        # centers, summed: V[k] = C * wsum[k] - counts[k] * sum_c centers_c
        v = c * wsum - counts[:, None] * jnp.sum(centers, axis=0)[None, :]
    if intra_norm:
        nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(nrm, 1e-12)
    total = jnp.sqrt(jnp.sum(v * v))
    o_ref[0] = v / jnp.maximum(total, 1e-12)


def vlad_aggregate_fused(
    descs: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    dist_mode: str = "cosine",
    intra_norm: bool = True,
    norm_descs: bool = True,
    vlad_mode: str = "hard",
    soft_temp: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused VLAD (hard or reference-soft assignment).
    descs [B, N, D] -> [B, C*D]."""
    b, n, d = descs.shape
    c = centers.shape[0]
    sub = 8  # f32 sublane
    np_tok = _round_up(n, sub)
    if np_tok != n:
        descs = jnp.pad(descs, [(0, 0), (0, np_tok - n), (0, 0)])
    centers = centers.astype(jnp.float32)
    cnorm = centers / jnp.maximum(
        jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12
    )
    kernel = functools.partial(
        _vlad_kernel,
        n_valid=n,
        dist_mode=dist_mode,
        intra_norm=intra_norm,
        norm_descs=norm_descs,
        vlad_mode=vlad_mode,
        soft_temp=soft_temp,
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_tok, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, d), jnp.float32),
        interpret=interpret,
    )(descs.astype(jnp.float32), centers, cnorm).reshape(b, c * d)
