"""Fused VLAD aggregation kernel.

One pallas grid row per image fuses the full AnyLoc-VLAD pipeline that the
XLA path expresses as separate ops (normalize -> assignment matmul -> one-hot
-> residual matmul -> intra-norm -> final norm): descriptors stream HBM->VMEM
once per image, every intermediate ([N, C] similarities, one-hot weights,
[C, D] residual sums) lives and dies in VMEM, and only the [C*D] descriptor
returns to HBM.

Token blocking: the grid is (B, n_blocks). Images whose padded [N, D] slab
fits the single-block VMEM budget (the SOTA shape: N=529+pad x D=1536 f32
~3.3 MB) run as one block per image, exactly the original kernel. Longer
sequences — the demo path reaches 73x73 = 5330 tokens, a 33 MB slab that
overflows the 16 MB scoped-VMEM limit — stream through in token blocks:
the [C, D] weighted-residual sum and [1, C] counts accumulate in VMEM
scratch across blocks (TPU grids iterate the trailing axis sequentially,
so scratch carries state), and the residual/normalize epilogue runs once
on the final block. Assignment (argmax / softmax over C) is per-token, so
blocking changes nothing semantically.

Supports hard (cosine/euclidean) and the reference's soft assignment
(all-centers residual sum, utilities.py:880-884). CPU and masked batches use
the XLA path in ops.vlad (identical semantics, tested against the same
oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from anyloc_tpu.ops.common import round_up as _round_up

# Single-block fast path as long as the per-image f32 slab stays well under
# the ~16 MB scoped-VMEM limit (slab + [N, C] sim + one-hot + [C, D] sums
# must all fit); past it, stream in _BLOCK_TOKENS-token blocks (~3 MB at
# D=1536).
_SINGLE_BLOCK_MAX_BYTES = 6 * 2**20
_BLOCK_TOKENS = 512


def _assignment(x, centers, cn, valid, *, dist_mode, norm_descs, vlad_mode,
                soft_temp):
    """Per-token assignment weights a [Nb, C] (hard one-hot or softmax),
    zeroed on padded rows. ``x`` is the (already normalized when
    ``norm_descs``) f32 block; ``valid`` its [Nb, C] row mask."""
    if dist_mode == "cosine" or vlad_mode == "soft":
        sim = jax.lax.dot_general(
            x, cn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nb, C] cosine (x normalized when norm_descs; for soft mode the
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
    if vlad_mode == "hard":
        # Hard one-hot: argmax (ties -> lowest index, jnp semantics) compared
        # against a column iota — no gather/scatter, VPU-only.
        labels = jnp.argmax(sim, axis=-1)  # [Nb]
        col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        return jnp.where((col == labels[:, None]) & valid, 1.0, 0.0)
    e = jnp.exp(soft_temp * sim
                - jnp.max(soft_temp * sim, axis=-1, keepdims=True))
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.where(valid, a, 0.0)


def _vlad_kernel(
    x_ref, c_ref, cn_ref, o_ref, wsum_ref, cnt_ref, *,
    n_valid: int, block_n: int, n_blocks: int, dist_mode: str,
    intra_norm: bool, norm_descs: bool,
    vlad_mode: str = "hard", soft_temp: float = 1.0,
):
    """x [1, block_n, D] token block; c [C, D] centers; cn [C, D] unit
    centers; o [1, C, D] output; wsum [C, D] / cnt [1, C] VMEM accumulators
    carried across the (sequential) token-block axis."""
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                      # [Nb, D]
    centers = c_ref[:].astype(jnp.float32)                # [C, D]
    c = centers.shape[0]

    if norm_descs:
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24))
        x = x * inv
    # Mask padded tokens out of the assignment (global row index)
    row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], c), 0)
    valid = row + j * block_n < n_valid
    a = _assignment(x, centers, cn_ref[:].astype(jnp.float32), valid,
                    dist_mode=dist_mode, norm_descs=norm_descs,
                    vlad_mode=vlad_mode, soft_temp=soft_temp)

    wsum_blk = jax.lax.dot_general(
        a, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [C, D]
    cnt_blk = jnp.sum(a, axis=0)[None]  # [1, C]

    @pl.when(j == 0)
    def _init():
        wsum_ref[:] = wsum_blk
        cnt_ref[:] = cnt_blk

    @pl.when(j > 0)
    def _accum():
        wsum_ref[:] += wsum_blk
        cnt_ref[:] += cnt_blk

    @pl.when(j == n_blocks - 1)
    def _finalize():
        wsum = wsum_ref[:]
        counts = cnt_ref[0]
        if vlad_mode == "hard":
            v = wsum - counts[:, None] * centers
        else:
            # reference soft semantics (utilities.py:880-884): residuals to
            # ALL centers, summed:
            # V[k] = C * wsum[k] - counts[k] * sum_c centers_c
            v = (c * wsum
                 - counts[:, None] * jnp.sum(centers, axis=0)[None, :])
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
    if n * d * 4 <= _SINGLE_BLOCK_MAX_BYTES:
        block_n = _round_up(n, sub)
    else:
        block_n = _BLOCK_TOKENS
    np_tok = _round_up(n, block_n)
    n_blocks = np_tok // block_n
    if np_tok != n:
        descs = jnp.pad(descs, [(0, 0), (0, np_tok - n), (0, 0)])
    centers = centers.astype(jnp.float32)
    cnorm = centers / jnp.maximum(
        jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12
    )
    kernel = functools.partial(
        _vlad_kernel,
        n_valid=n,
        block_n=block_n,
        n_blocks=n_blocks,
        dist_mode=dist_mode,
        intra_norm=intra_norm,
        norm_descs=norm_descs,
        vlad_mode=vlad_mode,
        soft_temp=soft_temp,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, d), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(descs.astype(jnp.float32), centers, cnorm).reshape(b, c * d)
