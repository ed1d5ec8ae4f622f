"""Pallas attention kernel for the ViT trunk.

The VPR workload has short sequences (320px -> 529 tokens + CLS; demo up to
~5.4k tokens) and large batch — flash-attention here is about *HBM traffic*,
not length scaling (SURVEY.md §5 long-context row): the XLA path materializes
the [B, H, N, N] probability tensor in HBM (~100 MB per DINOv2-G layer at
batch 32 / 257 tokens); this kernel keeps each (batch, head) attention row
resident in VMEM and writes only the [N, hd] output.

For N <= ~1.2k the whole row fits VMEM, so the kernel is a single-pass
softmax(QK^T)V per grid cell — no online-softmax bookkeeping needed. Longer
sequences (demo-path images up to ~5.4k tokens) route to
``flash_attention_blocked`` — the classic k-blocked online-softmax with
running max/denominator scratch (2.3x XLA at 5.3k tokens; nothing larger
than a [Bq, Bk] tile ever materializes).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from anyloc_tpu.ops.common import round_up as _round_up

# Beyond this many (padded) tokens the per-cell f32 score block cannot fit
# the VMEM scoped stack even at one head per cell.
_MAX_VMEM_TOKENS = 1216


def _attn_kernel_full(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    """One (batch*head) cell: full-row attention in VMEM.

    Block shapes: q/k/v/o [1, Np, hd] (Np = padded token count).
    """
    # operands stay in the input dtype (bf16 runs the MXU at native rate;
    # an f32-operand dot costs multiple passes); accumulation is f32 and the
    # scale applies to the accumulated scores — same softmax, one rounding
    q = q_ref[0]                                      # [Np, hd]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Np, Np]
    np_tokens = s.shape[-1]
    if n_valid < np_tokens:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over [B, H, N, hd] tensors -> [B, H, N, hd].

    Tokens are padded to the TPU sublane multiple internally; padded *keys*
    are masked out of the softmax, padded *query* rows produce garbage rows
    that callers never read (they're sliced off with the padding).
    """
    b, h, n, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    np_tok = _round_up(n, sub)
    if np_tok > _MAX_VMEM_TOKENS and not interpret:
        if jax.default_backend() == "tpu":
            return flash_attention_blocked(q, k, v, scale=scale)
        return xla_attention(q, k, v, scale=scale)
    if np_tok != n:
        pad = [(0, 0), (0, 0), (0, np_tok - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(b * h, np_tok, hd)
    kf = k.reshape(b * h, np_tok, hd)
    vf = v.reshape(b * h, np_tok, hd)

    kernel = functools.partial(_attn_kernel_full, scale=scale, n_valid=n)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, np_tok, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_tok, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_tok, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, np_tok, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, np_tok, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, np_tok, hd)
    return out[:, :, :n]


def _attn_kernel_heads(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    """One batch element per cell, all heads in-block: q/k/v [1, H, Np, hd].
    Fewer, larger grid cells than the per-(batch,head) kernel — better for
    short sequences where per-cell overhead dominates."""
    # input-dtype operands, f32 accumulation, scale on the scores (see
    # _attn_kernel_full note)
    q = q_ref[0]                                      # [H, Np, hd]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [H, Np, Np]
    np_tokens = s.shape[-1]
    if n_valid < np_tokens:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention_heads(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    scale: Optional[float] = None, head_chunk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-batched variant of flash_attention (same semantics). Heads are
    chunked to stay inside the VMEM scoped-stack limit: the f32 score block
    is chunk * Np^2 * 4 bytes, and the q/k/v/o blocks double-buffer — the
    auto-sizer budgets ~6 MB for scores."""
    b, h, n, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    np_tok = _round_up(n, sub)
    if np_tok > _MAX_VMEM_TOKENS and not interpret:
        # score block would blow the VMEM scoped stack even at 1 head/cell
        if jax.default_backend() == "tpu":
            return flash_attention_blocked(q, k, v, scale=scale)
        return xla_attention(q, k, v, scale=scale)
    if np_tok != n:
        pad = [(0, 0), (0, 0), (0, np_tok - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if head_chunk is None:
        budget = 6 * 1024 * 1024
        head_chunk = max(1, min(h, budget // (np_tok * np_tok * 4)))
    hc = head_chunk
    while h % hc:
        hc -= 1
    kernel = functools.partial(_attn_kernel_heads, scale=scale, n_valid=n)
    spec = pl.BlockSpec((1, hc, np_tok, hd), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, np_tok, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n]


def _attn_kernel_blocked(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, scale: float, n_valid: int, block_k: int):
    """Online-softmax flash attention cell.

    Grid (B, H, Nq_blocks, Nk_blocks) — the k dimension is innermost, so this
    cell sees one (batch, head, q-block) with successive k-blocks and carries
    the running max / denominator / accumulator in VMEM scratch, finalizing
    on the last k step. Block shapes: q [1,1,Bq,hd], k/v [1,1,Bk,hd],
    o [1,1,Bq,hd].
    """
    kb = pl.program_id(3)
    nkb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # input-dtype operands, f32 accumulation, scale on the scores (see
    # _attn_kernel_full note)
    q = q_ref[0, 0]                                      # [Bq, hd]
    kblk = k_ref[0, 0]                                   # [Bk, hd]
    s = jax.lax.dot_general(
        q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, Bk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < n_valid, s, -jnp.inf)

    m_prev = m_ref[:]                                    # [Bq, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)                      # rescale old state
    p = jnp.exp(s - m_cur)                               # [Bq, Bk]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_cur
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, hd]
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(kb == nkb - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _auto_block(n: int, sub: int, target: int = 1024) -> int:
    """Pick a block size near ``target`` that minimizes sequence padding.

    Fixed power-of-two blocks waste real work at awkward lengths: the demo
    shape N=5330 pads to 6144 with 512-blocks (15% dead tiles), while a
    padding-aware 896-block pads to 5376 (0.9%). Measured 11.4 -> 7.3
    ms/layer at B2 x H24 x N5330 (v5e) from this choice alone — tile sizes
    between ~512 and ~2048 are otherwise within noise of each other.
    """
    import math

    n_blocks = max(1, math.ceil(n / target))
    return _round_up(math.ceil(n / n_blocks), sub)


def flash_attention_blocked(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    scale: Optional[float] = None, block_q: Optional[int] = None,
    block_k: Optional[int] = None, interpret: bool = False,
) -> jnp.ndarray:
    """k-blocked online-softmax flash attention for long sequences (the
    demo path's ~5.4k tokens): nothing larger than [Bq, Bk] ever
    materializes, in VMEM or HBM. Block sizes default to a padding-aware
    choice near 1024 (see ``_auto_block``)."""
    b, h, n, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    # When only one block size is overridden, mirror it rather than mixing it
    # with the auto choice — an explicit/auto mix pads the sequence to their
    # LCM, silently multiplying dead tiles.
    if block_q is None and block_k is not None:
        block_q = block_k
    if block_k is None and block_q is not None:
        block_k = block_q
    bq = min(block_q or _auto_block(n, sub), _round_up(n, sub))
    bk = min(block_k or _auto_block(n, sub), _round_up(n, sub))
    import math

    # padded length must tile exactly by BOTH block sizes
    np_tok = _round_up(n, bq * bk // math.gcd(bq, bk))
    if np_tok != n:
        pad = [(0, 0), (0, 0), (0, np_tok - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    grid = (b, h, np_tok // bq, np_tok // bk)
    kernel = functools.partial(
        _attn_kernel_blocked, scale=scale, n_valid=n, block_k=bk
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, hd), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, hd), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, hd), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, hd), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, np_tok, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running denominator
            pltpu.VMEM((bq, hd), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :n]


def xla_attention(q, k, v, *, scale: Optional[float] = None) -> jnp.ndarray:
    """Reference XLA path (identical math, materializes the score tensor)."""
    hd = q.shape[-1]
    scale = hd ** -0.5 if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
