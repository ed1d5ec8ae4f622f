"""Fused attention + output-projection Pallas kernel.

The flagship trunk's residual attention cost (~35 ms/batch-32 after XLA's
partial overlap, docs/PERFORMANCE.md) is VPU-bound softmax sitting on the
critical path between two MXU matmuls. This kernel gives the Mosaic
scheduler *independent* MXU work to dual-issue against the softmax:

  * the output projection W_O is folded into the kernel as per-head-chunk
    [hc*hd, D] matmul accumulation — o_h @ W_O[h] for already-softmaxed
    heads runs on the MXU while later heads' scores are still being
    softmaxed on the VPU;
  * heads inside a cell are processed in a software-pipelined (skewed)
    loop: scores(h) [MXU] || softmax(h-1) [VPU] || o(h-1)@W_O [MXU];
  * the [B, H, N, hd] attention output never round-trips HBM — the kernel
    writes the projected [B, N, D] directly.

Grid: (batch, head-chunks), head-chunk innermost; the projected output
accumulates in an f32 VMEM scratch across head-chunk cells and is written
once on the last chunk.

Reference equivalence: softmax(q k^T / sqrt(hd)) v per head, concat heads,
@ W_proj — i.e. torch ``attn`` + ``proj`` of a ViT block
(utilities.py:219-288 trunk internals). Bias and LayerScale stay outside
(XLA fuses them into the residual add).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anyloc_tpu.ops.common import round_up as _round_up

# Beyond this many (padded) tokens the f32 score block cannot fit VMEM even
# at one head per cell — callers should use the k-blocked kernel + XLA proj.
MAX_FUSED_TOKENS = 1216


def _softmax_masked(s: jnp.ndarray, n_valid: int) -> jnp.ndarray:
    """Row softmax over the last axis with key-padding masked out."""
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _skewed_pipeline(count, scores_fn, pv_fn, skew):
    """The ONE software-pipelining driver shared by every head loop in
    this module: with ``skew``, scores(i) [MXU] is issued before item
    i-1's softmax [VPU] / PV [MXU], giving the Mosaic scheduler
    independent work to dual-issue; without it, items run sequentially.
    Returns the list of pv outputs in item order."""
    if skew:
        outs = []
        prev = scores_fn(0)
        for i in range(1, count):
            cur = scores_fn(i)
            outs.append(pv_fn(i - 1, prev))
            prev = cur
        outs.append(pv_fn(count - 1, prev))
        return outs
    return [pv_fn(i, scores_fn(i)) for i in range(count)]


def _heads_attention_packed(q, k, v, hd: int, skew: bool, nv: int,
                            score_dtype):
    """M-packed head pairs: heads (2p, 2p+1) share ONE scores dot and ONE
    PV dot (round-4 verdict item 9).

    Per-head dots at the 224-px serving shape pad M=N to the 128-row MXU
    tile (272 -> 384: 29% dead rows). Stacking a pair's Q rows block-
    diagonally on the contraction axis ([2N, 2hd] with zeros in the other
    head's columns) against the pair's contiguous key slab [N, 2hd] yields
    both heads' score matrices as ROW BLOCKS of one [2N, N] dot — 640
    padded rows instead of 768, and the QK^T contraction runs at the full
    128 systolic depth instead of 64. Row-wise softmax is unchanged on the
    stacked layout (each row belongs to exactly one head). PV packs the
    same way ([2N, N] @ [N, 2hd]); each row block only needs its own
    head's output columns, selected by a lane mask. Results are EXACT —
    the zero blocks kill cross-head terms, no score masking needed.
    """
    n = q.shape[0]
    n_pairs = q.shape[-1] // hd // 2
    zq = jnp.zeros((n, hd), score_dtype)

    def pair_scores(p):
        q2 = q[:, 2 * p * hd : (2 * p + 2) * hd].astype(score_dtype)
        qp = jnp.concatenate([
            jnp.concatenate([q2[:, :hd], zq], 1),
            jnp.concatenate([zq, q2[:, hd:]], 1)], 0)       # [2N, 2hd]
        k2 = k[:, 2 * p * hd : (2 * p + 2) * hd].astype(score_dtype)
        return jax.lax.dot_general(
            qp, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # [2N, N]

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 2 * hd), 1)

    def pair_pv(p, s):
        prob = _softmax_masked(s, nv)       # rows: head 2p then head 2p+1
        v2 = v[:, 2 * p * hd : (2 * p + 2) * hd]
        out = jnp.dot(prob.astype(v.dtype), v2,
                      preferred_element_type=jnp.float32)   # [2N, 2hd]
        return jnp.where(lane < hd, out[:n], out[n:]).astype(v.dtype)

    outs = _skewed_pipeline(n_pairs, pair_scores, pair_pv, skew)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _heads_attention(q, k, v, hd: int, skew: bool, n_valid=None,
                     score_dtype=jnp.float32, pack_pairs=False):
    """Per-head scores -> softmax -> PV over column-concatenated heads.

    q [N, hc*hd] f32 (already scaled), k [N, hc*hd] f32, v [N, hc*hd]
    (bf16 or f32) -> o_cat [N, hc*hd] in v.dtype. ``skew=True`` software-
    pipelines the loop: scores(h) [MXU] issues before head h-1's
    softmax [VPU] / PV [MXU], giving the scheduler independent work to
    dual-issue. ``n_valid`` masks padded key columns (batch-tiled cells
    pad each image's rows to a sublane multiple). Shared by the int8 /
    bf16 / qkv-view kernels.

    ``score_dtype``: operand dtype of the QK^T dot (accumulation is always
    f32). An f32 operand matmul costs multiple MXU passes; bf16 operands
    run at the native rate. Callers pass their *input* dtype (bf16 trunks
    score in bf16, f32 inputs keep f32 math); the int8 kernel passes bf16
    explicitly — its operands already carry ~1% quantization error.
    """
    hc = q.shape[-1] // hd
    nv = q.shape[0] if n_valid is None else n_valid
    if pack_pairs and hc % 2 == 0:
        return _heads_attention_packed(q, k, v, hd, skew, nv, score_dtype)

    def head_scores(h):
        return jax.lax.dot_general(
            q[:, h * hd : (h + 1) * hd].astype(score_dtype),
            k[:, h * hd : (h + 1) * hd].astype(score_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                                   # [N, N]

    def head_pv(h, s):
        p = _softmax_masked(s, nv)
        return jnp.dot(
            p.astype(v.dtype), v[:, h * hd : (h + 1) * hd],
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)                                   # [N, hd]

    outs = _skewed_pipeline(hc, head_scores, head_pv, skew)
    return jnp.concatenate(outs, axis=1)                    # [N, hc*hd]


def _pick_int8_head_chunk(n: int, h: int, hd: int, requested):
    """Head chunk for the int8 half kernel. Its weight-column BlockSpecs
    are (D, hc*hd) views of the qkv matrix, so hc*hd must be a multiple of
    128 lanes — the SAME constraint the bf16/qkv-view kernels' hc*hd-wide
    blocks carry (they route through _lane_valid_head_chunk for it; only
    attention_proj's 4-D per-head blocks end in the bare ``hd``). Returns
    None when no divisor of ``h`` qualifies (tiny test models); callers
    fall back to the XLA-equivalent int8 path."""
    budget = _pick_head_chunk(n, h, requested)
    for hc in range(budget, 0, -1):
        if h % hc == 0 and (hc * hd) % 128 == 0:
            return hc
    for hc in range(budget + 1, h + 1):  # aligned but over-budget beats none
        if h % hc == 0 and (hc * hd) % 128 == 0:
            return hc
    return None


def attn_geometry_ok(num_heads: int, head_dim: int) -> bool:
    """True iff the fused attention kernels can lower for this head
    geometry: some head chunk hc must divide num_heads with hc*head_dim a
    multiple of 128 lanes (Mosaic last-dim block constraint).  Gate EVERY
    fused-attention route with this — interpret-mode CPU tests do not catch
    lane-alignment failures (they only surface on real Mosaic lowering)."""
    return any(
        num_heads % hc == 0 and (hc * head_dim) % 128 == 0
        for hc in range(1, num_heads + 1)
    )


# the int8 kernel has the same lane constraint
int8_attn_geometry_ok = attn_geometry_ok


def _lane_valid_head_chunk(h: int, hd: int, hc: int,
                           strict: bool = True) -> int:
    """Largest lane-valid divisor of ``h`` not above ``hc`` (else the
    smallest valid one). With ``strict`` (real Mosaic lowering) raises the
    same clear error as the int8 twin when no divisor qualifies — silently
    returning an unaligned chunk would surface as an opaque Mosaic
    lane-alignment failure at compile time. Interpret mode has no lane
    constraint and passes ``strict=False``."""
    if (hc * hd) % 128 == 0:
        return hc
    valid = [c for c in range(1, h + 1) if h % c == 0 and (c * hd) % 128 == 0]
    if not valid:
        if strict:
            raise ValueError(
                f"no head chunk with hc*head_dim % 128 == 0 exists for "
                f"num_heads={h}, head_dim={hd}; gate with "
                "attn_geometry_ok() and use the XLA attention path")
        return hc
    below = [c for c in valid if c <= hc]
    return max(below) if below else min(valid)


def _pick_head_chunk(n: int, h: int, requested, sublane: int = 8) -> int:
    """Heads per grid cell under a ~6 MB f32 score-block VMEM budget,
    rounded down to a divisor of ``h`` (shared by the fused-half,
    qkv-view and per-head wrappers; ``sublane`` is the caller's token
    padding granularity — 16 for bf16 operands)."""
    if requested is not None and requested < 1:
        raise ValueError(f"head_chunk must be >= 1, got {requested}")
    if requested is None:
        budget = 6 * 1024 * 1024
        np_tok = _round_up(n, sublane)
        requested = max(1, min(h, budget // (np_tok * np_tok * 4)))
    hc = min(requested, h)
    while h % hc:
        hc -= 1
    return hc


def _attn_proj_kernel(
    q_ref, k_ref, v_ref, wp_ref, o_ref, acc_ref,
    *, scale: float, n_valid: int, skew: bool,
):
    """One (batch, head-chunk) cell.

    Block shapes: q/k/v [1, hc, Np, hd]; wp [hc*hd, D]; o [1, Np, D];
    acc scratch [Np, D] f32 persists across the innermost (head-chunk) grid
    dimension.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hc, np_tok, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    def head_scores(h):
        # input-dtype operands (bf16 runs the MXU at native rate; an f32-
        # operand dot costs multiple passes), f32 accumulation, scale folded
        # into q in f32 before the one rounding cast
        q = (q_ref[0, h].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0, h]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                   # [Np, Np]

    def head_pv(h, s):
        p = _softmax_masked(s, n_valid)                     # VPU
        return jnp.dot(
            p.astype(v_ref.dtype), v_ref[0, h], preferred_element_type=jnp.float32
        ).astype(v_ref.dtype)                               # [Np, hd] MXU

    outs = _skewed_pipeline(hc, head_scores, head_pv, skew)
    # One projection matmul per cell over the concatenated head outputs:
    # [Np, hc*hd] @ [hc*hd, D] — K = hc*hd keeps the MXU fed (per-head
    # K=64 proj matmuls measured ~7% slower end-to-end).
    o_cat = jnp.concatenate(outs, axis=1)
    acc_ref[:] += jnp.dot(
        o_cat, wp_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _attn_qkv_proj_kernel(
    q_ref, k_ref, v_ref, wp_ref, *rest,
    scale: float, hd: int, skew: bool,
    has_bias: bool, has_gamma: bool, has_res: bool,
):
    """One (batch, head-chunk) cell over raw fused-qkv views.

    q/k/v refs are [1, N, hc*hd] column views of the SAME [B, N, 3D] qkv
    tensor (BlockSpec index maps offset by 0 / H / 2H chunk positions) —
    the head split is a free lane slice, so none of the XLA path's six
    split/reshape/transpose relayout copies exist. Output accumulates the
    projected result and finishes with bias/LayerScale/residual.
    """
    refs = list(rest)
    b_ref = refs.pop(0) if has_bias else None
    g_ref = refs.pop(0) if has_gamma else None
    x_ref = refs.pop(0) if has_res else None
    o_ref, acc_ref = refs

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    o_cat = _heads_attention(
        q_ref[0].astype(jnp.float32) * scale,
        k_ref[0],
        v_ref[0], hd, skew, score_dtype=q_ref.dtype,
    )                                                       # [N, hc*hd]
    acc_ref[:] += jnp.dot(
        o_cat, wp_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        out = acc_ref[:]
        if b_ref is not None:
            out = out + b_ref[:]
        if g_ref is not None:
            out = out * g_ref[:]
        if x_ref is not None:
            out = out + x_ref[0].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


def flash_attention_qkv_proj(
    qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    layerscale: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    head_chunk: Optional[int] = None,
    skew: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention + out-projection from the raw fused qkv tensor.

    qkv: [B, N, 3D] (the facet-source layout, reference utilities.py:274 —
    columns [0:D]=q, [D:2D]=k, [2D:3D]=v, head-minor within each);
    w_proj [D, D]. Optional epilogue: + b_proj, * layerscale gamma,
    + residual [B, N, D]. Returns [B, N, D] — the full attention half of a
    pre-norm ViT block in one kernel, with NO head transposes in HBM.
    """
    b, n, three_d = qkv.shape
    d = three_d // 3
    h = num_heads
    hd = d // h
    d_out = w_proj.shape[1]
    scale = hd ** -0.5 if scale is None else scale
    hc = _lane_valid_head_chunk(h, hd, _pick_head_chunk(n, h, head_chunk),
                                strict=not interpret)
    nj = h // hc

    qkv_view = lambda off: pl.BlockSpec(  # noqa: E731
        (1, n, hc * hd), lambda i, j, o=off: (i, 0, j + o), memory_space=pltpu.VMEM
    )
    in_specs = [qkv_view(0), qkv_view(nj), qkv_view(2 * nj)]
    in_args = [qkv, qkv, qkv]
    in_specs.append(
        pl.BlockSpec((hc * hd, d_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    )
    in_args.append(w_proj)
    vec_spec = pl.BlockSpec((1, d_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    if b_proj is not None:
        in_specs.append(vec_spec)
        in_args.append(jnp.asarray(b_proj, jnp.float32).reshape(1, d_out))
    if layerscale is not None:
        in_specs.append(vec_spec)
        in_args.append(jnp.asarray(layerscale, jnp.float32).reshape(1, d_out))
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, n, d_out), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        in_args.append(residual)

    esz = 2 if qkv.dtype == jnp.bfloat16 else 4
    np_pad = _round_up(n, 16)
    vmem = (
        3 * 2 * hc * hd * np_pad * esz
        # Mosaic may keep ALL hc per-head score blocks staged within a
        # cell (not just the 2 the skew keeps logically live) — budget
        # them all, like the fused-half twins
        + hc * np_pad * np_pad * 4
        + 2 * hc * hd * d_out * esz
        + 2 * np_pad * d_out * (esz + 4)
        + np_pad * d_out * 4
    )
    kernel = functools.partial(
        _attn_qkv_proj_kernel,
        scale=scale, hd=hd, skew=skew,
        has_bias=b_proj is not None,
        has_gamma=layerscale is not None,
        has_res=residual is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n, d_out), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d_out), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n, d_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.5) + (2 << 20), 110 << 20)
        ),
        interpret=interpret,
    )(*in_args)


def _attn_half_int8_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, sbq_ref, sbk_ref, sbv_ref,
    wp_ref, sbp_ref, ln_ref, *rest,
    scale: float, hd: int, skew: bool, eps: float, has_gamma: bool,
    pack_pairs: bool = False,
):
    """One (batch, head-chunk) cell of the int8 attention half.

    The entire pre-norm attention half runs in-kernel: LayerNorm ->
    per-token int8 quantize -> int8 qkv matmul (this chunk's head columns,
    three int8 views of the same [D, 3D] weight) -> dequant -> per-head
    attention -> requantize -> int8 out-projection rows -> accumulate; the
    last chunk adds bias, LayerScale and the residual. The quantized input
    and the f32 output accumulator persist in VMEM scratch across chunks.
    """
    refs = list(rest)
    g_ref = refs.pop(0) if has_gamma else None
    o_ref, xq_ref, xs_ref, acc_ref = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    bt, n = x_ref.shape[0], x_ref.shape[1]
    np_pad = xq_ref.shape[0] // bt   # per-image rows, sublane-aligned

    @pl.when(j == 0)
    def _():
        # per image: LN -> per-token int8 quantize into its aligned row
        # stripe of the [bt*np_pad, D] scratch (padded rows zeroed)
        for i in range(bt):
            xf = x_ref[i].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = (xf - mean) * jax.lax.rsqrt(var + eps)
            xn = xn * ln_ref[0:1] + ln_ref[1:2]
            if np_pad != n:
                xn = jnp.pad(xn, ((0, np_pad - n), (0, 0)))
            amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
            s = jnp.maximum(amax, 1e-6) / 127.0
            xq_ref[i * np_pad : (i + 1) * np_pad] = jnp.clip(
                jnp.round(xn / s), -127.0, 127.0
            ).astype(jnp.int8)
            xs_ref[i * np_pad : (i + 1) * np_pad] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]
    xs = xs_ref[:]

    def dot_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    def dequant(w_ref, sb_ref):
        # [bt*np_pad, hc*hd] f32 = (xq @ wq) * row_scale * col_scale + bias
        return dot_i8(xq, w_ref[:]) * xs * sb_ref[0:1] + sb_ref[1:2]

    q = dequant(wq_ref, sbq_ref) * scale
    k = dequant(wk_ref, sbk_ref)
    v = dequant(wv_ref, sbv_ref).astype(jnp.bfloat16)
    # attention per image over its aligned row stripe; padded key columns
    # masked (their dequant rows carry the bias vector, not zeros)
    o_parts = [
        _heads_attention(
            q[i * np_pad : (i + 1) * np_pad],
            k[i * np_pad : (i + 1) * np_pad],
            v[i * np_pad : (i + 1) * np_pad],
            hd, skew, n_valid=n, score_dtype=jnp.bfloat16,
            pack_pairs=pack_pairs,
        ).astype(jnp.float32)
        for i in range(bt)
    ]
    o_cat = o_parts[0] if bt == 1 else jnp.concatenate(o_parts, axis=0)
    amax = jnp.max(jnp.abs(o_cat), axis=-1, keepdims=True)
    osc = jnp.maximum(amax, 1e-6) / 127.0
    oq = jnp.clip(jnp.round(o_cat / osc), -127.0, 127.0).astype(jnp.int8)
    acc_ref[:] += dot_i8(oq, wp_ref[:]) * osc * sbp_ref[0:1]

    @pl.when(j == nj - 1)
    def _():
        for i in range(bt):
            out = acc_ref[i * np_pad : i * np_pad + n] + sbp_ref[1:2]
            if g_ref is not None:
                out = out * g_ref[:]
            out = out + x_ref[i].astype(jnp.float32)
            o_ref[i] = out.astype(o_ref.dtype)


def fused_attn_half_int8(
    x: jnp.ndarray,
    wqkv_q: jnp.ndarray,
    wqkv_scale: jnp.ndarray,
    b_qkv: Optional[jnp.ndarray],
    wp_q: jnp.ndarray,
    wp_scale: jnp.ndarray,
    b_proj: Optional[jnp.ndarray],
    *,
    num_heads: int,
    ln_params: tuple,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    head_chunk: Optional[int] = None,
    batch_tile: int = 1,
    skew: bool = True,
    pack_pairs: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """The whole pre-norm attention half with int8 W8A8 matmuls, one kernel.

    out = x + ls1 * (proj(attn(qkv(LN1(x)))) + b_proj)   — i.e. the first
    residual branch of a ViT block (reference trunk internals hooked at
    utilities.py:219-288), with the qkv [D, 3D] and proj [D, D] matmuls on
    the int8 MXU path (2x bf16 rate on v5e). Weights are static per-column
    int8 (ops/quant.py layout: ``kernel_q`` + ``kernel_scale``); activations
    quantize per-token in-kernel, so no quantize/dequantize chain ever
    touches HBM — the XLA-level int8 path loses its entire gain to exactly
    those fusion boundaries (docs/PERFORMANCE.md).

    x [B, N, D]; wqkv_q int8 [D, 3D] (q|k|v column thirds, head-minor —
    the reference's fused-qkv layout); wp_q int8 [D, D];
    ln_params = (ln_scale, ln_bias) of norm1. ``batch_tile`` processes that
    many images per grid cell (amortizes per-cell weight streaming by bt
    and raises the qkv/proj matmul M from N to bt*N; each image's rows pad
    to a sublane multiple inside the scratch).
    """
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    assert wqkv_q.shape == (d, 3 * d), wqkv_q.shape
    assert wp_q.shape == (d, d), wp_q.shape
    scale = hd ** -0.5 if scale is None else scale
    assert batch_tile >= 1, f"batch_tile must be >= 1, got {batch_tile}"
    bt = batch_tile
    while b % bt:  # largest divisor of b not exceeding the request
        bt -= 1
    if bt != batch_tile:
        import warnings

        warnings.warn(
            f"batch_tile={batch_tile} does not divide batch {b}; "
            f"using batch_tile={bt}",
            stacklevel=2,
        )
    np_pad = _round_up(n, 8)
    if interpret:
        # interpret mode has no Mosaic lane-alignment constraint (CPU tests
        # exercise tiny geometries)
        hc = _pick_head_chunk(n, h, head_chunk)
    else:
        hc = _pick_int8_head_chunk(n, h, hd, head_chunk)
    if hc is None:
        raise ValueError(
            f"fused_attn_half_int8 needs a head chunk with hc*head_dim % 128"
            f" == 0; no divisor of num_heads={h} qualifies at head_dim={hd}."
            " Gate with int8_attn_geometry_ok() and use the XLA int8 path."
        )
    if pack_pairs and hc % 2:
        import warnings

        warnings.warn(
            f"pack_pairs requested but the resolved head chunk ({hc}) is "
            "odd — pairs cannot form and the unpacked path runs (an A/B "
            "with this flag would compare identical computations)",
            stacklevel=2,
        )
    nj = h // hc
    hcw = hc * hd

    def pack2(scale_vec, bias_vec, width):
        s = jnp.asarray(scale_vec, jnp.float32).reshape(1, width)
        bz = (
            jnp.zeros((1, width), jnp.float32)
            if bias_vec is None
            else jnp.asarray(bias_vec, jnp.float32).reshape(1, width)
        )
        return jnp.concatenate([s, bz], axis=0)             # [2, width]

    sb_qkv = pack2(wqkv_scale, b_qkv, 3 * d)
    sb_p = pack2(wp_scale, b_proj, d)
    ln_pack = jnp.stack(
        [jnp.asarray(p, jnp.float32).reshape(d) for p in ln_params]
    )

    w_view = lambda off: pl.BlockSpec(  # noqa: E731
        (d, hcw), lambda i, j, o=off: (0, j + o), memory_space=pltpu.VMEM
    )
    sb_view = lambda off: pl.BlockSpec(  # noqa: E731
        (2, hcw), lambda i, j, o=off: (0, j + o), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec((bt, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        w_view(0), w_view(nj), w_view(2 * nj),
        sb_view(0), sb_view(nj), sb_view(2 * nj),
        pl.BlockSpec((hcw, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    in_args = [x, wqkv_q, wqkv_q, wqkv_q, sb_qkv, sb_qkv, sb_qkv, wp_q, sb_p, ln_pack]
    if layerscale is not None:
        in_specs.append(
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        in_args.append(jnp.asarray(layerscale, jnp.float32).reshape(1, d))

    esz = 2 if x.dtype == jnp.bfloat16 else 4
    rows = bt * np_pad
    vmem = (
        2 * rows * d * esz                   # x block (double-buffered)
        + 2 * 3 * d * hcw                    # qkv weight chunks int8
        + 2 * hcw * d                        # proj weight chunk int8
        + rows * d * (1 + 4)                 # xq + acc scratch
        + 2 * rows * d * esz                 # out block
        + bt * hc * np_pad * np_pad * 4      # staged f32 scores (all bt
        # images' stripes can be staged within a cell)
        + 4 * rows * hcw * 4                 # q/k/v/o_cat f32 live
    )
    kernel = functools.partial(
        _attn_half_int8_kernel,
        scale=scale, hd=hd, skew=skew, eps=ln_eps,
        has_gamma=layerscale is not None, pack_pairs=pack_pairs,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bt, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * np_pad, d), jnp.int8),
            pltpu.VMEM((bt * np_pad, 1), jnp.float32),
            pltpu.VMEM((bt * np_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.4) + (2 << 20), 110 << 20)
        ),
        interpret=interpret,
    )(*in_args)


def _attn_half_bf16_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wp_ref, bp_ref, ln_ref, *rest,
    scale: float, hd: int, skew: bool, eps: float, has_gamma: bool,
):
    """bf16 twin of ``_attn_half_int8_kernel``: the whole pre-norm attention
    half in one kernel with bf16 weights — removes the [B, N, 3D] qkv HBM
    round-trip (~150 MB/block at the flagship shape) and the LN boundary
    that the split XLA-qkv + attn-kernel path pays."""
    refs = list(rest)
    g_ref = refs.pop(0) if has_gamma else None
    o_ref, xn_ref, acc_ref = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + eps)
        xn_ref[:] = (xn * ln_ref[0:1] + ln_ref[1:2]).astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]

    def project(w_ref, b_ref):
        return (
            jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )                                                   # [N, hc*hd] f32

    q = project(wq_ref, bq_ref) * scale
    k = project(wk_ref, bk_ref)
    # PV dtype follows the ACTIVATION dtype: bf16 trunks take the fast
    # path, f32 callers keep f32 accuracy throughout (a hard bf16 cast
    # here would silently degrade an all-f32 call, unlike the
    # flash_attention_qkv_proj contract)
    v = project(wv_ref, bv_ref).astype(x_ref.dtype)
    o_cat = _heads_attention(
        q, k, v, hd, skew, score_dtype=x_ref.dtype
    )                                                       # [N, hc*hd]
    acc_ref[:] += jnp.dot(o_cat, wp_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        out = acc_ref[:] + bp_ref[:]
        if g_ref is not None:
            out = out * g_ref[:]
        out = out + x_ref[0].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


def fused_attn_half_bf16(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    b_qkv: Optional[jnp.ndarray],
    wp: jnp.ndarray,
    b_proj: Optional[jnp.ndarray],
    *,
    num_heads: int,
    ln_params: tuple,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    head_chunk: Optional[int] = None,
    skew: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = x + ls1 * (proj(attn(qkv(LN1(x)))) + b_proj), bf16 weights.

    Same dataflow as ``fused_attn_half_int8`` without quantization: the
    normalized activations persist in VMEM scratch across head chunks; the
    qkv tensor never exists in HBM. wqkv [D, 3D] (q|k|v column thirds),
    wp [D, D].

    MEASURED NEGATIVE at the flagship shape (B32 N257 D1536): 2.12 vs 1.59
    ms/layer for the split XLA-qkv + ``flash_attention_qkv_proj`` path —
    the per-image in-kernel qkv matmul (M=257) loses to XLA's batched
    M=8224 one, and bf16 weights double the per-cell streaming
    (tools/bench_attn_half_bf16.py, docs/PERFORMANCE.md). NOT wired into
    the trunk; retained for re-evaluation at other shapes. The int8 twin
    wins because it additionally removes XLA quantize-chain boundaries.
    """
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    assert wqkv.shape == (d, 3 * d), wqkv.shape
    assert wp.shape == (d, d), wp.shape
    scale = hd ** -0.5 if scale is None else scale
    hc = _lane_valid_head_chunk(h, hd, _pick_head_chunk(n, h, head_chunk),
                                strict=not interpret)
    nj = h // hc
    hcw = hc * hd

    def vec(v_, width):
        return (
            jnp.zeros((1, width), jnp.float32)
            if v_ is None
            else jnp.asarray(v_, jnp.float32).reshape(1, width)
        )

    b_qkv_v = vec(b_qkv, 3 * d)
    b_p_v = vec(b_proj, d)
    ln_pack = jnp.stack(
        [jnp.asarray(p_, jnp.float32).reshape(d) for p_ in ln_params]
    )

    w_view = lambda off: pl.BlockSpec(  # noqa: E731
        (d, hcw), lambda i, j, o=off: (0, j + o), memory_space=pltpu.VMEM
    )
    bvec_view = lambda off: pl.BlockSpec(  # noqa: E731
        (1, hcw), lambda i, j, o=off: (0, j + o), memory_space=pltpu.VMEM
    )
    x_spec = pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        w_view(0), w_view(nj), w_view(2 * nj),
        bvec_view(0), bvec_view(nj), bvec_view(2 * nj),
        pl.BlockSpec((hcw, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    in_args = [x, wqkv, wqkv, wqkv, b_qkv_v, b_qkv_v, b_qkv_v, wp, b_p_v, ln_pack]
    if layerscale is not None:
        in_specs.append(
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        in_args.append(jnp.asarray(layerscale, jnp.float32).reshape(1, d))

    esz = 2 if x.dtype == jnp.bfloat16 else 4
    wsz = 2 if wqkv.dtype == jnp.bfloat16 else 4
    np_pad = _round_up(n, 16)
    vmem = (
        2 * np_pad * d * esz                 # x block
        + 2 * 3 * d * hcw * wsz              # qkv weight chunks
        + 2 * hcw * d * wsz                  # proj weight chunk
        + np_pad * d * (esz + 4)             # xn + acc scratch
        + 2 * np_pad * d * esz               # out block
        + hc * np_pad * np_pad * 4           # staged f32 scores
        + 4 * np_pad * hcw * 4               # q/k/v/o_cat live
    )
    kernel = functools.partial(
        _attn_half_bf16_kernel,
        scale=scale, hd=hd, skew=skew, eps=ln_eps,
        has_gamma=layerscale is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, d), x.dtype),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.4) + (2 << 20), 110 << 20)
        ),
        interpret=interpret,
    )(*in_args)


def attention_proj(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    w_proj: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    head_chunk: Optional[int] = None,
    skew: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v per head, heads concatenated, @ w_proj.

    q/k/v: [B, H, N, hd]; w_proj: [H*hd, D_out] -> [B, N, D_out].
    Padded key columns are masked; padded query rows are sliced off.
    """
    b, h, n, hd = q.shape
    d_out = w_proj.shape[1]
    assert w_proj.shape[0] == h * hd, (w_proj.shape, h, hd)
    scale = hd ** -0.5 if scale is None else scale
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    np_tok = _round_up(n, sub)
    if np_tok != n:
        pad = [(0, 0), (0, 0), (0, np_tok - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    # skewed keeps ~2 score blocks logically live, but Mosaic may keep
    # the chunk staged — _pick_head_chunk budgets the full chunk
    hc = _pick_head_chunk(n, h, head_chunk, sublane=sub)
    # scoped-VMEM requirement: staged scores + double-buffered qkv/wp blocks
    # + out block + the f32 accumulator. Mosaic's default scoped limit is
    # 16 MB; the chip has far more VMEM — raise the limit with headroom.
    esz = 2 if q.dtype == jnp.bfloat16 else 4
    vmem_bytes = (
        hc * np_tok * np_tok * 4
        + 2 * 3 * hc * np_tok * hd * esz
        + 2 * hc * hd * d_out * esz
        + np_tok * d_out * esz
        + np_tok * d_out * 4
    )
    vmem_limit = min(int(vmem_bytes * 1.5) + (2 << 20), 100 << 20)

    # w_proj laid out per-head rows: [H*hd, D]; chunk j uses rows
    # [j*hc*hd, (j+1)*hc*hd).
    kernel = functools.partial(
        _attn_proj_kernel, scale=scale, n_valid=n, skew=skew
    )
    qkv_spec = pl.BlockSpec(
        (1, hc, np_tok, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hc),
        in_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec(
                (hc * hd, d_out), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, np_tok, d_out), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, np_tok, d_out), q.dtype),
        scratch_shapes=[pltpu.VMEM((np_tok, d_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(q, k, v, w_proj)
    return out[:, :n]
