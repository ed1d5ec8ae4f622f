"""Whole-ViT-block int8 Pallas kernel: BOTH residual halves in one launch.

quant='int8_full' runs each block as TWO kernels (fused attention half +
fused MLP half, attn_proj.py / fused_mlp.py). This kernel merges them:

    grid = (batch, nj + nc)   # nj attention head-chunks, nc MLP hidden-chunks
    j <  nj : LN1 -> int8 qkv chunk -> attention -> int8 proj rows -> acc1
    j == nj-1 epilogue: x2 = x + ls1*(acc1+bias); LN2(x2) -> quantize -> xq2
    j >= nj : int8 w12 chunk -> SwiGLU/GELU -> requantize -> int8 w3 rows -> acc2
    last j  : out = x2 + ls2*(acc2+bias)

What it saves vs the two-kernel path: the [B, N, D] x2 tensor never touches
HBM (one write+read per layer gone), and 31 of 62 kernel launches per batch
disappear (each launch pays DMA pipeline warmup/drain). Phase-inactive
weight BlockSpecs CLAMP their index (attn chunks pin to nj-1 during the MLP
phase, MLP chunks pin to 0 during attention) — consecutive identical blocks
are not re-fetched, so the merge adds no weight streaming.

Geometry constraints are the union of the two kernels' (lane-aligned hc*hd
and hidden chunks — attn_proj.int8_attn_geometry_ok, fused_mlp.
int8_mlp_geometry_ok).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anyloc_tpu.ops.common import round_up as _round_up
from anyloc_tpu.ops.pallas.attn_proj import _heads_attention, _pick_int8_head_chunk
from anyloc_tpu.ops.pallas.fused_mlp import _gelu_exact, _pick_hidden_chunk


def _q_rows(xn):
    amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) / 127.0
    return jnp.clip(jnp.round(xn / s), -127.0, 127.0).astype(jnp.int8), s


def _ln(xf, scale_row, bias_row, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale_row + bias_row


def _block_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, sbq_ref, sbk_ref, sbv_ref,
    wp_ref, sbp_ref, ln1_ref, g1_ref,
    w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
    w3_ref, s3_ref, b3_ref, ln2_ref, g2_ref,
    o_ref, xq_ref, xs_ref, acc_ref, x2_ref,
    *, scale: float, hd: int, eps: float, nj: int, swiglu: bool,
):
    j = pl.program_id(1)
    ntot = pl.num_programs(1)
    n = x_ref.shape[1]
    np_pad = xq_ref.shape[0]

    @pl.when(j == 0)
    def _():
        xn = _ln(x_ref[0].astype(jnp.float32), ln1_ref[0:1], ln1_ref[1:2], eps)
        if np_pad != n:
            xn = jnp.pad(xn, ((0, np_pad - n), (0, 0)))
        q, s = _q_rows(xn)
        xq_ref[:] = q
        xs_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def dot_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    @pl.when(j < nj)
    def _attn_phase():
        xq = xq_ref[:]
        xs = xs_ref[:]

        def dequant(w_ref, sb_ref):
            return dot_i8(xq, w_ref[:]) * xs * sb_ref[0:1] + sb_ref[1:2]

        q = dequant(wq_ref, sbq_ref) * scale
        k = dequant(wk_ref, sbk_ref)
        v = dequant(wv_ref, sbv_ref).astype(jnp.bfloat16)
        o_cat = _heads_attention(
            q, k, v, hd, True, n_valid=n, score_dtype=jnp.bfloat16
        ).astype(jnp.float32)
        oq, osc = _q_rows(o_cat)
        acc_ref[:] += dot_i8(oq, wp_ref[:]) * osc * sbp_ref[0:1]

    @pl.when(j == nj - 1)
    def _attn_epilogue():
        xf = x_ref[0].astype(jnp.float32)
        if np_pad != n:
            xf = jnp.pad(xf, ((0, np_pad - n), (0, 0)))
        x2 = xf + g1_ref[0:1] * (acc_ref[:] + sbp_ref[1:2])
        x2_ref[:] = x2
        xn = _ln(x2, ln2_ref[0:1], ln2_ref[1:2], eps)
        q, s = _q_rows(xn)
        xq_ref[:] = q
        xs_ref[:] = s
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j >= nj)
    def _mlp_phase():
        xq = xq_ref[:]
        xs = xs_ref[:]
        h1 = dot_i8(xq, w1_ref[:]) * xs * s1_ref[0:1] + b1_ref[0:1]
        if swiglu:
            h2 = dot_i8(xq, w2_ref[:]) * xs * s2_ref[0:1] + b2_ref[0:1]
            a = jax.nn.silu(h1) * h2
        else:
            a = _gelu_exact(h1)
        aq, asc = _q_rows(a)
        acc_ref[:] += dot_i8(aq, w3_ref[:]) * asc * s3_ref[0:1]

    @pl.when(j == ntot - 1)
    def _():
        out = x2_ref[:] + g2_ref[0:1] * (acc_ref[:] + b3_ref[0:1])
        o_ref[0] = out[:n].astype(o_ref.dtype)


def fused_block_int8(
    x: jnp.ndarray,
    attn_p: tuple,     # (wqkv_q, wqkv_scale, b_qkv|None, wp_q, wp_scale, b_proj|None)
    mlp_p: tuple,      # (w12_q, w12_scale, b12|None, w3_q, w3_scale, b3|None)
    *,
    num_heads: int,
    ln1: tuple, ln2: tuple,
    gamma1=None, gamma2=None,
    mlp_type: str = "swiglu_fused",
    ln_eps: float = 1e-6,
    head_chunk: Optional[int] = None,
    hidden_chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """out = Block(x) for a pre-norm int8 ViT block, ONE kernel."""
    b, n, d = x.shape
    h = num_heads
    hd = d // h
    wqkv_q, wqkv_s, b_qkv, wp_q, wp_s, b_proj = attn_p
    w12_q, w12_s, b12, w3_q, w3_s, b3 = mlp_p
    hid = w3_q.shape[0]
    swiglu = mlp_type == "swiglu_fused"
    scale = hd ** -0.5
    np_pad = _round_up(n, 8)
    if interpret:
        hc = h
        mc = hid
    else:
        hc = _pick_int8_head_chunk(n, h, hd, head_chunk)
        mc = _pick_hidden_chunk(hidden_chunk, hid, not swiglu)
        if hc is None or mc is None:
            raise ValueError(
                "fused_block_int8 geometry unsupported (lane alignment); "
                "gate with int8_attn_geometry_ok/int8_mlp_geometry_ok"
            )
    nj = h // hc
    nc = hid // mc
    hcw = hc * hd

    def pack2(scale_vec, bias_vec, width):
        s = jnp.asarray(scale_vec, jnp.float32).reshape(1, width)
        bz = (jnp.zeros((1, width), jnp.float32) if bias_vec is None
              else jnp.asarray(bias_vec, jnp.float32).reshape(1, width))
        return jnp.concatenate([s, bz], axis=0)

    sb_qkv = pack2(wqkv_s, b_qkv, 3 * d)
    sb_p = pack2(wp_s, b_proj, d)
    ln1_pack = jnp.stack([jnp.asarray(v, jnp.float32).reshape(d) for v in ln1])
    ln2_pack = jnp.stack([jnp.asarray(v, jnp.float32).reshape(d) for v in ln2])
    ones = jnp.ones((1, d), jnp.float32)
    g1 = ones if gamma1 is None else jnp.asarray(gamma1, jnp.float32).reshape(1, d)
    g2 = ones if gamma2 is None else jnp.asarray(gamma2, jnp.float32).reshape(1, d)
    two = 2 if swiglu else 1
    s12 = jnp.asarray(w12_s, jnp.float32).reshape(1, two * hid)
    b12v = (jnp.zeros((1, two * hid), jnp.float32) if b12 is None
            else jnp.asarray(b12, jnp.float32).reshape(1, two * hid))
    s3v = jnp.asarray(w3_s, jnp.float32).reshape(1, d)
    b3v = (jnp.zeros((1, d), jnp.float32) if b3 is None
           else jnp.asarray(b3, jnp.float32).reshape(1, d))

    # phase-clamped index maps: inactive-phase specs pin to a constant chunk
    # so consecutive identical blocks skip the DMA
    ja = lambda jj: jnp.minimum(jj, nj - 1)          # noqa: E731
    jm = lambda jj: jnp.maximum(jj - nj, 0)          # noqa: E731
    w_view = lambda off: pl.BlockSpec(                # noqa: E731
        (d, hcw), lambda i, jj, o=off: (0, ja(jj) + o), memory_space=pltpu.VMEM)
    sb_view = lambda off: pl.BlockSpec(               # noqa: E731
        (2, hcw), lambda i, jj, o=off: (0, ja(jj) + o), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((2, d), lambda i, jj: (0, 0), memory_space=pltpu.VMEM)
    row_d = pl.BlockSpec((1, d), lambda i, jj: (0, 0), memory_space=pltpu.VMEM)
    w12_view = lambda off: pl.BlockSpec(              # noqa: E731
        (d, mc), lambda i, jj, o=off: (0, jm(jj) + o), memory_space=pltpu.VMEM)
    v12_view = lambda off: pl.BlockSpec(              # noqa: E731
        (1, mc), lambda i, jj, o=off: (0, jm(jj) + o), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n, d), lambda i, jj: (i, 0, 0), memory_space=pltpu.VMEM),
        w_view(0), w_view(nj), w_view(2 * nj),
        sb_view(0), sb_view(nj), sb_view(2 * nj),
        pl.BlockSpec((hcw, d), lambda i, jj: (ja(jj), 0), memory_space=pltpu.VMEM),
        vec_d, vec_d, row_d,
        w12_view(0), w12_view(nc if swiglu else 0),
        v12_view(0), v12_view(nc if swiglu else 0),
        v12_view(0), v12_view(nc if swiglu else 0),
        pl.BlockSpec((mc, d), lambda i, jj: (jm(jj), 0), memory_space=pltpu.VMEM),
        row_d, row_d, vec_d, row_d,
    ]
    in_args = [
        x, wqkv_q, wqkv_q, wqkv_q, sb_qkv, sb_qkv, sb_qkv, wp_q, sb_p,
        ln1_pack, g1,
        w12_q, w12_q, s12, s12, b12v, b12v, w3_q, s3v, b3v, ln2_pack, g2,
    ]
    kernel = functools.partial(
        _block_kernel, scale=scale, hd=hd, eps=ln_eps, nj=nj, swiglu=swiglu,
    )
    esz = 2 if x.dtype == jnp.bfloat16 else 4
    vmem = (
        2 * np_pad * d * esz              # x block
        + 2 * (3 * d * hcw + hcw * d)     # attn weight chunks (int8, 2buf)
        + 2 * (two * d * mc + mc * d)     # mlp weight chunks
        + np_pad * d * (1 + 4 + 4)        # xq + acc + x2 scratch
        + 2 * np_pad * d * esz            # out block
        + hc * np_pad * np_pad * 4        # staged f32 scores
        + 4 * np_pad * hcw * 4            # q/k/v/o_cat live
        + 3 * np_pad * mc * 4             # mlp intermediates
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nj + nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, n, d), lambda i, jj: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((np_pad, d), jnp.int8),
            pltpu.VMEM((np_pad, 1), jnp.float32),
            pltpu.VMEM((np_pad, d), jnp.float32),
            pltpu.VMEM((np_pad, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.4) + (2 << 20), 120 << 20)
        ),
        interpret=interpret,
    )(*in_args)


# MEASURED NEGATIVE at the flagship shapes (tools/bench_fused_block.py, v5e,
# 31-layer in-jit stacks): two-kernel 2.062 vs merged 2.310 ms/block at
# N=257 (0.89x) and 3.796 vs 3.865 at N=485 (0.98x). The saved [B, N, D]
# HBM round-trip (~0.11 ms/layer) and 31 launches are outweighed by the
# merged cell's VMEM working set (both phases' weight chunks + scores + MLP
# intermediates + 3 f32 scratches) constraining Mosaic's double-buffering —
# the same failure mode as the bf16 fused twins (docs/PERFORMANCE.md).
# NOT wired into the trunk; retained (correctness-tested, TPU-lane-covered)
# for re-evaluation on chips with more VMEM.
