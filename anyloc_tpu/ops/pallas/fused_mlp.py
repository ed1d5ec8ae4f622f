"""Fused int8 MLP Pallas kernel (SwiGLU and GELU variants).

Why: XLA runs the clean int8 matmul stack 1.24-1.33x faster than bf16, but
in the real ViT block it loses the entire win to fusion boundaries around
the quantize/dequantize chains (docs/PERFORMANCE.md, corrected cost model).
This kernel owns the whole MLP dataflow so nothing leaks to HBM:

    quantize(x) -> [x_q @ W1 | x_q @ W2] (int8 MXU) -> SwiGLU ->
    requantize -> g_q @ W3 (int8 MXU) -> + bias

Grid: (M-tiles, hidden-chunks), hidden innermost. Per-chunk dataflow keeps
only a [Mt, HC] slice of the hidden activations alive; the quantized input
x_q and the f32 output accumulator persist in VMEM scratch across the
hidden chunks of one M-tile. Weights stream through VMEM once per M-tile
(HBM cost: M_tiles x |W|, ~0.1 ms/layer at the flagship shape).

Quantization semantics match ops/quant.py: dynamic symmetric per-row int8
activations, static per-column int8 weights. The hidden requantization is
per-(row, chunk) — finer than the XLA path's per-row scale, so accuracy is
the same or slightly better.

LayerNorm / LayerScale / residual stay outside: XLA fuses them with the
neighbouring ops, and keeping them out makes the kernel a drop-in for the
``Mlp`` module body (reference MLP semantics: DINOv2 SwiGLUFFNFused /
timm Mlp, vendored at reference models_mae.py:24-255).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_rows_f32(xf, clip=127.0):
    """xf f32 [M, K] -> (int8 [M, K], f32 [M, 1] scale)."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / clip
    q = jnp.clip(jnp.round(xf / scale), -clip, clip).astype(jnp.int8)
    return q, scale


def _dot_i8(a, b):
    """int8 x int8 -> f32 via the MXU's int32 path."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf/erfc lowering; this polynomial keeps the exact-GELU
    semantics (torch nn.GELU default) to well below int8 quantization noise
    — and below bf16 resolution — inside the kernel.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))


def _ln_rows(xf, scale, bias, eps):
    """LayerNorm over the last dim, f32 (matches flax's f32 internal math)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _prologue(x_ref, ln_ref, xq_ref, xs_ref, acc_ref, *, eps):
    """c==0 work: (optional LN) -> quantize -> reset accumulator."""
    xf = x_ref[:].astype(jnp.float32)
    if ln_ref is not None:
        xf = _ln_rows(xf, ln_ref[0:1], ln_ref[1:2], eps)
    xq, xs = _quant_rows_f32(xf)
    xq_ref[:] = xq
    xs_ref[:] = xs
    acc_ref[:] = jnp.zeros_like(acc_ref)


def _epilogue(x_ref, b3_ref, gamma_ref, out_ref, acc_ref, *, residual):
    """c==last work: bias (+ LayerScale) (+ residual) -> write out."""
    out = acc_ref[:] + b3_ref[:]
    if gamma_ref is not None:
        out = out * gamma_ref[:]
    if residual:
        out = out + x_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _mlp_kernel_swiglu(
    x_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
    w3_ref, s3_ref, b3_ref, *rest,
    eps: float = 1e-6, ln: bool = False, gamma: bool = False,
    residual: bool = False,
):
    refs = list(rest)
    ln_ref = refs.pop(0) if ln else None
    gamma_ref = refs.pop(0) if gamma else None
    out_ref, xq_ref, xs_ref, acc_ref = refs
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        _prologue(x_ref, ln_ref, xq_ref, xs_ref, acc_ref, eps=eps)

    xq = xq_ref[:]
    xs = xs_ref[:]
    g1 = _dot_i8(xq, w1_ref[:]) * xs * s1_ref[:] + b1_ref[:]
    g2 = _dot_i8(xq, w2_ref[:]) * xs * s2_ref[:] + b2_ref[:]
    g = jax.nn.silu(g1) * g2                       # [Mt, HC] f32
    gq, gs = _quant_rows_f32(g)
    acc_ref[:] += _dot_i8(gq, w3_ref[:]) * gs * s3_ref[:]

    @pl.when(c == nc - 1)
    def _():
        _epilogue(x_ref, b3_ref, gamma_ref, out_ref, acc_ref, residual=residual)


def _mlp_kernel_gelu(
    x_ref, w1_ref, s1_ref, b1_ref, w3_ref, s3_ref, b3_ref, *rest,
    eps: float = 1e-6, ln: bool = False, gamma: bool = False,
    residual: bool = False,
):
    refs = list(rest)
    ln_ref = refs.pop(0) if ln else None
    gamma_ref = refs.pop(0) if gamma else None
    out_ref, xq_ref, xs_ref, acc_ref = refs
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        _prologue(x_ref, ln_ref, xq_ref, xs_ref, acc_ref, eps=eps)

    g = _dot_i8(xq_ref[:], w1_ref[:]) * xs_ref[:] * s1_ref[:] + b1_ref[:]
    g = _gelu_exact(g)
    gq, gs = _quant_rows_f32(g)
    acc_ref[:] += _dot_i8(gq, w3_ref[:]) * gs * s3_ref[:]

    @pl.when(c == nc - 1)
    def _():
        _epilogue(x_ref, b3_ref, gamma_ref, out_ref, acc_ref, residual=residual)


def _mlp_kernel_swiglu_bf16(
    x_ref, w1_ref, w2_ref, b1_ref, b2_ref, w3_ref, b3_ref, *rest,
    eps: float = 1e-6, ln: bool = False, gamma: bool = False,
    residual: bool = False,
):
    """bf16 twin of ``_mlp_kernel_swiglu``: whole MLP half in one kernel
    (LN + w12 + SwiGLU + w3 + LayerScale + residual), no quantization. The
    normalized activations persist in VMEM scratch across hidden chunks."""
    refs = list(rest)
    ln_ref = refs.pop(0) if ln else None
    gamma_ref = refs.pop(0) if gamma else None
    out_ref, xn_ref, acc_ref = refs
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if ln_ref is not None:
            xf = _ln_rows(xf, ln_ref[0:1], ln_ref[1:2], eps)
        xn_ref[:] = xf.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g1 = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    g2 = jnp.dot(xn, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    g = (jax.nn.silu(g1) * g2).astype(xn.dtype)
    acc_ref[:] += jnp.dot(g, w3_ref[:], preferred_element_type=jnp.float32)

    @pl.when(c == nc - 1)
    def _():
        _epilogue(x_ref, b3_ref, gamma_ref, out_ref, acc_ref, residual=residual)


def _mlp_kernel_gelu_bf16(
    x_ref, w1_ref, b1_ref, w3_ref, b3_ref, *rest,
    eps: float = 1e-6, ln: bool = False, gamma: bool = False,
    residual: bool = False,
):
    refs = list(rest)
    ln_ref = refs.pop(0) if ln else None
    gamma_ref = refs.pop(0) if gamma else None
    out_ref, xn_ref, acc_ref = refs
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if ln_ref is not None:
            xf = _ln_rows(xf, ln_ref[0:1], ln_ref[1:2], eps)
        xn_ref[:] = xf.astype(xn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xn = xn_ref[:]
    g = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    g = _gelu_exact(g).astype(xn.dtype)
    acc_ref[:] += jnp.dot(g, w3_ref[:], preferred_element_type=jnp.float32)

    @pl.when(c == nc - 1)
    def _():
        _epilogue(x_ref, b3_ref, gamma_ref, out_ref, acc_ref, residual=residual)


def _pick_hidden_chunk(hidden_chunk: int, hid: int, whole_ok: bool):
    """Hidden chunk for the fused MLP kernels. The weight-column BlockSpecs
    are (D, hc) views, so Mosaic needs hc % 128 == 0 — unless the block
    covers the whole array width (``whole_ok``: the GELU layout's w1 is
    exactly [D, hid], so hc == hid is exempt). Returns None when no chunk
    qualifies (tiny swiglu models); callers use the XLA int8 path."""
    for hc in range(min(hidden_chunk, hid), 127, -1):
        if hid % hc == 0 and hc % 128 == 0:
            return hc
    for hc in range(min(hidden_chunk, hid) + 1, hid + 1):
        if hid % hc == 0 and hc % 128 == 0:
            return hc
    if whole_ok:
        return hid
    return None


def int8_mlp_geometry_ok(mlp_type: str, hid: int) -> bool:
    """True iff the fused MLP kernels can lower for this hidden width."""
    return _pick_hidden_chunk(512, hid, mlp_type != "swiglu_fused") is not None


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_mlp_int8(
    x: jnp.ndarray,
    w12_q: jnp.ndarray,
    w12_scale: jnp.ndarray,
    b12: Optional[jnp.ndarray],
    w3_q: jnp.ndarray,
    w3_scale: jnp.ndarray,
    b3: Optional[jnp.ndarray],
    *,
    mlp_type: str = "swiglu_fused",
    hidden_chunk: int = 512,
    m_tile: int = 1088,
    ln_params: Optional[tuple] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [..., D] -> MLP(x) [..., D] with int8 W8A8 matmuls, fully fused.

    ``swiglu_fused``: w12_q [D, 2*HID] (w1 | w2 column blocks), w3_q
    [HID, D] — DINOv2-giant layout.  ``mlp``: w12_q is fc1 [D, HID], w3_q
    is fc2 [HID, D], GELU activation.

    Block-half fusion knobs (all optional, used by the ViT Block so the
    entire MLP half is ONE kernel — no LN round-trip or residual pass):
    ``ln_params=(scale, bias)`` applies LayerNorm to x inside the kernel;
    ``layerscale`` multiplies the MLP output by gamma; ``residual`` adds x.
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w3_q.shape[0]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    if interpret:
        # interpret mode has no Mosaic lane-alignment constraint (CPU tests
        # exercise tiny geometries)
        hc = min(hidden_chunk, hid)
        while hid % hc:
            hc -= 1
    else:
        hc = _pick_hidden_chunk(hidden_chunk, hid, mlp_type != "swiglu_fused")
    if hc is None:
        raise ValueError(
            f"fused MLP kernel needs a lane-aligned hidden chunk (hc % 128"
            f" == 0); none divides hid={hid}. Gate with"
            " int8_mlp_geometry_ok() and use the XLA int8 path."
        )
    # Prefer an m-tile that divides m exactly — padding costs a full
    # pad+slice round-trip of the activations in HBM. Search near the
    # requested tile for a divisor (any 8-multiple tile works; Mosaic pads
    # the int8 scratch sublanes internally).
    mt = min(m_tile, _round_up(m, 32))
    if m % mt:
        cands = [
            t for t in range(32, min(2 * mt, m) + 1, 8)
            if m % t == 0 and t >= mt // 3
        ]
        if cands:
            mt = min(cands, key=lambda t: abs(t - mt))
    mp = _round_up(m, mt)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    n_chunks = hid // hc

    out_dtype = x.dtype
    zeros = lambda n: jnp.zeros((1, n), jnp.float32)  # noqa: E731
    s3 = w3_scale.reshape(1, d).astype(jnp.float32)
    b3v = zeros(d) if b3 is None else b3.reshape(1, d).astype(jnp.float32)

    x_spec = pl.BlockSpec((mt, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((mt, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    w3_spec = pl.BlockSpec((hc, d), lambda i, c: (c, 0), memory_space=pltpu.VMEM)
    s3_spec = pl.BlockSpec((1, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM)

    # Optional block-half fusion operands (appended after the MLP operands,
    # mirrored by the kernels' *rest unpacking order: [ln], [gamma]).
    extra_args, extra_specs = [], []
    if ln_params is not None:
        ln_pack = jnp.stack(
            [jnp.asarray(p, jnp.float32).reshape(d) for p in ln_params]
        )  # [2, D]: row 0 scale, row 1 bias
        extra_args.append(ln_pack)
        extra_specs.append(
            pl.BlockSpec((2, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM)
        )
    if layerscale is not None:
        extra_args.append(jnp.asarray(layerscale, jnp.float32).reshape(1, d))
        extra_specs.append(s3_spec)
    kern_kw = dict(
        eps=ln_eps, ln=ln_params is not None,
        gamma=layerscale is not None, residual=residual,
    )

    # VMEM: x + xq + acc + out blocks, double-buffered weight chunks.
    esz = 2 if out_dtype == jnp.bfloat16 else 4
    vmem = (
        mt * d * (esz + 1 + 4 + esz)
        + 2 * (3 if mlp_type == "swiglu_fused" else 2) * hc * d
        + 6 * mt * hc * 4
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=min(int(vmem * 1.4), 110 << 20))

    if mlp_type == "swiglu_fused":
        assert w12_q.shape == (d, 2 * hid), (w12_q.shape, d, hid)
        s12 = w12_scale.reshape(1, 2 * hid).astype(jnp.float32)
        b12v = zeros(2 * hid) if b12 is None else b12.reshape(1, 2 * hid).astype(jnp.float32)
        w1_spec = pl.BlockSpec((d, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        w2_spec = pl.BlockSpec(
            (d, hc), lambda i, c: (0, c + n_chunks), memory_space=pltpu.VMEM
        )
        v1_spec = pl.BlockSpec((1, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        v2_spec = pl.BlockSpec(
            (1, hc), lambda i, c: (0, c + n_chunks), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_mlp_kernel_swiglu, **kern_kw),
            grid=(mp // mt, n_chunks),
            in_specs=[
                x_spec,
                w1_spec, w2_spec, v1_spec, v2_spec, v1_spec, v2_spec,
                w3_spec, s3_spec, s3_spec,
                *extra_specs,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((mt, d), jnp.int8),
                pltpu.VMEM((mt, 1), jnp.float32),
                pltpu.VMEM((mt, d), jnp.float32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x2, w12_q, w12_q, s12, s12, b12v, b12v, w3_q, s3, b3v, *extra_args)
    else:
        assert w12_q.shape == (d, hid), (w12_q.shape, d, hid)
        s1 = w12_scale.reshape(1, hid).astype(jnp.float32)
        b1v = zeros(hid) if b12 is None else b12.reshape(1, hid).astype(jnp.float32)
        w1_spec = pl.BlockSpec((d, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        v1_spec = pl.BlockSpec((1, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_mlp_kernel_gelu, **kern_kw),
            grid=(mp // mt, n_chunks),
            in_specs=[
                x_spec, w1_spec, v1_spec, v1_spec, w3_spec, s3_spec, s3_spec,
                *extra_specs,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((mt, d), jnp.int8),
                pltpu.VMEM((mt, 1), jnp.float32),
                pltpu.VMEM((mt, d), jnp.float32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x2, w12_q, s1, b1v, w3_q, s3, b3v, *extra_args)

    if mp != m:
        out = out[:m]
    return out.reshape(orig_shape)


def fused_mlp_bf16(
    x: jnp.ndarray,
    w12: jnp.ndarray,
    b12: Optional[jnp.ndarray],
    w3: jnp.ndarray,
    b3: Optional[jnp.ndarray],
    *,
    mlp_type: str = "swiglu_fused",
    hidden_chunk: int = 512,
    m_tile: int = 1088,
    ln_params: Optional[tuple] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole MLP half in one kernel with bf16 weights (no quantization):
    optional LN prologue + w12 + SwiGLU/GELU + w3 + bias + LayerScale +
    residual. Same grid/dataflow as ``fused_mlp_int8``.

    MEASURED NEGATIVE at the flagship shape: 2.56 (best tile sweep) vs
    1.98 ms/layer for the XLA MLP half — XLA's bf16 matmuls already run at
    ~85% peak with nothing to fuse away, and the in-kernel f32
    intermediates spill registers (docs/PERFORMANCE.md). NOT wired into
    the trunk; the int8 twin wins because it removes XLA quantize-chain
    boundaries, which bf16 does not have."""
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w3.shape[0]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    if interpret:
        # interpret mode has no Mosaic lane-alignment constraint (CPU tests
        # exercise tiny geometries)
        hc = min(hidden_chunk, hid)
        while hid % hc:
            hc -= 1
    else:
        hc = _pick_hidden_chunk(hidden_chunk, hid, mlp_type != "swiglu_fused")
    if hc is None:
        raise ValueError(
            f"fused MLP kernel needs a lane-aligned hidden chunk (hc % 128"
            f" == 0); none divides hid={hid}. Gate with"
            " int8_mlp_geometry_ok() and use the XLA int8 path."
        )
    mt = min(m_tile, _round_up(m, 32))
    if m % mt:
        cands = [
            t for t in range(32, min(2 * mt, m) + 1, 8)
            if m % t == 0 and t >= mt // 3
        ]
        if cands:
            mt = min(cands, key=lambda t: abs(t - mt))
    mp = _round_up(m, mt)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    n_chunks = hid // hc

    out_dtype = x.dtype
    zeros = lambda n: jnp.zeros((1, n), jnp.float32)  # noqa: E731
    b3v = zeros(d) if b3 is None else b3.reshape(1, d).astype(jnp.float32)

    x_spec = pl.BlockSpec((mt, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((mt, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    w3_spec = pl.BlockSpec((hc, d), lambda i, c: (c, 0), memory_space=pltpu.VMEM)
    s3_spec = pl.BlockSpec((1, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM)

    extra_args, extra_specs = [], []
    if ln_params is not None:
        ln_pack = jnp.stack(
            [jnp.asarray(p, jnp.float32).reshape(d) for p in ln_params]
        )
        extra_args.append(ln_pack)
        extra_specs.append(
            pl.BlockSpec((2, d), lambda i, c: (0, 0), memory_space=pltpu.VMEM)
        )
    if layerscale is not None:
        extra_args.append(jnp.asarray(layerscale, jnp.float32).reshape(1, d))
        extra_specs.append(s3_spec)
    kern_kw = dict(
        eps=ln_eps, ln=ln_params is not None,
        gamma=layerscale is not None, residual=residual,
    )

    esz = 2 if out_dtype == jnp.bfloat16 else 4
    wsz = 2 if w12.dtype == jnp.bfloat16 else 4
    vmem = (
        mt * d * (esz + esz + 4 + esz)
        + 2 * (3 if mlp_type == "swiglu_fused" else 2) * hc * d * wsz
        + 6 * mt * hc * 4
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=min(int(vmem * 1.4), 110 << 20))

    if mlp_type == "swiglu_fused":
        assert w12.shape == (d, 2 * hid), (w12.shape, d, hid)
        b12v = zeros(2 * hid) if b12 is None else b12.reshape(1, 2 * hid).astype(jnp.float32)
        w1_spec = pl.BlockSpec((d, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        w2_spec = pl.BlockSpec(
            (d, hc), lambda i, c: (0, c + n_chunks), memory_space=pltpu.VMEM
        )
        v1_spec = pl.BlockSpec((1, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        v2_spec = pl.BlockSpec(
            (1, hc), lambda i, c: (0, c + n_chunks), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_mlp_kernel_swiglu_bf16, **kern_kw),
            grid=(mp // mt, n_chunks),
            in_specs=[
                x_spec, w1_spec, w2_spec, v1_spec, v2_spec,
                w3_spec, s3_spec, *extra_specs,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((mt, d), out_dtype),
                pltpu.VMEM((mt, d), jnp.float32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x2, w12, w12, b12v, b12v, w3, b3v, *extra_args)
    else:
        assert w12.shape == (d, hid), (w12.shape, d, hid)
        b1v = zeros(hid) if b12 is None else b12.reshape(1, hid).astype(jnp.float32)
        w1_spec = pl.BlockSpec((d, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        v1_spec = pl.BlockSpec((1, hc), lambda i, c: (0, c), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_mlp_kernel_gelu_bf16, **kern_kw),
            grid=(mp // mt, n_chunks),
            in_specs=[x_spec, w1_spec, v1_spec, w3_spec, s3_spec, *extra_specs],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((mt, d), out_dtype),
                pltpu.VMEM((mt, d), jnp.float32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x2, w12, b1v, w3, b3v, *extra_args)

    if mp != m:
        out = out[:m]
    return out.reshape(orig_shape)
