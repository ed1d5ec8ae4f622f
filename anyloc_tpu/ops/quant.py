"""int8 W8A8 quantization for the frozen ViT trunk.

The reference has no quantization story (everything fp32/fp16 CUDA); on TPU
v5e the MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), and since the
AnyLoc trunk is *frozen* (training-free VPR, reference README.md:1-40) the
weights can be quantized once at load time with zero training risk:

  * weights: static symmetric per-output-channel int8
    (``quantize_weight_cols``), computed once — the param tree stores the
    int8 tensor plus an f32 scale per column;
  * activations: dynamic symmetric per-token (per-row) int8
    (``quantize_rows``) — one VPU pass that XLA fuses into the preceding
    elementwise chain (LayerNorm / SiLU / residual add);
  * matmul: int8 x int8 -> int32 ``dot_general`` (native MXU int8 path)
    with the dequant epilogue ``acc * row_scale * col_scale`` fused by XLA.

Measured on v5e at the flagship DINOv2-G shapes (M=8704 token rows): the
31-block matmul stack runs 109.5 ms bf16 -> 85.9 ms int8 (1.27x) including
all quantize/dequant overhead; a plain dtype swap through XLA *without* the
per-channel scale structure is slower than bf16 (docs/PERFORMANCE.md).

Quality: this is an accuracy/speed trade the user opts into
(``ViTConfig.quant='int8'``); the parity budget (BASELINE.json: R@1 within
0.3%) must be validated per-checkpoint with tools/parity_check.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, clip: float = 127.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row int8 quantization.

    x: [..., K] -> (q int8 [..., K], scale f32 [..., 1]) with
    q * scale ~= x. The row max is taken in f32 to avoid bf16 rounding of
    the scale itself.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / clip
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -clip, clip)
    return q.astype(jnp.int8), scale


def quantize_weight_cols(w: jnp.ndarray, clip: float = 127.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static symmetric per-output-channel (column) int8 quantization.

    w: [K, N] -> (q int8 [K, N], scale f32 [N]).
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(amax, 1e-9) / clip
    q = jnp.clip(jnp.round(w32 / scale[None, :]), -clip, clip)
    return q.astype(jnp.int8), scale


def int8_matmul(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    x_scale: jnp.ndarray,
    w_scale: jnp.ndarray,
    *,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """out = (xq @ wq) * x_scale * w_scale — int8 MXU matmul + dequant.

    xq [..., M, K] int8, wq [K, N] int8, x_scale [..., M, 1] f32,
    w_scale [N] f32 -> [..., M, N] out_dtype.
    """
    # f32 accumulation: worst-case f32 rounding at these magnitudes is
    # ~1e-7 relative — five orders below the int8 quantization noise — and
    # XLA fuses the dequant epilogue off an f32 acc slightly better than
    # off s32 (measured 76.1 vs 77.7 ms on the 31-block MLP stack).
    acc = jax.lax.dot_general(
        xq, wq,
        ((((xq.ndim - 1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * x_scale * w_scale).astype(out_dtype)


def qdense(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    out_dtype=None,
) -> jnp.ndarray:
    """Quantized Dense: dynamic per-token activation quant + int8 matmul.

    Contracts the last dim of ``x`` directly (NO reshape to 2-D): XLA keeps
    3-D activations in a sequence-major layout ({2,0,1}), so a flatten of
    batch x tokens is a physical relayout copy, not a bitcast — reshaping
    here cost ~30% end-to-end before it was removed.
    """
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_rows(x)
    out = int8_matmul(xq, wq, xs, w_scale, out_dtype=out_dtype)
    if bias is not None:
        out = out + bias.astype(out_dtype)
    return out


# ------------------------------------------------------------------ params
def quantize_tree(
    params: Any, *, min_size: int = 1 << 16, only_modules: Optional[tuple] = None
) -> Any:
    """Walk a Flax param tree and replace every 2-D Dense ``kernel`` larger
    than ``min_size`` elements with ``{kernel_q, kernel_scale}`` (int8 +
    per-column f32). Small kernels (LayerScale gammas, LN params, biases,
    conv kernels, tiny heads) are left untouched — quantizing them saves
    nothing and costs accuracy.

    The result loads into a ``ViT`` with ``cfg.quant='int8'`` (the QDense
    modules declare exactly these param names).
    """

    def walk(node, parent=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= min_size
                    and (only_modules is None or parent in only_modules)
                ):
                    q, s = quantize_weight_cols(v)
                    out["kernel_q"] = q
                    out["kernel_scale"] = s
                else:
                    out[k] = walk(v, k)
            return out
        return node

    # FrozenDict-compatible: unfreeze via dict() semantics
    import flax

    plain = flax.core.unfreeze(params) if hasattr(params, "unfreeze") or isinstance(
        params, flax.core.FrozenDict
    ) else params
    return walk(plain)


MLP_MODULE_NAMES = ("fc1", "fc2", "w12", "w3")


def quantize_vit_params(
    params: Any, mode: str = "int8", *, min_size: int = 1 << 16
) -> Any:
    """Convert a ``ViT`` param tree (random init or checkpoint-converted) to
    the int8 layout consumed by ``ViTConfig(quant=mode)``.

    mode 'int8' quantizes all four block matmuls (XLA QDense);
    'int8_full' is the same layout, consumed by the fused Pallas
    attention-half + MLP-half kernels (the fastest trunk mode);
    'int8_fused' quantizes only the MLP kernels (qkv/proj stay bf16
    nn.Dense — fused-MLP trunk with bf16 attention). Patch-embed conv,
    LayerNorms, LayerScales and biases stay in the original dtype.
    """
    if mode == "int8_fused":
        return quantize_tree(
            params, min_size=min_size, only_modules=MLP_MODULE_NAMES
        )
    if mode == "int8_mlp":
        # QDense on MLP only; attention Dense params keep 'kernel'.
        return quantize_tree(
            params, min_size=min_size, only_modules=MLP_MODULE_NAMES
        )
    return quantize_tree(params, min_size=min_size)
