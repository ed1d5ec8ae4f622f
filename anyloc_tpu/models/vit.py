"""One Flax ViT trunk for the whole model zoo.

The reference uses six separate PyTorch ViT implementations (DINOv2 via
torch.hub, DINO v1 via ``dino_extractor.py``, HF ViT for CosPlace
``utilities.py:134-211``, MAE ``models_mae.py``, CLIP towers, SAM encoder) and
extracts intermediate features with forward hooks. Here a single configurable
``ViT`` module covers the families, and intermediate facets (query / key /
value / token) are *returned from the forward pass*:

  * ``capture_layer`` truncates the trunk — blocks after the captured layer
    are never executed (the reference computes DINOv2-G blocks 32..39 and
    throws them away, SURVEY.md §3.5);
  * the q/k/v facet is the fused-qkv Linear output sliced in thirds, matching
    the reference's hook on ``attn.qkv`` exactly (utilities.py:274-281 slices
    the *fused* [B, N, 3D] output, NOT per-head tensors);
  * everything is jit/vmap/pjit friendly: static shapes, no Python state.

Architecture knobs cover: pre/post LayerNorm placements, LayerScale (DINOv2),
SwiGLU-fused MLP (DINOv2-giant), sin-cos vs learned position embeddings (MAE),
class-token presence, quick-GELU (CLIP), token-dropping — each family's config
lives in its own module (``dinov2.py``, ``dino_v1.py``, ...).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Architecture hyperparameters (family-specific factories in dinov2.py etc.)."""

    img_size: int = 518            # training-time image size (pos-embed grid)
    patch_size: int = 14
    patch_stride: Optional[int] = None  # < patch_size -> overlapping patches
    # (DINO v1 stride-patching, ref dino_extractor.py:104-160: grid dim =
    # 1 + (H - patch) // stride; None means stride == patch_size)
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    mlp_type: str = "mlp"          # "mlp" | "swiglu_fused"
    act: str = "gelu"              # "gelu" | "quick_gelu"
    layerscale_init: Optional[float] = 1e-5   # None disables LayerScale
    ln_eps: float = 1e-6
    num_register_tokens: int = 0   # DINOv2-reg variants
    use_cls_token: bool = True
    pos_embed_type: str = "learned"  # "learned" | "sincos2d" (MAE)
    qkv_bias: bool = True
    patch_bias: bool = True        # CLIP's patch conv has no bias
    proj_dim: Optional[int] = None  # CLIP: final projection width -> embed
    pre_norm: bool = False         # CLIP: LayerNorm before the blocks
    final_norm: bool = True        # apply trunk-final LayerNorm
    interpolate_offset: float = 0.1  # DINOv2 pos-embed interpolation fudge
    interpolate_antialias: bool = False
    dtype: Dtype = jnp.float32     # activation/compute dtype (bf16 for speed)
    attn_impl: str = "auto"        # "auto" | "pallas" | "xla"
    # "auto" resolves to the Pallas VMEM-resident kernel on TPU, XLA elsewhere.
    quant: Optional[str] = None    # None | "int8" — int8 W8A8 block matmuls
    # (frozen-trunk weight quantization, ops/quant.py; ~1.27x matmul stack on
    # v5e; params carry kernel_q/kernel_scale — see quantize_vit_params)
    attn_pack_pairs: bool = False  # int8_full kernel: M-pack head pairs into
    # one scores/PV dot each (block-diagonal, mathematically exact) — cuts
    # padded MXU rows when N % 128 is small (224 px: 264 -> pads 384/head;
    # packed pair 528 -> 640 vs 768). Measured datapoint in
    # docs/PERFORMANCE.md; off by default.
    tp_split: bool = False         # store qkv as wq/wk/wv and SwiGLU w12 as
    # w1/w2 (separate Dense params). The fused [D,3D]/[D,2H] layouts cannot
    # shard head-/gate-aligned along columns; the split layouts give true
    # Megatron-style tensor parallelism (parallel/tp.py) with identical math
    # — the fused qkv facet tensor is reassembled by concatenation. Not
    # combinable with the int8-fused kernel paths (those consume the fused
    # layouts); converters split checkpoint matrices when this is set.
    remat: bool = False            # jax.checkpoint each block: backward-pass
    # activation memory drops from O(depth) to O(sqrt-ish) at ~1/3 extra
    # forward FLOPs — for TRAINING large ViT trunks (e.g. the vit token
    # backbone in GeoLocalizationNet); inference is unaffected (no
    # residency past a block under jit).

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size


# Test hook: run the fused-MLP Pallas kernel in interpret mode (CPU tests
# exercise the real kernel; production CPU falls back to the XLA int8 path).
_FUSED_MLP_INTERPRET = False
# Same hook for the fused int8 attention-half kernel (quant='int8_full').
_FUSED_ATTN_INTERPRET = False


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def exact_gelu(x):
    # torch nn.GELU default is the exact erf form; flax nn.gelu defaults to
    # the tanh approximation — parity requires approximate=False.
    return nn.gelu(x, approximate=False)


def _act(name: str):
    return {"gelu": exact_gelu, "quick_gelu": quick_gelu}[name]


def _torch_bicubic_matrix(src: int, dst: int, scale: Optional[float] = None,
                          antialias: bool = False) -> "np.ndarray":
    """[dst, src] interpolation matrix reproducing torch's bicubic resize
    (upsample_bicubic2d, align_corners=False, antialias=False, A=-0.75).

    jax.image.resize's 'bicubic' is Catmull-Rom (A=-0.5), which differs from
    torch and would break descriptor parity at non-native resolutions; a
    static matrix makes the resample an exact (and MXU-friendly) matmul.

    ``scale``: the dst/src scale factor torch was *given*. DINO/DINOv2 call
    F.interpolate with scale_factor=(dst + 0.1)/src and
    recompute_scale_factor=False, so source coords are (i+0.5)/scale - 0.5
    with the fudged scale — the 0.1 offset changes values, not just the
    output size. None means the pure ratio dst/src (size-based call).
    """
    import numpy as np

    a = -0.75

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    m = np.zeros((dst, src), np.float64)
    inv_scale = (src / dst) if scale is None else (1.0 / scale)
    if not antialias:
        # 4-tap Keys kernel; out-of-range taps clamp to the edge pixel
        # (replicate border, torch's non-antialiased convention).
        for i in range(dst):
            pos = (i + 0.5) * inv_scale - 0.5
            i0 = math.floor(pos)
            t = pos - i0
            for tap, w in zip(
                range(i0 - 1, i0 + 3), (k(1 + t), k(t), k(1 - t), k(2 - t))
            ):
                m[i, min(max(tap, 0), src - 1)] += w
        return m.astype(np.float32)
    # Antialiased: torch's separable-AA path uses the PIL convention —
    # A=-0.5 kernel (NOT -0.75), support widened by 1/scale on downscale,
    # window [int(center - support + 0.5), int(center + support + 0.5)),
    # out-of-range taps excluded and weights renormalized. Verified exact
    # (3e-7) against F.interpolate(..., antialias=True).
    def k_aa(t, a=-0.5):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    kscale = min(1.0, 1.0 / inv_scale)
    support = 2.0 / kscale
    for i in range(dst):
        center = inv_scale * (i + 0.5)
        xmin = max(0, int(center - support + 0.5))
        xmax = min(src, int(center + support + 0.5))
        ws = [k_aa((j - center + 0.5) * kscale) for j in range(xmin, xmax)]
        total = sum(ws) or 1.0
        for tap, w in zip(range(xmin, xmax), ws):
            m[i, tap] += w / total
    return m.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,
    grid_hw: Tuple[int, int],
    num_prefix: int,
    offset: float = 0.1,
    antialias: bool = False,
) -> jnp.ndarray:
    """Bicubic-resize the patch position embeddings to a new grid.

    Mirrors DINOv2's ``interpolate_pos_encoding`` (scale-factor form with the
    0.1 offset fudge) / the MAE util vendored at reference
    ``utilities.py:364-385``. ``pos_embed``: [1, num_prefix + M*M, D].
    """
    h, w = grid_hw
    n_patch = pos_embed.shape[1] - num_prefix
    m = int(round(math.sqrt(n_patch)))
    assert m * m == n_patch, f"pos_embed grid not square: {n_patch}"
    if (h, w) == (m, m):
        return pos_embed
    prefix = pos_embed[:, :num_prefix]
    patch = pos_embed[:, num_prefix:].reshape(1, m, m, -1)
    # DINO/DINOv2 resample with scale_factor=(h + offset)/m (offset 0.1,
    # recompute_scale_factor=False) — the fudged scale shifts the sampling
    # grid slightly, so it must be baked into the interpolation matrices.
    sh = (h + offset) / m if offset else None
    sw = (w + offset) / m if offset else None
    # Both paths use torch-exact matrices; torch antialiasing only alters
    # downscales (wider, renormalized kernel support).
    wh = jnp.asarray(_torch_bicubic_matrix(m, h, sh, antialias))
    ww = jnp.asarray(_torch_bicubic_matrix(m, w, sw, antialias))
    patch = jnp.einsum(
        "hm,bmnd,wn->bhwd", wh, patch, ww, precision=jax.lax.Precision.HIGHEST
    )
    patch = patch.reshape(1, h * w, -1)
    return jnp.concatenate([prefix, patch], axis=1)


def sincos_2d_pos_embed(embed_dim: int, grid: int, cls_token: bool) -> jnp.ndarray:
    """2-D sin-cos position embedding (reference utilities.py:309-356)."""
    import numpy as np

    gh = np.arange(grid, dtype=np.float32)
    gw = np.arange(grid, dtype=np.float32)
    mesh = np.stack(np.meshgrid(gw, gh), axis=0).reshape(2, -1)  # w first

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [emb_1d(embed_dim // 2, mesh[0]), emb_1d(embed_dim // 2, mesh[1])], axis=1
    )
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return jnp.asarray(emb[None], dtype=jnp.float32)


class QDense(nn.Module):
    """int8 W8A8 Dense for the frozen trunk (ops/quant.py).

    Params: ``kernel_q`` int8 [in, out] + ``kernel_scale`` f32 [out]
    (produced by ``quantize_vit_params`` from a converted checkpoint; random
    init quantizes a normal draw so random-weight benches are shape- and
    dtype-true). Activations are quantized per-token on the fly.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        from anyloc_tpu.ops.quant import qdense, quantize_weight_cols

        in_dim = x.shape[-1]

        def init_q(key, shape, _=None):
            w = jax.random.normal(key, shape, jnp.float32) * (in_dim ** -0.5)
            return quantize_weight_cols(w)[0]

        kq = self.param("kernel_q", init_q, (in_dim, self.features))
        ks = self.param(
            "kernel_scale",
            nn.initializers.constant(in_dim ** -0.5 / 127.0),
            (self.features,),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if return_params:
            # Declaration-only pass for fused kernels that consume the same
            # param tree (ops/pallas/fused_mlp.py); x supplies in_dim only.
            return kq, ks, bias
        return qdense(x, kq, ks, bias, out_dtype=self.dtype)


_MLP_DENSE_NAMES = ("fc1", "fc2", "w12", "w3")


def _dense(cfg: ViTConfig, features: int, *, use_bias: bool = True, name: str):
    """Block-internal Dense factory: bf16 nn.Dense, or QDense when
    cfg.quant == 'int8' (all four block matmuls) / 'int8_mlp' (MLP only —
    the attention-adjacent qkv/proj quantization interacts badly with the
    attention custom-call's layout constraints)."""
    if cfg.quant in ("int8", "int8_full") or (
        cfg.quant == "int8_mlp" and name in _MLP_DENSE_NAMES
    ):
        return QDense(features, use_bias=use_bias, dtype=cfg.dtype, name=name)
    # 'int8_fused' keeps qkv/proj in bf16 (XLA int8 loses at the attention
    # boundary) — the MLP is handled by the fused kernel inside Mlp.
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype, name=name)


class Attention(nn.Module):
    """Multi-head self-attention with the fused-qkv layout the facet API needs.

    ``return_qkv=True`` additionally returns the raw fused qkv Linear output
    [B, N, 3D] (the exact tensor the reference hooks, utilities.py:250-252).
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, return_qkv: bool = False, qkv_only: bool = False,
                 return_attn_probs: bool = False, fused_tail=None,
                 fused_int8_tail=None, attn_fn=None):
        c = self.cfg
        b, n, d = x.shape
        if fused_int8_tail is not None:
            # quant='int8_full': the ENTIRE attention half — norm1 + int8
            # qkv + attention + int8 proj + LayerScale + residual — as one
            # Pallas kernel. ``x`` here is the PRE-norm block input (it is
            # also the residual). fused_int8_tail = (ln_scale, ln_bias,
            # gamma | None).
            from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8

            ln_scale, ln_bias, gamma = fused_int8_tail
            kq, ks, bq = QDense(
                3 * d, use_bias=c.qkv_bias, dtype=c.dtype, name="qkv"
            )(x, return_params=True)
            kpq, kps, bp = QDense(d, dtype=c.dtype, name="proj")(
                jnp.zeros((1, d), c.dtype), return_params=True
            )
            if jax.default_backend() == "cpu" and not _FUSED_ATTN_INTERPRET:
                # XLA fallback with identical math (CPU tests / non-TPU).
                from anyloc_tpu.ops.pallas.fused_mlp import _ln_rows
                from anyloc_tpu.ops.quant import qdense

                xn = _ln_rows(
                    x.astype(jnp.float32), ln_scale, ln_bias, c.ln_eps
                )
                qkv = qdense(xn, kq, ks, bq, out_dtype=jnp.float32)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                hs = lambda t: t.reshape(b, n, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)  # noqa: E731
                from anyloc_tpu.ops.pallas.flash_attention import xla_attention

                o = xla_attention(hs(q), hs(k), hs(v))
                o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
                o = qdense(o, kpq, kps, bp, out_dtype=jnp.float32)
                if gamma is not None:
                    o = o * gamma
                return (x.astype(jnp.float32) + o).astype(c.dtype)
            return fused_attn_half_int8(
                x, kq, ks, bq, kpq, kps, bp,
                num_heads=c.num_heads,
                ln_params=(ln_scale, ln_bias), ln_eps=c.ln_eps,
                layerscale=gamma, pack_pairs=c.attn_pack_pairs,
                interpret=_FUSED_ATTN_INTERPRET,
            )
        if c.tp_split:
            # three column-shardable towers; concatenation reproduces the
            # fused facet layout exactly (q|k|v, head-minor within each)
            qkv = jnp.concatenate(
                [
                    _dense(c, d, use_bias=c.qkv_bias, name=n)(x)
                    for n in ("wq", "wk", "wv")
                ],
                axis=-1,
            )
        else:
            qkv = _dense(
                c, 3 * d, use_bias=c.qkv_bias, name="qkv"
            )(x)  # [B, N, 3D] fused — facet source
        if qkv_only:
            # Facet capture: the attention itself (and proj) is never built —
            # the reference computes the full block then discards it
            # (SURVEY.md §3.5); we stop at the hooked tensor.
            return qkv
        if fused_tail is not None and not return_attn_probs:
            # Whole attention half in one kernel from the raw qkv tensor:
            # no head split/transpose relayouts, proj + LayerScale +
            # residual folded in (1.03 vs 1.58 ms/layer at the flagship
            # shape). fused_tail = (gamma | None, residual).
            from anyloc_tpu.ops.pallas.attn_proj import flash_attention_qkv_proj

            gamma, res = fused_tail
            wp, bp = _DenseParams(d, d, name="proj")()
            out = flash_attention_qkv_proj(
                qkv, wp.astype(c.dtype), bp, num_heads=c.num_heads,
                layerscale=gamma, residual=res,
            )
            if return_qkv:
                return out, qkv
            return out
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if return_attn_probs:
            scale = c.head_dim ** -0.5
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            return jax.nn.softmax(s, axis=-1)
        impl = c.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if attn_fn is not None:
            # caller-supplied attention over the head-split tensors — the
            # sequence-parallel ring (parallel/sp.py) injects itself here
            out = attn_fn(q, k, v)
        elif impl == "stub":
            # Diagnostic: skip the attention math entirely (out = v). Only
            # for performance accounting — never a real model config.
            out = v
        elif impl == "pallas":
            from anyloc_tpu.ops.pallas.flash_attention import (
                flash_attention_heads,
            )

            out = flash_attention_heads(q, k, v)
        else:
            from anyloc_tpu.ops.pallas.flash_attention import xla_attention

            out = xla_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = _dense(c, d, name="proj")(out)
        if return_qkv:
            return out, qkv
        return out


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        if return_params:
            return gamma
        return x * gamma.astype(x.dtype)


class _DenseParams(nn.Module):
    """Declare-only Dense params (same names/inits as nn.Dense) for kernels
    that fold the projection in."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """Declare-only LayerNorm params (same names/inits/shapes as
    nn.LayerNorm) for kernels that fuse the normalization in."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _mlp_int8_xla(c: "ViTConfig", x, p1, p3):
    """XLA composition of the fused-MLP int8 math (CPU fallback)."""
    from anyloc_tpu.ops.quant import qdense

    h = qdense(x, *p1, out_dtype=c.dtype)
    if c.mlp_type == "swiglu_fused":
        x1, x2 = jnp.split(h, 2, axis=-1)
        g = jax.nn.silu(x1) * x2
    else:
        g = exact_gelu(h)
    return qdense(g, *p3, out_dtype=c.dtype)


class Mlp(nn.Module):
    cfg: ViTConfig

    def _supports_fused(self) -> bool:
        c = self.cfg
        return (
            c.quant in ("int8_fused", "int8_full")
            and (c.mlp_type == "swiglu_fused" or c.act == "gelu")
            and not c.tp_split  # kernels consume the fused [D, 2H] layout
        )

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        c = self.cfg
        d = x.shape[-1]
        hidden = int(d * c.mlp_ratio)
        if self._supports_fused():
            # Single Pallas kernel: quantize -> int8 w12 -> SwiGLU/GELU ->
            # requantize -> int8 w3 (1.5x the XLA bf16 MLP at flagship
            # shapes; XLA-level int8 loses its gain to fusion boundaries —
            # docs/PERFORMANCE.md). Same param tree as quant='int8_fused'.
            # ``return_params`` lets Block fuse LN/LayerScale/residual into
            # the same kernel (the trunk path).
            from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8

            if c.mlp_type == "swiglu_fused":
                hidden = ((int(d * c.mlp_ratio * 2 / 3) + 7) // 8) * 8
                n1, n3, two = "w12", "w3", 2
            else:
                n1, n3, two = "fc1", "fc2", 1
            kq1, ks1, b1 = QDense(two * hidden, dtype=c.dtype, name=n1)(
                x, return_params=True
            )
            kq3, ks3, b3 = QDense(d, dtype=c.dtype, name=n3)(
                jnp.zeros((1, hidden), c.dtype), return_params=True
            )
            if return_params:
                return (kq1, ks1, b1), (kq3, ks3, b3)
            from anyloc_tpu.ops.pallas.fused_mlp import int8_mlp_geometry_ok

            mlp_kind = "swiglu_fused" if c.mlp_type == "swiglu_fused" else "mlp"
            if (
                jax.default_backend() in ("cpu",)
                or not int8_mlp_geometry_ok(mlp_kind, hidden)
            ) and not _FUSED_MLP_INTERPRET:
                return _mlp_int8_xla(c, x, (kq1, ks1, b1), (kq3, ks3, b3))
            return fused_mlp_int8(
                x, kq1, ks1, b1, kq3, ks3, b3,
                mlp_type="swiglu_fused" if c.mlp_type == "swiglu_fused" else "mlp",
                interpret=_FUSED_MLP_INTERPRET,
            )
        if c.mlp_type == "mlp":
            x = _dense(c, hidden, name="fc1")(x)
            x = _act(c.act)(x)
            x = _dense(c, d, name="fc2")(x)
            return x
        elif c.mlp_type == "swiglu_fused":
            # DINOv2-giant SwiGLUFFNFused: hidden = (int(4d * 2/3) + 7) // 8 * 8
            hidden = ((int(d * c.mlp_ratio * 2 / 3) + 7) // 8) * 8
            if c.tp_split:
                # gate-aligned column-parallel towers (see ViTConfig.tp_split)
                x1 = _dense(c, hidden, name="w1")(x)
                x2 = _dense(c, hidden, name="w2")(x)
            else:
                w12 = _dense(c, 2 * hidden, name="w12")(x)
                x1, x2 = jnp.split(w12, 2, axis=-1)
            x = jax.nn.silu(x1) * x2
            return _dense(c, d, name="w3")(x)
        raise ValueError(f"Unknown mlp_type {c.mlp_type}")


class Block(nn.Module):
    """Pre-norm transformer block: x + ls1(attn(norm1 x)); x + ls2(mlp(norm2 x))."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, return_qkv: bool = False, qkv_only: bool = False,
                 return_attn_probs: bool = False, attn_fn=None):
        c = self.cfg
        d = x.shape[-1]
        from anyloc_tpu.ops.pallas.attn_proj import MAX_FUSED_TOKENS

        impl = c.attn_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        from anyloc_tpu.ops.pallas.attn_proj import int8_attn_geometry_ok

        use_fused_attn_int8 = (
            c.quant == "int8_full"
            and attn_fn is None
            and x.shape[1] <= MAX_FUSED_TOKENS
            and not (qkv_only or return_attn_probs or return_qkv)
            and (impl == "pallas" or jax.default_backend() == "cpu")
            # tiny head geometries can't lane-align the kernel's weight
            # blocks -> plain QDense path (caught by the tpu test lane)
            and int8_attn_geometry_ok(c.num_heads, c.head_dim)
            and not c.tp_split  # kernel consumes the fused [D, 3D] layout
        )
        if use_fused_attn_int8:
            # Whole attention half (norm1 + int8 qkv + attention + int8
            # proj + ls1 + residual) in one kernel; declare-only param
            # modules keep the tree identical to the unfused int8 path.
            ln_scale, ln_bias = _LNParams(d, name="norm1")()
            gamma1 = (
                LayerScale(d, c.layerscale_init, name="ls1")(
                    None, return_params=True
                )
                if c.layerscale_init is not None
                else None
            )
            x = Attention(c, name="attn")(
                x, fused_int8_tail=(ln_scale, ln_bias, gamma1)
            )
            return self._mlp_half(x, return_qkv=False, qkv=None)
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm1")(x)
        if qkv_only:
            return Attention(c, name="attn")(h, qkv_only=True)
        if return_attn_probs:
            return Attention(c, name="attn")(h, return_attn_probs=True)
        from anyloc_tpu.ops.pallas.attn_proj import attn_geometry_ok

        use_fused_attn = (
            impl == "pallas"
            and attn_fn is None
            and x.shape[1] <= MAX_FUSED_TOKENS
            # int8 modes quantize proj -> different params / fused routes
            and c.quant not in ("int8", "int8_full")
            # tiny geometries (hc*head_dim never a 128-lane multiple) can't
            # lower on real Mosaic — route them through the unfused path
            and attn_geometry_ok(c.num_heads, c.head_dim)
        )
        if use_fused_attn:
            gamma1 = (
                LayerScale(d, c.layerscale_init, name="ls1")(
                    None, return_params=True
                )
                if c.layerscale_init is not None
                else None
            )
            if return_qkv:
                x, qkv = Attention(c, name="attn")(
                    h, return_qkv=True, fused_tail=(gamma1, x)
                )
            else:
                x = Attention(c, name="attn")(h, fused_tail=(gamma1, x))
        else:
            if return_qkv:
                attn_out, qkv = Attention(c, name="attn")(
                    h, return_qkv=True, attn_fn=attn_fn)
            else:
                attn_out = Attention(c, name="attn")(h, attn_fn=attn_fn)
            if c.layerscale_init is not None:
                attn_out = LayerScale(d, c.layerscale_init, name="ls1")(attn_out)
            x = x + attn_out
        return self._mlp_half(x, return_qkv=return_qkv,
                              qkv=qkv if return_qkv else None)

    def _mlp_half(self, x, *, return_qkv: bool, qkv):
        """Second residual branch: x + ls2(mlp(norm2 x)) — fused when int8."""
        c = self.cfg
        d = x.shape[-1]
        mlp = Mlp(c, name="mlp")
        if mlp._supports_fused():
            # Whole MLP half (norm2 + mlp + ls2 + residual) as ONE Pallas
            # kernel — removes the LN round-trip and the residual pass that
            # otherwise sit on the kernel boundary.
            from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8

            ln_scale, ln_bias = _LNParams(d, name="norm2")()
            p1, p3 = mlp(x, return_params=True)
            gamma = (
                LayerScale(d, c.layerscale_init, name="ls2")(
                    None, return_params=True
                )
                if c.layerscale_init is not None
                else None
            )
            from anyloc_tpu.ops.pallas.fused_mlp import int8_mlp_geometry_ok

            mlp_kind = "swiglu_fused" if c.mlp_type == "swiglu_fused" else "mlp"
            hid_cols = p3[0].shape[0]
            if (
                jax.default_backend() in ("cpu",)
                or not int8_mlp_geometry_ok(mlp_kind, hid_cols)
            ) and not _FUSED_MLP_INTERPRET:
                from anyloc_tpu.ops.pallas.fused_mlp import _ln_rows

                hn = _ln_rows(
                    x.astype(jnp.float32), ln_scale, ln_bias, c.ln_eps
                ).astype(c.dtype)
                m = _mlp_int8_xla(c, hn, p1, p3).astype(jnp.float32)
                if gamma is not None:
                    m = m * gamma
                x = (x.astype(jnp.float32) + m).astype(c.dtype)
            else:
                x = fused_mlp_int8(
                    x, *p1, *p3,
                    mlp_type="swiglu_fused" if c.mlp_type == "swiglu_fused" else "mlp",
                    ln_params=(ln_scale, ln_bias), ln_eps=c.ln_eps,
                    layerscale=gamma, residual=True,
                    interpret=_FUSED_MLP_INTERPRET,
                )
            if return_qkv:
                return x, qkv
            return x
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm2")(x)
        m = mlp(h)
        if c.layerscale_init is not None:
            m = LayerScale(d, c.layerscale_init, name="ls2")(m)
        x = x + m
        if return_qkv:
            return x, qkv
        return x


class ViT(nn.Module):
    """The trunk. Input images are channels-last [B, H, W, 3] (TPU-native
    layout), already normalized. H, W must be multiples of patch_size.

    ``__call__(x, capture_layer=L, capture_facet=f)``:
      * ``capture_layer=None``: full forward; returns dict with ``tokens``
        [B, N, D] (post final-norm patch tokens), ``cls`` [B, D],
        ``pre_norm_tokens`` (pre-final-norm, incl. prefix tokens).
      * ``capture_layer=L`` with facet "query"|"key"|"value": runs blocks
        0..L-1 plus norm1+qkv of block L only, returns the sliced facet
        [B, 1+R+N, D] (CLS+register tokens included; callers slice).
      * facet "token": runs blocks 0..L, returns block L's output.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        capture_layer: Optional[int] = None,
        capture_facet: str = "value",
        embed_only: bool = False,
        capture_layers: Optional[Sequence[int]] = None,
    ):
        c = self.cfg
        b, h, w, _ = x.shape
        stride = c.patch_stride or c.patch_size
        gh = 1 + (h - c.patch_size) // stride
        gw = 1 + (w - c.patch_size) // stride
        x = x.astype(c.dtype)
        # Patch embedding: Conv stride=patch (MXU-friendly: XLA lowers this to
        # a [B*gh*gw, p*p*3] x [p*p*3, D] matmul). With patch_stride < patch
        # (DINO v1 dense-descriptor mode) patches overlap.
        x = nn.Conv(
            c.embed_dim,
            (c.patch_size, c.patch_size),
            strides=(stride, stride),
            padding="VALID",
            use_bias=c.patch_bias,
            dtype=c.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(b, gh * gw, c.embed_dim)

        num_prefix = 0
        if c.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim)
            )
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.embed_dim)), x], axis=1)
            num_prefix = 1

        # Position embeddings (added before register tokens, DINOv2 order).
        if c.pos_embed_type == "learned":
            n_pos = num_prefix + c.grid_size ** 2
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, n_pos, c.embed_dim)
            )
        else:  # fixed sin-cos (MAE)
            pos = sincos_2d_pos_embed(c.embed_dim, c.grid_size, c.use_cls_token)
        pos = interpolate_pos_embed(
            pos.astype(jnp.float32),
            (gh, gw),
            num_prefix,
            offset=c.interpolate_offset,
            antialias=c.interpolate_antialias,
        )
        x = x + pos.astype(c.dtype)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.normal(0.02),
                (1, c.num_register_tokens, c.embed_dim),
            )
            x = jnp.concatenate(
                [
                    x[:, :num_prefix],
                    jnp.broadcast_to(
                        reg.astype(c.dtype), (b, c.num_register_tokens, c.embed_dim)
                    ),
                    x[:, num_prefix:],
                ],
                axis=1,
            )

        if c.pre_norm:
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm_pre")(x)

        if embed_only:
            # Embedded token sequence [B, 1+R+N, D], pre-blocks — the stage-0
            # input of the pipeline-parallel route (parallel/pp.py), which
            # applies the blocks functionally with per-stage param shards.
            return x

        block_cls = nn.remat(Block) if c.remat else Block
        if capture_layers is not None:
            # Multi-layer capture in ONE forward — the reference registers
            # hooks on several layers simultaneously
            # (dino_extractor.py:215-230; scripts/dino_multilayer_vlad.py)
            # where separate single-layer passes would cost ~sum(L_i)
            # blocks instead of max(L_i).
            if capture_layer is not None:
                raise ValueError(
                    "pass either capture_layer or capture_layers, not both")
            want = sorted(set(int(i) for i in capture_layers))
            if capture_facet == "attn":
                raise ValueError("capture_layers supports q/k/v/token facets")
            outs = {}
            d = c.embed_dim
            off = {"query": 0, "key": 1, "value": 2}.get(capture_facet)
            for i in range(want[-1] + 1):
                if capture_facet == "token":
                    x = block_cls(c, name=f"blocks_{i}")(x)
                    if i in want:
                        outs[i] = x
                elif i in want:
                    # full block WITH the hooked qkv tensor (return_qkv) —
                    # one extra block tail vs qkv_only, L-1 fewer passes
                    x, qkv = Block(c, name=f"blocks_{i}")(x, return_qkv=True)
                    outs[i] = qkv[..., off * d: (off + 1) * d]
                else:
                    x = block_cls(c, name=f"blocks_{i}")(x)
            return outs
        facet_out = None
        n_blocks = c.depth if capture_layer is None else (
            capture_layer + 1 if capture_facet == "token" else capture_layer
        )
        for i in range(n_blocks):
            x = block_cls(c, name=f"blocks_{i}")(x)
        if capture_layer is not None:
            if capture_facet == "token":
                facet_out = x
            elif capture_facet == "attn":
                # post-softmax attention probabilities [B, H, N, N]
                # (DINO v1 'attn' facet, ref dino_extractor.py:220-223)
                return Block(c, name=f"blocks_{capture_layer}")(
                    x, return_attn_probs=True
                )
            else:
                # norm1 + qkv of the captured block only — the rest of the
                # block (and all later blocks) is never built or executed.
                qkv = Block(c, name=f"blocks_{capture_layer}")(x, qkv_only=True)
                d = c.embed_dim
                off = {"query": 0, "key": 1, "value": 2}[capture_facet]
                facet_out = qkv[..., off * d : (off + 1) * d]
            return facet_out

        pre_norm_tokens = x
        if c.final_norm:
            x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)
        skip = num_prefix + c.num_register_tokens
        cls_tok = x[:, 0] if c.use_cls_token else jnp.mean(x, axis=1)
        if c.proj_dim is not None:
            # CLIP-style output projection (applied to the pooled token)
            cls_tok = nn.Dense(
                c.proj_dim, use_bias=False, dtype=c.dtype, name="proj_out"
            )(cls_tok)
        return {
            "tokens": x[:, skip:],
            "cls": cls_tok,
            "prefix": x[:, :skip],
            "pre_norm_tokens": pre_norm_tokens,
        }
