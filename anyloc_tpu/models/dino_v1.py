"""DINO v1 family + the dense-descriptor ``ViTExtractor`` API.

Reimplements the vendored ShirAmir/dino-vit-features extractor
(AnyLoc ``dino_extractor.py:30-348``) TPU-natively:

  * stride-patching (``patch_vit_resolution``, :141-160) is just
    ``ViTConfig.patch_stride`` — the patch conv strides densely and the
    pos-embed bicubic-resamples to the ``1 + (H - p) // s`` grid (the trunk
    already handles non-square grids natively; no monkey-patching);
  * facets come from the truncated forward instead of per-head hook
    recompute (:190-213). The reference flattens per-head facets as
    ``permute(0,2,3,1).flatten(-2)`` — i.e. head-minor (d' = dh_idx * h + head)
    — a fixed permutation of our fused-qkv slice (head-major). We reproduce
    the reference's ordering exactly for descriptor-level parity (it is
    cosine/VLAD-irrelevant, but parity is parity);
  * log-binning (:260-306) is vectorized: gather the 3^k-window average
    pools at the 9 clamped offsets per level instead of a Python loop over
    every spatial position;
  * saliency (:334-348) = layer-11 'attn' facet, heads {0,2,4,5}, CLS row,
    min-max normalized.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import (conv_kernel, dense_params, ln_params,
                                        maybe_tp_split, t2np)
from anyloc_tpu.models.vit import ViT, ViTConfig

_DIMS = {
    # name: (patch, embed_dim, depth, heads)
    "dino_vits8": (8, 384, 12, 6),
    "dino_vits16": (16, 384, 12, 6),
    "dino_vitb8": (8, 768, 12, 12),
    "dino_vitb16": (16, 768, 12, 12),
}


def dino_v1_config(name: str, stride: Optional[int] = None, dtype=None,
                   img_size: int = 224) -> ViTConfig:
    if name not in _DIMS:
        raise ValueError(f"Unknown DINO v1 model: {name} (have {list(_DIMS)})")
    p, d, depth, heads = _DIMS[name]
    if stride is not None:
        assert (p // stride) * stride == p, f"stride {stride} must divide patch {p}"
    kwargs = dict(
        img_size=img_size,
        patch_size=p,
        patch_stride=stride,
        embed_dim=d,
        depth=depth,
        num_heads=heads,
        mlp_type="mlp",
        layerscale_init=None,   # DINO v1 has no LayerScale
        ln_eps=1e-6,
        interpolate_offset=0.1,  # dino_extractor.py:127 same +0.1 fudge
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


def convert_dino_v1(sd: Dict, cfg: ViTConfig) -> Dict:
    """torch DINO v1 state dict -> flax params.  Accepts the original
    timm-style naming and the HuggingFace ``ViTModel`` layout
    (facebook/dino-vit*) — see models/hf_convert.py."""
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "dino_v1")
    p: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": t2np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": t2np(sd["cls_token"]),
        "pos_embed": t2np(sd["pos_embed"]),
        "norm": ln_params(sd, "norm"),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln_params(sd, f"{pre}.norm1"),
            "norm2": ln_params(sd, f"{pre}.norm2"),
            "attn": {
                "qkv": dense_params(sd, f"{pre}.attn.qkv"),
                "proj": dense_params(sd, f"{pre}.attn.proj"),
            },
            "mlp": {
                "fc1": dense_params(sd, f"{pre}.mlp.fc1"),
                "fc2": dense_params(sd, f"{pre}.mlp.fc2"),
            },
        }
    return maybe_tp_split({"params": p}, cfg)


def log_bin(descs: jnp.ndarray, grid: Tuple[int, int], hierarchy: int = 2) -> jnp.ndarray:
    """Vectorized log-binning (ref _log_bin, dino_extractor.py:260-306).

    descs [B, T, D] (patch tokens, row-major over ``grid``) ->
    [B, T, D * (1 + 8*hierarchy)], matching the reference's bin order:
    level 0 center first, then per level the 3x3 neighborhood offsets in
    row-major order skipping the center for k > 0; out-of-range offsets clamp
    to the nearest edge cell; pools use count_include_pad=False averaging.
    """
    b, t, d = descs.shape
    gh, gw = grid
    assert t == gh * gw, (t, grid)
    x = descs.reshape(b, gh, gw, d)

    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        if win == 1:
            pools.append(x)
            continue
        pad = win // 2
        ones = jnp.ones((1, gh, gw, 1), x.dtype)
        kernel = jnp.ones((win, win, 1, 1), x.dtype)

        def avg(v, feats):
            out = jax.lax.conv_general_dilated(
                v.transpose(0, 3, 1, 2).reshape(-1, 1, gh, gw),
                kernel.transpose(3, 2, 0, 1),
                (1, 1),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            return out.reshape(v.shape[0], feats, gh, gw).transpose(0, 2, 3, 1)

        s = avg(x, d)
        cnt = avg(ones, 1)
        pools.append(s / cnt)  # count_include_pad=False semantics

    parts = []
    ys = jnp.arange(gh)
    xs = jnp.arange(gw)
    for k in range(hierarchy):
        step = 3 ** k
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if k != 0 and dy == 0 and dx == 0:
                    continue
                iy = jnp.clip(ys + dy, 0, gh - 1)
                ix = jnp.clip(xs + dx, 0, gw - 1)
                part = pools[k][:, iy][:, :, ix]  # [B, gh, gw, D]
                parts.append(part)
    out = jnp.concatenate(parts, axis=-1)  # [B, gh, gw, D * num_bins]
    return out.reshape(b, t, -1)


class ViTExtractor:
    """API-parity dense descriptor extractor (ref dino_extractor.py:30-348).

    ``extract_descriptors(batch, layer, facet, bin, include_cls)`` takes
    channels-last [B, H, W, 3] images and returns [B, 1, T, D'] descriptors
    (the reference's shape convention).
    """

    def __init__(
        self,
        model_type: str = "dino_vits8",
        stride: int = 4,
        checkpoint: Optional[str] = None,
        dtype=jnp.float32,
        seed: int = 42,
    ) -> None:
        self.model_type = model_type
        self.cfg = dino_v1_config(model_type, stride=stride, dtype=dtype)
        self.model = ViT(self.cfg)
        self.p = self.cfg.patch_size
        self.stride = (stride, stride)
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint, strip_prefix

            sd = strip_prefix(load_torch_checkpoint(checkpoint), "module.")
            self.params = convert_dino_v1(sd, self.cfg)
        else:
            from anyloc_tpu.models.extractor import init_params

            self.params = init_params(self.cfg, seed=seed)
        self.num_patches: Optional[Tuple[int, int]] = None

    @property
    def _forward(self):
        """Lazily-built jitted truncated forward (every other extractor
        family jits; unjitted model.apply dispatches op-by-op on TPU)."""
        fn = getattr(self, "_fwd", None)
        if fn is None:
            import functools

            @functools.partial(jax.jit, static_argnames=("layer", "facet"))
            def fn(params, batch, layer, facet):
                return self.model.apply(
                    params, batch, capture_layer=layer, capture_facet=facet
                ).astype(jnp.float32)

            self._fwd = fn
        return fn

    def _grid(self, h: int, w: int) -> Tuple[int, int]:
        s = self.cfg.patch_stride or self.p
        return (1 + (h - self.p) // s, 1 + (w - self.p) // s)

    def extract_descriptors(
        self,
        batch: jnp.ndarray,
        layer: int = 11,
        facet: str = "key",
        bin: bool = False,
        include_cls: bool = False,
    ) -> jnp.ndarray:
        assert facet in ("key", "query", "value", "token"), facet
        if batch.ndim == 3:
            batch = batch[None]
        b, h, w, _ = batch.shape
        self.num_patches = self._grid(h, w)
        out = self._forward(self.params, batch, layer, facet)  # [B, 1+T, D]
        if facet != "token":
            # reference head-minor flatten: [B,h,t,dh] -> permute ->
            # [B,t,dh,h] -> flatten == reshape heads then swap
            nh, dh = self.cfg.num_heads, self.cfg.head_dim
            t = out.shape[1]
            out = out.reshape(b, t, nh, dh).transpose(0, 1, 3, 2).reshape(b, t, nh * dh)
        if not include_cls:
            out = out[:, 1:]
        else:
            assert not bin, "bin=True with include_cls=True unsupported"
        if bin:
            out = log_bin(out, self.num_patches)
        return out[:, None]  # [B, 1, T, D']

    def extract_saliency_maps(self, batch: jnp.ndarray) -> jnp.ndarray:
        """CLS attention saliency (ref :334-348). [B, H, W, 3] -> [B, T-1]."""
        assert self.model_type == "dino_vits8", \
            "saliency maps are supported only for dino_vits8"
        if batch.ndim == 3:
            batch = batch[None]
        attn = self.model.apply(
            self.params, batch, capture_layer=11, capture_facet="attn"
        )  # [B, heads, T, T]
        head_idxs = jnp.asarray([0, 2, 4, 5])
        cls_map = jnp.mean(attn[:, head_idxs, 0, 1:], axis=1)  # [B, T-1]
        mins = jnp.min(cls_map, axis=1, keepdims=True)
        maxs = jnp.max(cls_map, axis=1, keepdims=True)
        return (cls_map - mins) / (maxs - mins)
