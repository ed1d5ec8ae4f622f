"""SwinV2 backbone, TPU-native Flax.

The reference's MixVPR sub-framework offers Swin (V1/V2) as a backbone via
timm (``MixVPR/models/backbones/swin.py:24``, default
``swinv2_base_window12to16_192to256_22kft1k``), selected through the helper
registry (``MixVPR/models/helper.py:34-37``); its wrapper reshapes
forward_features' [B, L, C] tokens into a square feature map (swin.py:51-56).
``transformers``' Swinv2Model is the zero-egress parity oracle
(tests/test_mixvpr_zoo.py).

SwinV2 semantics matched exactly (modeling_swinv2.py):
  * res-POST-norm blocks: ``x + LN(attn(x))`` and ``x + LN(mlp(x))``;
  * cosine attention: L2-normalized q/k dot products scaled by a learned
    per-head ``exp(clamp(logit_scale, max=log(100)))``;
  * continuous relative position bias: log-spaced relative-coordinate table
    through an MLP (Linear(2,512)+ReLU+Linear(512,heads,no-bias)), then
    ``16*sigmoid``;
  * separate q/k/v projections, the key WITHOUT bias;
  * per-stage window/shift shrink when the resolution <= window;
  * shifted windows via cyclic roll + a static additive mask (-100);
  * patch merging: 2x2 quadrant concat -> Linear(4C->2C, no bias) -> LN
    (norm AFTER reduction — the v2 order);
  * final LayerNorm over the last stage's tokens.

All spatial bookkeeping (window padding, shift sizes, merge padding) is
static Python arithmetic — one XLA program per image size, no dynamic
shapes. Channels-last [B, H, W, 3] in; both the token sequence and the
square feature map ([B, h, w, C], the MixVPR wrapper's output) come back.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import t2np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 256
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-5
    # per-stage window size the CPB table was trained at; 0 = this window
    # (the timm base ckpt is window12to16 -> (12, 12, 12, 12))
    pretrained_window_sizes: Tuple[int, ...] = (0, 0, 0, 0)
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def swinv2_base_config(**kw) -> SwinConfig:
    """timm swinv2_base_window12to16_192to256_22kft1k geometry
    (MixVPR's default Swin: 256 px, window 16, C=1024 out)."""
    kw.setdefault("embed_dim", 128)
    kw.setdefault("depths", (2, 2, 18, 2))
    kw.setdefault("num_heads", (4, 8, 16, 32))
    kw.setdefault("window_size", 16)
    kw.setdefault("pretrained_window_sizes", (12, 12, 12, 12))
    return SwinConfig(**kw)


def _log_coords_table(ws: Tuple[int, int], pretrained: int = 0) -> np.ndarray:
    """[1, 2wh-1, 2ww-1, 2] log-spaced relative coordinates (CPB input).

    ``pretrained`` > 0 normalizes by the training-time window instead of the
    current one (Swinv2SelfAttention, modeling_swinv2.py:437-442)."""
    ch = np.arange(-(ws[0] - 1), ws[0], dtype=np.float64)
    cw = np.arange(-(ws[1] - 1), ws[1], dtype=np.float64)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"), -1)[None]
    if pretrained > 0:
        table[..., 0] /= pretrained - 1
        table[..., 1] /= pretrained - 1
    elif ws[0] > 1:
        table[..., 0] /= ws[0] - 1
        table[..., 1] /= ws[1] - 1
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def _relative_position_index(ws: Tuple[int, int]) -> np.ndarray:
    """[N, N] indices into the flattened (2wh-1)x(2ww-1) bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws[0]), np.arange(ws[1]), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 0] *= 2 * ws[1] - 1
    return rel.sum(-1)


def _shift_mask(hp: int, wp: int, ws: int, ss: int) -> np.ndarray:
    """Static [nW, N, N] additive mask for shifted-window attention."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[hs, wsl] = cnt
            cnt += 1
    m = img.reshape(hp // ws, ws, wp // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    window: Tuple[int, int]
    pretrained: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[np.ndarray]) -> jnp.ndarray:
        # x: [Bw, N, C] (windows flattened into batch)
        c = self.cfg
        bw, n, _ = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=c.qkv_bias, dtype=c.dtype,
                     name="query")(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=c.dtype, name="key")(x)
        v = nn.Dense(self.dim, use_bias=c.qkv_bias, dtype=c.dtype,
                     name="value")(x)
        q, k, v = (t.reshape(bw, n, self.heads, hd).transpose(0, 2, 1, 3)
                   for t in (q, k, v))

        # cosine attention with learned per-head temperature
        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(
            jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        scores = jnp.einsum("bhnd,bhmd->bhnm", qn, kn)
        logit_scale = self.param(
            "logit_scale",
            lambda _: jnp.log(10.0 * jnp.ones((self.heads, 1, 1))),
        )
        scores = scores * jnp.exp(
            jnp.clip(logit_scale, None, math.log(100.0)))

        # continuous position bias
        table = jnp.asarray(_log_coords_table(self.window, self.pretrained))
        h = nn.Dense(512, dtype=c.dtype, name="cpb_fc1")(table)
        h = nn.relu(h)
        bias_table = nn.Dense(self.heads, use_bias=False, dtype=c.dtype,
                              name="cpb_fc2")(h).reshape(-1, self.heads)
        idx = _relative_position_index(self.window).reshape(-1)
        bias = bias_table[idx].reshape(n, n, self.heads)
        bias = 16.0 * nn.sigmoid(bias.transpose(2, 0, 1))
        scores = scores + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            scores = scores.reshape(bw // nw, nw, self.heads, n, n)
            scores = scores + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(bw, self.heads, n, n)

        probs = nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        return nn.Dense(self.dim, dtype=c.dtype, name="proj")(ctx)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    resolution: Tuple[int, int]  # runtime feature-map size (pad/partition)
    cfg_resolution: Tuple[int, int]  # config-declared size (window geometry)
    shift: bool
    pretrained: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h, w = self.resolution
        b, _, ch = x.shape
        # Window/shift come from the CONFIG resolution, not the runtime one
        # (Swinv2Layer._compute_window_shift is evaluated at __init__ from
        # grid_size // 2^stage): a checkpoint keeps its trained window even
        # when fed smaller inputs — the runtime map is padded instead.
        # HF collapses the per-dim result to dim 0 (self.window_size =
        # window_size[0]); mirrored exactly.
        rh, rw = self.cfg_resolution
        win = [r if r <= c.window_size else c.window_size for r in (rh, rw)]
        ws = win[0]
        ss = (c.window_size // 2) if (self.shift and rh > win[0]) else 0

        shortcut = x
        x = x.reshape(b, h, w, ch)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
        # window partition
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, ch)
        mask = _shift_mask(hp, wp, ws, ss) if ss > 0 else None
        x = WindowAttention(c, self.dim, self.heads, (ws, ws),
                            self.pretrained, name="attn")(x, mask)
        # window reverse
        x = x.reshape(b, hp // ws, wp // ws, ws, ws, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, ch)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = x.reshape(b, h * w, ch)
        # res-post-norm (v2): residual AFTER the LayerNorm of the branch
        x = shortcut + nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                                    name="norm1")(x)

        y = nn.Dense(int(c.mlp_ratio * self.dim), dtype=c.dtype,
                     name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=c.dtype, name="fc2")(y)
        return x + nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                                name="norm2")(y)


class PatchMerging(nn.Module):
    cfg: SwinConfig
    dim: int
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h, w = self.resolution
        b, _, ch = x.shape
        x = x.reshape(b, h, w, ch)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.reshape(b, -1, 4 * ch)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=c.dtype,
                     name="reduction")(x)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)


class SwinV2(nn.Module):
    """SwinV2 trunk: [B, H, W, 3] -> {'tokens': [B, L, C], 'fmap': [B,h,w,C]}."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        x = x.astype(c.dtype)
        b = x.shape[0]
        ps = c.patch_size
        x = nn.Conv(c.embed_dim, (ps, ps), (ps, ps), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, c.embed_dim)
        # HF's Swinv2Embeddings.norm is nn.LayerNorm(embed_dim) with the
        # DEFAULT eps (1e-5) — it does NOT honor config.layer_norm_eps
        # (modeling_swinv2.py:235); keep the quirk for checkpoint parity.
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="embed_norm")(x)

        # config-declared per-stage resolutions drive the window geometry
        # (Swinv2Encoder: grid_size // 2**stage, floor division)
        cg = c.img_size // ps
        ch_res, cw_res = cg, cg
        for i, depth in enumerate(c.depths):
            dim = c.embed_dim * 2 ** i
            for j in range(depth):
                x = SwinBlock(c, dim, c.num_heads[i], (h, w),
                              (ch_res, cw_res), shift=j % 2 == 1,
                              pretrained=c.pretrained_window_sizes[i],
                              name=f"stage_{i}_block_{j}")(x)
            if i < len(c.depths) - 1:
                x = PatchMerging(c, dim, (h, w),
                                 name=f"stage_{i}_merge")(x)
                h, w = (h + 1) // 2, (w + 1) // 2
                ch_res, cw_res = ch_res // 2, cw_res // 2

        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="final_norm")(x)
        return {"tokens": x, "fmap": x.reshape(b, h, w, -1)}

    @property
    def out_channels(self) -> int:
        return self.cfg.out_channels


def convert_hf_swinv2(sd: Dict, cfg: SwinConfig) -> Dict:
    """transformers Swinv2Model state dict -> SwinV2 flax params."""
    if any(k.startswith("swinv2.") for k in sd):
        sd = {k[len("swinv2."):]: v for k, v in sd.items()
              if k.startswith("swinv2.")}

    def lin(src):
        p = {"kernel": t2np(sd[f"{src}.weight"]).T}
        if f"{src}.bias" in sd:
            p["bias"] = t2np(sd[f"{src}.bias"])
        return p

    def ln(src):
        return {"scale": t2np(sd[f"{src}.weight"]),
                "bias": t2np(sd[f"{src}.bias"])}

    params: Dict = {
        "patch_embed": {
            "kernel": t2np(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": t2np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "embed_norm": ln("embeddings.norm"),
        "final_norm": ln("layernorm"),
    }
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            t = f"encoder.layers.{i}.blocks.{j}"
            params[f"stage_{i}_block_{j}"] = {
                "attn": {
                    "query": lin(f"{t}.attention.self.query"),
                    "key": lin(f"{t}.attention.self.key"),
                    "value": lin(f"{t}.attention.self.value"),
                    "logit_scale": t2np(sd[f"{t}.attention.self.logit_scale"]),
                    "cpb_fc1": lin(
                        f"{t}.attention.self.continuous_position_bias_mlp.0"),
                    "cpb_fc2": lin(
                        f"{t}.attention.self.continuous_position_bias_mlp.2"),
                    "proj": lin(f"{t}.attention.output.dense"),
                },
                "norm1": ln(f"{t}.layernorm_before"),
                "fc1": lin(f"{t}.intermediate.dense"),
                "fc2": lin(f"{t}.output.dense"),
                "norm2": ln(f"{t}.layernorm_after"),
            }
        if i < len(cfg.depths) - 1:
            t = f"encoder.layers.{i}.downsample"
            params[f"stage_{i}_merge"] = {
                "reduction": lin(f"{t}.reduction"),
                "norm": ln(f"{t}.norm"),
            }
    return {"params": params}
