"""SAM (Segment Anything) image encoder — ViTDet-style trunk.

The reference loads ``segment_anything.sam_model_registry`` and feeds the
image-encoder features to VLAD (AnyLoc scripts/SAM_vlad.py:140). This is the
TPU-native equivalent of that encoder:

  * patch-16 conv, learned absolute pos-embed [1, gh, gw, D], **no CLS**;
  * transformer blocks with **windowed attention** (window 14) except at the
    global-attention block indices, with decomposed relative position
    embeddings added to the logits (get_rel_pos / add_decomposed_rel_pos
    semantics from the SAM source);
  * a neck (1x1 conv -> LayerNorm2d -> 3x3 conv -> LayerNorm2d) to 256
    channels producing the [B, 64, 64, 256] feature map.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import conv_kernel, dense_params, ln_params, t2np


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    out_chans: int = 256
    mlp_ratio: float = 4.0
    dtype: object = jnp.float32


def sam_vit_b() -> SAMConfig:
    return SAMConfig(embed_dim=768, depth=12, num_heads=12,
                     global_attn_indexes=(2, 5, 8, 11))


def sam_vit_l() -> SAMConfig:
    return SAMConfig(embed_dim=1024, depth=24, num_heads=16,
                     global_attn_indexes=(5, 11, 17, 23))


def sam_vit_h() -> SAMConfig:
    return SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                     global_attn_indexes=(7, 15, 23, 31))


SAM_FACTORIES = {"vit_b": sam_vit_b, "vit_l": sam_vit_l, "vit_h": sam_vit_h}


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """SAM's decomposed relative positions: select (2*max-1) table rows for
    each (q, k) offset; linear-resize the table if too short."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SAMAttention(nn.Module):
    cfg: SAMConfig
    use_rel_pos: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, D]
        c = self.cfg
        b, h, w, d = x.shape
        nh = c.num_heads
        hd = d // nh
        qkv = nn.Dense(3 * d, dtype=c.dtype, name="qkv")(x.reshape(b, h * w, d))
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, nh, HW, hd]
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * hd ** -0.5, k,
                          preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * h - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * w - 1, hd))
            rh = get_rel_pos(h, h, rel_h.astype(jnp.float32))  # [h, h, hd]
            rw = get_rel_pos(w, w, rel_w.astype(jnp.float32))
            qr = q.reshape(b, nh, h, w, hd).astype(jnp.float32)
            bias_h = jnp.einsum("bnhwd,hkd->bnhwk", qr, rh)
            bias_w = jnp.einsum("bnhwd,wkd->bnhwk", qr, rw)
            attn = attn.reshape(b, nh, h, w, h, w)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(b, nh, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1).astype(c.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, d)
        return nn.Dense(d, dtype=c.dtype, name="proj")(out)


def window_partition(x, win):
    b, h, w, d = x.shape
    ph, pw = (win - h % win) % win, (win - w % win) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, d)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, d)
    return wins, (hp, wp)


def window_unpartition(wins, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // win // win)
    x = wins.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SAMBlock(nn.Module):
    cfg: SAMConfig
    window: int  # 0 = global attention

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, D]
        c = self.cfg
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm1")(x)
        if self.window > 0:
            hw = x.shape[1:3]
            x, pad_hw = window_partition(x, self.window)
            x = SAMAttention(c, name="attn")(x)
            x = window_unpartition(x, self.window, pad_hw, hw)
        else:
            x = SAMAttention(c, name="attn")(x)
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm2")(x)
        h = nn.Dense(int(c.embed_dim * c.mlp_ratio), dtype=c.dtype,
                     name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.embed_dim, dtype=c.dtype, name="mlp_lin2")(h)
        return x + h


class LayerNorm2d(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C], normalize over channel
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


class SAMImageEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_tokens: bool = False):
        """[B, H, W, 3] -> neck features [B, h/16, w/16, 256] (or pre-neck
        trunk tokens [B, gh*gw, D] when ``return_tokens``, the facet the VLAD
        pipeline aggregates)."""
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(x.astype(c.dtype))
        g = c.img_size // c.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, c.embed_dim))
        ph, pw = x.shape[1], x.shape[2]
        if (ph, pw) != (g, g):
            pos_r = jax.image.resize(
                pos.astype(jnp.float32), (1, ph, pw, c.embed_dim), "bicubic"
            )
        else:
            pos_r = pos
        x = x + pos_r.astype(c.dtype)
        for i in range(c.depth):
            win = 0 if i in c.global_attn_indexes else c.window_size
            x = SAMBlock(c, win, name=f"blocks_{i}")(x)
        if return_tokens:
            b = x.shape[0]
            return x.reshape(b, -1, c.embed_dim)
        y = nn.Conv(c.out_chans, (1, 1), use_bias=False, dtype=c.dtype,
                    name="neck_conv1")(x)
        y = LayerNorm2d(c.out_chans, name="neck_ln1")(y)
        y = nn.Conv(c.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=c.dtype, name="neck_conv2")(y)
        return LayerNorm2d(c.out_chans, name="neck_ln2")(y)


def convert_sam(sd: Dict, cfg: SAMConfig) -> Dict:
    """SAM checkpoint -> flax params.  Accepts the Meta image_encoder.*
    naming and the HuggingFace ``SamModel`` layout (facebook/sam-vit-*) —
    see models/hf_convert.py."""
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "sam")
    pre = "image_encoder." if any(k.startswith("image_encoder.") for k in sd) else ""
    p: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(sd[f"{pre}patch_embed.proj.weight"]),
            "bias": t2np(sd[f"{pre}patch_embed.proj.bias"]),
        },
        "pos_embed": t2np(sd[f"{pre}pos_embed"]),
        "neck_conv1": {"kernel": conv_kernel(sd[f"{pre}neck.0.weight"])},
        "neck_ln1": {"weight": t2np(sd[f"{pre}neck.1.weight"]),
                     "bias": t2np(sd[f"{pre}neck.1.bias"])},
        "neck_conv2": {"kernel": conv_kernel(sd[f"{pre}neck.2.weight"])},
        "neck_ln2": {"weight": t2np(sd[f"{pre}neck.3.weight"]),
                     "bias": t2np(sd[f"{pre}neck.3.bias"])},
    }
    for i in range(cfg.depth):
        b = f"{pre}blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln_params(sd, f"{b}.norm1"),
            "norm2": ln_params(sd, f"{b}.norm2"),
            "attn": {
                "qkv": dense_params(sd, f"{b}.attn.qkv"),
                "proj": dense_params(sd, f"{b}.attn.proj"),
                "rel_pos_h": t2np(sd[f"{b}.attn.rel_pos_h"]),
                "rel_pos_w": t2np(sd[f"{b}.attn.rel_pos_w"]),
            },
            "mlp_lin1": dense_params(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": dense_params(sd, f"{b}.mlp.lin2"),
        }
    return {"params": p}
