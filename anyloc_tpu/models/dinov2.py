"""DINOv2 family: configs + torch-checkpoint conversion.

The reference loads these via ``torch.hub.load('facebookresearch/dinov2', m)``
(utilities.py:239-240). Architecture facts mirrored here (from the public
dinov2 ``vision_transformer.py``):

  * patch 14; LayerNorm eps 1e-6; LayerScale init 1e-5 on both branches;
  * S/B/L use a 4x GELU MLP, the giant uses SwiGLU-fused with
    hidden = round8(4 * 2/3 * D) = 4096;
  * learned pos-embed on a 37x37 grid (518 px training), bicubic-interpolated
    with a 0.1 scale-offset fudge and antialias=False at other resolutions;
  * the '_reg' variants add 4 register tokens after the CLS token.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from anyloc_tpu.models.convert import conv_kernel, dense_params, ln_params, t2np
from anyloc_tpu.models.vit import ViTConfig

_DIMS = {
    # name: (embed_dim, depth, heads, mlp_type)
    "dinov2_vits14": (384, 12, 6, "mlp"),
    "dinov2_vitb14": (768, 12, 12, "mlp"),
    "dinov2_vitl14": (1024, 24, 16, "mlp"),
    "dinov2_vitg14": (1536, 40, 24, "swiglu_fused"),
}


def dinov2_config(name: str, *, num_register_tokens: int = 0, dtype=None, img_size: int = 518) -> ViTConfig:
    base = name.replace("_reg", "")
    if base not in _DIMS:
        raise ValueError(f"Unknown DINOv2 model: {name} (have {list(_DIMS)})")
    if name.endswith("_reg"):
        num_register_tokens = 4
    d, depth, heads, mlp = _DIMS[base]
    kwargs = dict(
        img_size=img_size,
        patch_size=14,
        embed_dim=d,
        depth=depth,
        num_heads=heads,
        mlp_type=mlp,
        layerscale_init=1e-5,
        ln_eps=1e-6,
        num_register_tokens=num_register_tokens,
        interpolate_offset=0.1,
        interpolate_antialias=False,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


def convert_dinov2(sd: Dict, cfg: ViTConfig) -> Dict:
    """torch DINOv2 state dict -> flax params for ``anyloc_tpu.models.ViT``.

    Accepts both the facebookresearch/dinov2 naming and the HuggingFace
    ``Dinov2Model`` layout (facebook/dinov2-*) — see models/hf_convert.py."""
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "dinov2")
    p: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": t2np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": t2np(sd["cls_token"]),
        "pos_embed": t2np(sd["pos_embed"]),
    }
    if cfg.num_register_tokens:
        p["register_tokens"] = t2np(sd["register_tokens"])
    if cfg.final_norm:
        p["norm"] = ln_params(sd, "norm")
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        if f"{pre}.norm1.weight" not in sd:
            # chunked checkpoints (dinov2 block_chunks>0) nest one level:
            # blocks.{chunk}.{i} where i stays the GLOBAL block index (the
            # BlockChunk pads leading slots with parameter-free Identity)
            for chunk in range(cfg.depth):
                cand = f"blocks.{chunk}.{i}"
                if f"{cand}.norm1.weight" in sd:
                    pre = cand
                    break
            else:
                raise KeyError(f"block {i}: no 'blocks.{i}.*' or chunked "
                               f"'blocks.<c>.{i}.*' keys in state dict")
        qkv = dense_params(sd, f"{pre}.attn.qkv")
        if cfg.tp_split:
            # split the fused [D, 3D] matrix into the three shardable towers
            # (column thirds = q|k|v; ViTConfig.tp_split)
            attn = {"proj": dense_params(sd, f"{pre}.attn.proj")}
            for t, n in enumerate(("wq", "wk", "wv")):
                attn[n] = {
                    "kernel": np.ascontiguousarray(
                        np.split(qkv["kernel"], 3, axis=1)[t]
                    ),
                    **(
                        {"bias": np.split(qkv["bias"], 3)[t]}
                        if "bias" in qkv else {}
                    ),
                }
        else:
            attn = {"qkv": qkv,
                    "proj": dense_params(sd, f"{pre}.attn.proj")}
        blk = {
            "norm1": ln_params(sd, f"{pre}.norm1"),
            "norm2": ln_params(sd, f"{pre}.norm2"),
            "attn": attn,
            "ls1": {"gamma": t2np(sd[f"{pre}.ls1.gamma"])},
            "ls2": {"gamma": t2np(sd[f"{pre}.ls2.gamma"])},
        }
        if cfg.mlp_type == "mlp":
            blk["mlp"] = {
                "fc1": dense_params(sd, f"{pre}.mlp.fc1"),
                "fc2": dense_params(sd, f"{pre}.mlp.fc2"),
            }
        elif cfg.tp_split:
            w12 = dense_params(sd, f"{pre}.mlp.w12")
            blk["mlp"] = {"w3": dense_params(sd, f"{pre}.mlp.w3")}
            for t, n in enumerate(("w1", "w2")):
                blk["mlp"][n] = {
                    "kernel": np.ascontiguousarray(
                        np.split(w12["kernel"], 2, axis=1)[t]
                    ),
                    **(
                        {"bias": np.split(w12["bias"], 2)[t]}
                        if "bias" in w12 else {}
                    ),
                }
        else:
            blk["mlp"] = {
                "w12": dense_params(sd, f"{pre}.mlp.w12"),
                "w3": dense_params(sd, f"{pre}.mlp.w3"),
            }
        p[f"blocks_{i}"] = blk
    return {"params": p}
