"""CosPlace-finetuned HF-ViT extractor (AnyLoc ``utilities.py:134-211``
``CosPlaceViTExtractFeatures``): a HuggingFace ``ViTModel`` (vit-base-224
layout: LN eps 1e-12, separate q/k/v Linears, learned pos-embeds) loaded from
a CosPlace checkpoint, with facets hooked from the q/k/v Linears or the block
output.

Here the same trunk serves (HF's separate q/k/v fuse into our qkv kernel —
the fused slice IS the per-projection output), and facets come from the
truncated forward.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import (conv_kernel, dense_params, ln_params,
                                        maybe_tp_split, t2np)
from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
from anyloc_tpu.models.vit import ViTConfig


def hf_vit_config(dtype=None, img_size: int = 224) -> ViTConfig:
    kwargs = dict(
        img_size=img_size,
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        mlp_type="mlp",
        layerscale_init=None,
        ln_eps=1e-12,  # HF ViTConfig default layer_norm_eps
        interpolate_offset=0.0,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


def convert_hf_vit(sd: Dict, cfg: ViTConfig) -> Dict:
    """HF ViTModel state dict -> flax params (q/k/v Linears fused)."""
    pre = "vit." if any(k.startswith("vit.") for k in sd) else ""
    p: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(
                sd[f"{pre}embeddings.patch_embeddings.projection.weight"]
            ),
            "bias": t2np(sd[f"{pre}embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": t2np(sd[f"{pre}embeddings.cls_token"]),
        "pos_embed": t2np(sd[f"{pre}embeddings.position_embeddings"]),
        "norm": ln_params(sd, f"{pre}layernorm"),
    }
    for i in range(cfg.depth):
        b = f"{pre}encoder.layer.{i}"
        qw = t2np(sd[f"{b}.attention.attention.query.weight"])
        kw = t2np(sd[f"{b}.attention.attention.key.weight"])
        vw = t2np(sd[f"{b}.attention.attention.value.weight"])
        qb = t2np(sd[f"{b}.attention.attention.query.bias"])
        kb = t2np(sd[f"{b}.attention.attention.key.bias"])
        vb = t2np(sd[f"{b}.attention.attention.value.bias"])
        p[f"blocks_{i}"] = {
            "norm1": ln_params(sd, f"{b}.layernorm_before"),
            "norm2": ln_params(sd, f"{b}.layernorm_after"),
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([qw, kw, vw], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb]),
                },
                "proj": dense_params(sd, f"{b}.attention.output.dense"),
            },
            "mlp": {
                "fc1": dense_params(sd, f"{b}.intermediate.dense"),
                "fc2": dense_params(sd, f"{b}.output.dense"),
            },
        }
    return maybe_tp_split({"params": p}, cfg)


class CosPlaceViTExtractFeatures(ViTFacetExtractor):
    """API parity with utilities.py:138-211: ``(ckpt_path, layer, facet,
    use_cls, norm_descs)``."""

    def __init__(
        self,
        ckpt_path: Optional[str],
        layer: int,
        facet: str = "value",
        use_cls: bool = False,
        norm_descs: bool = True,
        device=None,
        dtype=jnp.bfloat16,
        seed: int = 42,
    ) -> None:
        del device
        cfg = hf_vit_config(dtype=dtype)
        if ckpt_path is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            params = convert_hf_vit(load_torch_checkpoint(ckpt_path), cfg)
        else:
            params = init_params(cfg, seed=seed)
        super().__init__(cfg, params, layer, facet, use_cls=use_cls,
                         norm_descs=norm_descs)
