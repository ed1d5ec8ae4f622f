"""ImageBind vision trunk (the modality AnyLoc actually evaluates —
``scripts/imagebind_global_vpr.py``; the reference vendors the full
multimodal model in ``imagebind_extractor.py:1125-1597``).

Vision = ViT-H/14-like trunk: 1280-dim, 32 blocks, 16 heads, pre-norm blocks
with bias-free qkv... actually ImageBind vision uses qkv bias True, CLS token,
and a **3-D patch conv** over 2 duplicated frames for still images. For image
input the duplicated-frame 3-D conv is exactly a 2-D conv whose kernel is the
temporal sum of the 3-D kernel — the converter collapses it, so still-image
outputs are bit-equivalent to the reference's duplicated-frame path.

Other modalities (audio/text/depth/thermal/IMU): out of the VPR evaluation
path; the class raises a clear error for them (ModalityType kept for API
parity).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import dense_params, ln_params, t2np
from anyloc_tpu.models.vit import ViT, ViTConfig


class ModalityType:  # API parity (imagebind_extractor.py:1115)
    VISION = "vision"
    TEXT = "text"
    AUDIO = "audio"
    THERMAL = "thermal"
    DEPTH = "depth"
    IMU = "imu"


def imagebind_vision_config(dtype=None, img_size: int = 224) -> ViTConfig:
    kwargs = dict(
        img_size=img_size,
        patch_size=14,
        embed_dim=1280,
        depth=32,
        num_heads=16,
        mlp_type="mlp",
        layerscale_init=None,
        ln_eps=1e-6,
        pre_norm=False,
        interpolate_offset=0.0,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


def convert_imagebind_vision(sd: Dict, cfg: ViTConfig) -> Dict:
    """ImageBind checkpoint (modality_trunks.vision.* naming) -> flax params.
    The 3-D patch kernel [D, 3, 2, 14, 14] collapses over time (sum) because
    still images duplicate the frame."""
    vp = "modality_preprocessors.vision."
    vt = "modality_trunks.vision."
    k3d = t2np(sd[f"{vp}rgbt_stem.proj.1.weight"])  # [D, 3, T, p, p]
    k2d = k3d.sum(axis=2)  # exact for duplicated frames
    p: Dict = {
        "patch_embed": {"kernel": k2d.transpose(2, 3, 1, 0)},
        "cls_token": t2np(sd[f"{vp}cls_token"]),
        "pos_embed": t2np(sd[f"{vp}pos_embedding_helper.pos_embed"]),
        "norm": ln_params(sd, f"{vt}post_transformer_layer.0")
        if f"{vt}post_transformer_layer.0.weight" in sd
        else {"scale": np.ones(cfg.embed_dim, np.float32),
              "bias": np.zeros(cfg.embed_dim, np.float32)},
    }
    for i in range(cfg.depth):
        b = f"{vt}blocks.{i}"
        blk = {
            "norm1": ln_params(sd, f"{b}.norm_1"),
            "norm2": ln_params(sd, f"{b}.norm_2"),
            "attn": {
                "qkv": {
                    "kernel": t2np(sd[f"{b}.attn.in_proj_weight"]).T,
                    "bias": t2np(sd[f"{b}.attn.in_proj_bias"]),
                },
                "proj": dense_params(sd, f"{b}.attn.out_proj"),
            },
            "mlp": {
                "fc1": dense_params(sd, f"{b}.mlp.fc1"),
                "fc2": dense_params(sd, f"{b}.mlp.fc2"),
            },
        }
        p[f"blocks_{i}"] = blk
    return {"params": p}


class ImageBindVision:
    """Vision-trunk extractor: global (CLS/head) embedding or patch tokens."""

    def __init__(self, checkpoint: Optional[str] = None, dtype=jnp.bfloat16,
                 seed: int = 42):
        self.cfg = imagebind_vision_config(dtype=dtype)
        self.model = ViT(self.cfg)
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            self.params = convert_imagebind_vision(
                load_torch_checkpoint(checkpoint), self.cfg
            )
        else:
            from anyloc_tpu.models.extractor import init_params

            self.params = init_params(self.cfg, seed=seed)

        @jax.jit
        def _fwd(params, imgs):
            out = self.model.apply(params, imgs)
            return out["cls"].astype(jnp.float32), out["tokens"].astype(jnp.float32)

        self._fwd = _fwd

    def __call__(self, imgs, modality: str = ModalityType.VISION):
        if modality != ModalityType.VISION:
            raise NotImplementedError(
                f"Only the vision trunk is implemented (VPR path); got {modality}"
            )
        if imgs.ndim == 3:
            imgs = imgs[None]
        cls, tokens = self._fwd(self.params, jnp.asarray(imgs))
        return {"cls": cls, "tokens": tokens}


def imagebind_huge(checkpoint: Optional[str] = None, **kw) -> ImageBindVision:
    """Factory-name parity (imagebind_extractor.py:1567-1596)."""
    return ImageBindVision(checkpoint, **kw)
