"""MixVPR inference model (reference MixVPR/mixer_top_k_vpr.py:29-118
``VPRModel``): ResNet backbone (layers 1-3, i.e. conv4 truncation) feeding the
MixVPR feature-mixer aggregator."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from anyloc_tpu.models.resnet import ResNet, resnet50_config
from anyloc_tpu.training.aggregators import MixVPRHead


class VPRModel(nn.Module):
    backbone: str = "resnet50"
    out_channels: int = 1024
    out_rows: int = 4
    mixer_depth: int = 4
    sync_axis: Optional[str] = None

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = resnet50_config(truncate="conv4", sync_axis=self.sync_axis)
        fmap = ResNet(cfg, name="backbone")(imgs, train=train)  # [B, h, w, 1024]
        b, h, w, d = fmap.shape
        tokens = fmap.reshape(b, h * w, d)
        return MixVPRHead(
            out_channels=self.out_channels,
            out_rows=self.out_rows,
            depth=self.mixer_depth,
            name="aggregator",
        )(tokens)
