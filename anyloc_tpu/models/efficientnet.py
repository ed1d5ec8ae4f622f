"""EfficientNet (b0-b7) backbone, TPU-native Flax.

The reference's MixVPR sub-framework offers EfficientNet as a backbone via
timm (``MixVPR/models/backbones/efficientnet.py:24``, forward_features = stem
-> 7 MBConv stages -> 1x1 head conv), selected through the helper registry
(``MixVPR/models/helper.py:26-32``).  This is the same TF-EfficientNet
architecture ``transformers`` redistributes (google/efficientnet-b*), which we
use as the zero-egress parity oracle (tests/test_mixvpr_zoo.py).

Semantics matched exactly (modeling_efficientnet.py of ``transformers``):
  * channel rounding: ``round_filters`` with depth_divisor=8 and the 10%
    round-down guard; block-repeat rounding ``ceil(depth_coefficient * n)``;
  * TF 'same' padding for the strided convs done as explicit asymmetric
    zero-pads (stem pads (0,1,0,1); depthwise stride-2 pads
    (k//2-1, k//2) per side when ``adjust``);
  * MBConv: 1x1 expand (+BN+swish) when expand_ratio != 1, depthwise conv
    (+BN+swish), squeeze-excite with ``dim_se = max(1, in_dim//4)`` computed
    from the PRE-expansion width, 1x1 project (+BN, no activation), residual
    only for within-stage repeats (stride 1, same width);
  * head: 1x1 conv to round_filters(1280) + BN + swish.  Feature map out,
    channels-last [B, h, w, C] — no pooling/classifier (the backbone crops
    them, efficientnet.py:41-42).

BatchNorm carries ``sync_axis`` for cross-device stats under a mesh, same as
models/resnet.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import conv_kernel, t2np


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    depth_divisor: int = 8
    # per-stage base geometry (b0; scaled by the coefficients)
    in_channels: Tuple[int, ...] = (32, 16, 24, 40, 80, 112, 192)
    out_channels: Tuple[int, ...] = (16, 24, 40, 80, 112, 192, 320)
    kernel_sizes: Tuple[int, ...] = (3, 3, 5, 3, 5, 5, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 1, 2, 1)
    expand_ratios: Tuple[int, ...] = (1, 6, 6, 6, 6, 6, 6)
    num_block_repeats: Tuple[int, ...] = (1, 2, 2, 3, 3, 4, 1)
    se_ratio: float = 0.25
    bn_eps: float = 1e-3
    dtype: Any = jnp.float32
    sync_axis: Optional[str] = None

    def round_filters(self, n: int) -> int:
        d = self.depth_divisor
        n *= self.width_coefficient
        new = max(d, int(n + d / 2) // d * d)
        if new < 0.9 * n:
            new += d
        return int(new)

    def round_repeats(self, n: int) -> int:
        return int(math.ceil(self.depth_coefficient * n))

    @property
    def hidden_dim(self) -> int:
        return self.round_filters(1280)

    def block_plan(self):
        """Flattened per-block (in, out, stride, kernel, expand, id_skip)."""
        plan = []
        for i in range(len(self.in_channels)):
            in_dim = self.round_filters(self.in_channels[i])
            out_dim = self.round_filters(self.out_channels[i])
            for j in range(self.round_repeats(self.num_block_repeats[i])):
                plan.append((
                    out_dim if j > 0 else in_dim,
                    out_dim,
                    1 if j > 0 else self.strides[i],
                    self.kernel_sizes[i],
                    self.expand_ratios[i],
                    j == 0,  # id_skip: first block of a stage has NO residual
                ))
        return plan


# (width, depth) per variant — the standard compound-scaling table.
_COEFFS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}


def efficientnet_config(variant: str = "b0", **kw) -> EfficientNetConfig:
    w, d = _COEFFS[variant]
    return EfficientNetConfig(width_coefficient=w, depth_coefficient=d, **kw)


class _BN(nn.Module):
    cfg: EfficientNetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99,
            epsilon=self.cfg.bn_eps, dtype=self.cfg.dtype,
            axis_name=self.cfg.sync_axis, name="bn",
        )(x)


def _swish(x):
    return x * nn.sigmoid(x)


class MBConvBlock(nn.Module):
    cfg: EfficientNetConfig
    in_dim: int
    out_dim: int
    stride: int
    kernel: int
    expand_ratio: int
    id_skip: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        inputs = x
        expand = self.expand_ratio != 1
        mid = self.in_dim * self.expand_ratio
        if expand:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=c.dtype,
                        name="expand_conv")(x)
            x = _BN(c, name="expand_bn")(x, train)
            x = _swish(x)
        # depthwise: TF-'same' via explicit asymmetric pad for stride 2
        k = self.kernel
        if self.stride == 2:
            p = (k // 2 - 1, k // 2)
            x = jnp.pad(x, ((0, 0), p, p, (0, 0)))
            pad = "VALID"
        else:
            pad = "SAME"
        x = nn.Conv(mid, (k, k), (self.stride, self.stride), padding=pad,
                    feature_group_count=mid, use_bias=False, dtype=c.dtype,
                    name="dw_conv")(x)
        x = _BN(c, name="dw_bn")(x, train)
        x = _swish(x)
        # squeeze-excite (reduction computed from PRE-expansion width)
        dim_se = max(1, int(self.in_dim * c.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(dim_se, (1, 1), dtype=c.dtype, name="se_reduce")(s)
        s = _swish(s)
        s = nn.Conv(mid, (1, 1), dtype=c.dtype, name="se_expand")(s)
        x = x * nn.sigmoid(s)
        # project
        x = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=c.dtype,
                    name="project_conv")(x)
        x = _BN(c, name="project_bn")(x, train)
        if self.stride == 1 and not self.id_skip:
            x = x + inputs  # drop-connect is identity at inference
        return x


class EfficientNet(nn.Module):
    """Stem + MBConv stages + head conv: [B, H, W, 3] -> [B, h, w, C]."""

    cfg: EfficientNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = x.astype(c.dtype)
        # stem: TF-'same' for 3x3 stride-2 == pad (0,1) per spatial side
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.Conv(c.round_filters(32), (3, 3), (2, 2), padding="VALID",
                    use_bias=False, dtype=c.dtype, name="stem_conv")(x)
        x = _BN(c, name="stem_bn")(x, train)
        x = _swish(x)
        for i, (ind, outd, s, k, e, skip) in enumerate(c.block_plan()):
            x = MBConvBlock(c, ind, outd, s, k, e, skip,
                            name=f"block_{i}")(x, train)
        x = nn.Conv(c.hidden_dim, (1, 1), use_bias=False, dtype=c.dtype,
                    name="top_conv")(x)
        x = _BN(c, name="top_bn")(x, train)
        return _swish(x)

    @property
    def out_channels(self) -> int:
        return self.cfg.hidden_dim


def convert_hf_efficientnet(sd: Dict, cfg: EfficientNetConfig) -> Dict:
    """transformers EfficientNetModel state dict -> flax params/batch_stats.

    Handles the optional ``efficientnet.`` prefix of the full-model export.
    """
    if any(k.startswith("efficientnet.") for k in sd):
        sd = {k[len("efficientnet."):]: v for k, v in sd.items()
              if k.startswith("efficientnet.")}

    params: Dict = {}
    stats: Dict = {}

    def bn(src):
        return (
            {"bn": {"scale": t2np(sd[f"{src}.weight"]),
                    "bias": t2np(sd[f"{src}.bias"])}},
            {"bn": {"mean": t2np(sd[f"{src}.running_mean"]),
                    "var": t2np(sd[f"{src}.running_var"])}},
        )

    def conv(src, bias=False):
        p = {"kernel": conv_kernel(sd[f"{src}.weight"])}
        if bias:
            p["bias"] = t2np(sd[f"{src}.bias"])
        return p

    params["stem_conv"] = conv("embeddings.convolution")
    params["stem_bn"], stats["stem_bn"] = bn("embeddings.batchnorm")

    for i, (_, _, _, _, e, _) in enumerate(cfg.block_plan()):
        f, t = f"block_{i}", f"encoder.blocks.{i}"
        p: Dict = {}
        s: Dict = {}
        if e != 1:
            p["expand_conv"] = conv(f"{t}.expansion.expand_conv")
            p["expand_bn"], s["expand_bn"] = bn(f"{t}.expansion.expand_bn")
        # HF's depthwise weight is [C, 1, kh, kw] -> flax [kh, kw, 1, C]
        p["dw_conv"] = conv(f"{t}.depthwise_conv.depthwise_conv")
        p["dw_bn"], s["dw_bn"] = bn(f"{t}.depthwise_conv.depthwise_norm")
        p["se_reduce"] = conv(f"{t}.squeeze_excite.reduce", bias=True)
        p["se_expand"] = conv(f"{t}.squeeze_excite.expand", bias=True)
        p["project_conv"] = conv(f"{t}.projection.project_conv")
        p["project_bn"], s["project_bn"] = bn(f"{t}.projection.project_bn")
        params[f], stats[f] = p, s

    params["top_conv"] = conv("encoder.top_conv")
    params["top_bn"], stats["top_bn"] = bn("encoder.top_bn")

    return {"params": params, "batch_stats": stats}
