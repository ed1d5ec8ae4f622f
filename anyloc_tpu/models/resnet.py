"""ResNet / VGG backbones for the trained baselines.

TPU-native counterparts of dvgl_benchmark's torchvision backbones
(``model/network.py:106-186``: resnet18/50/101 truncated at conv4 or conv5,
vgg16 truncated at the last conv, with the early layers frozen). BatchNorm
carries an optional ``axis_name`` so that under a device mesh the batch
statistics reduce across the 'data' axis — this *is* sync-BN
(``model/sync_batchnorm/`` in the reference, ~600 LoC of master-slave
reduction code, replaced by one collective argument).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from anyloc_tpu.models.convert import conv_kernel, t2np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    bottleneck: bool = False
    width: int = 64
    # "conv4" drops the last stage (dvgl layers_to_crop=[4]); "conv3" also
    # drops layer3 (MixVPR backbones/resnet.py:77-80 layers_to_crop=[3,4])
    truncate: str = "conv5"
    dtype: Any = jnp.float32
    sync_axis: Optional[str] = None  # mesh axis for cross-device BN stats


def resnet18_config(**kw) -> ResNetConfig:
    return ResNetConfig(stage_sizes=(2, 2, 2, 2), bottleneck=False, **kw)


def resnet50_config(**kw) -> ResNetConfig:
    return ResNetConfig(stage_sizes=(3, 4, 6, 3), bottleneck=True, **kw)


def resnet101_config(**kw) -> ResNetConfig:
    return ResNetConfig(stage_sizes=(3, 4, 23, 3), bottleneck=True, **kw)



_TRUNCATE_STAGES = {"conv3": 2, "conv4": 3, "conv5": 4}


def _n_stages(truncate: str) -> int:
    return _TRUNCATE_STAGES[truncate]

class _BN(nn.Module):
    dtype: Any
    sync_axis: Optional[str]

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.sync_axis,  # psum over mesh => sync-BN
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    cfg: ResNetConfig
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=c.dtype, name="conv1")(x)
        y = _BN(c.dtype, c.sync_axis, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=c.dtype, name="conv2")(y)
        y = _BN(c.dtype, c.sync_axis, name="bn2")(y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=c.dtype, name="downsample_conv")(x)
            residual = _BN(c.dtype, c.sync_axis, name="downsample_bn")(
                residual, train
            )
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    cfg: ResNetConfig
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=c.dtype,
                    name="conv1")(x)
        y = _BN(c.dtype, c.sync_axis, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=c.dtype, name="conv2")(y)
        y = _BN(c.dtype, c.sync_axis, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=c.dtype,
                    name="conv3")(y)
        y = _BN(c.dtype, c.sync_axis, name="bn3")(y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=c.dtype, name="downsample_conv")(x)
            residual = _BN(c.dtype, c.sync_axis, name="downsample_bn")(
                residual, train
            )
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Truncated ResNet feature extractor: [B, H, W, 3] -> [B, h, w, C]."""

    cfg: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = x.astype(c.dtype)
        x = nn.Conv(c.width, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=c.dtype, name="conv1")(x)
        x = _BN(c.dtype, c.sync_axis, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        block = BottleneckBlock if c.bottleneck else BasicBlock
        n_stages = _n_stages(c.truncate)
        for stage in range(n_stages):
            filters = c.width * (2 ** stage)
            for i in range(c.stage_sizes[stage]):
                strides = 2 if (stage > 0 and i == 0) else 1
                x = block(c, filters, strides,
                          name=f"layer{stage + 1}_{i}")(x, train)
        return x

    @property
    def out_channels(self) -> int:
        mult = 4 if self.cfg.bottleneck else 1
        n_stages = _n_stages(self.cfg.truncate)
        return self.cfg.width * (2 ** (n_stages - 1)) * mult


class VGG16(nn.Module):
    """VGG-16 features truncated at the last conv (dvgl network.py:121-129)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        cfgs = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512]
        x = x.astype(self.dtype)
        i = 0
        for v in cfgs:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{i}")(x)
                x = nn.relu(x)
                i += 1
        return x

    out_channels = 512


class AlexNet(nn.Module):
    """AlexNet ``features[:-2]`` — the dvgl backbone variant
    (dvgl_benchmark/model/network.py:139-145): torchvision's feature stack
    truncated before the final ReLU+MaxPool, ending at the last 256-channel
    conv. Channels-last Flax; MaxPool2d(3, 2) floor semantics == VALID."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = x.astype(self.dtype)
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2,
                    dtype=self.dtype, name="conv_0")(x)
        x = nn.max_pool(nn.relu(x), (3, 3), (2, 2))
        x = nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv_1")(x)
        x = nn.max_pool(nn.relu(x), (3, 3), (2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="conv_3")(x))
        return nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_4")(x)

    out_channels = 256


def convert_torchvision_alexnet(sd: Dict) -> Dict:
    """torchvision alexnet state dict -> AlexNet flax params (the five
    feature convs at indices 0, 3, 6, 8, 10)."""
    from anyloc_tpu.models.convert import conv_kernel, t2np

    params: Dict = {}
    for i, idx in enumerate((0, 3, 6, 8, 10)):
        params[f"conv_{i}"] = {
            "kernel": conv_kernel(sd[f"features.{idx}.weight"]),
            "bias": t2np(sd[f"features.{idx}.bias"]),
        }
    return {"params": params}


def convert_torchvision_resnet(sd: Dict, cfg: ResNetConfig) -> Dict:
    """torchvision resnet state dict -> flax params/batch_stats trees."""
    params: Dict = {}
    stats: Dict = {}

    def bn(prefix):
        return (
            {"bn": {"scale": t2np(sd[f"{prefix}.weight"]),
                    "bias": t2np(sd[f"{prefix}.bias"])}},
            {"bn": {"mean": t2np(sd[f"{prefix}.running_mean"]),
                    "var": t2np(sd[f"{prefix}.running_var"])}},
        )

    params["conv1"] = {"kernel": conv_kernel(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = bn("bn1")
    n_stages = _n_stages(cfg.truncate)
    convs = ["conv1", "conv2"] + (["conv3"] if cfg.bottleneck else [])
    for stage in range(n_stages):
        for i in range(cfg.stage_sizes[stage]):
            t = f"layer{stage + 1}.{i}"
            f = f"layer{stage + 1}_{i}"
            params[f], stats[f] = {}, {}
            for j, cname in enumerate(convs, start=1):
                params[f][f"conv{j}"] = {
                    "kernel": conv_kernel(sd[f"{t}.conv{j}.weight"])
                }
                params[f][f"bn{j}"], stats[f][f"bn{j}"] = bn(f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                params[f]["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{t}.downsample.0.weight"])
                }
                params[f]["downsample_bn"], stats[f]["downsample_bn"] = bn(
                    f"{t}.downsample.1"
                )
    return {"params": params, "batch_stats": stats}
