"""GeoLocalizationNet — backbone + learned aggregation
(dvgl_benchmark/model/network.py:29-56 + model/aggregation.py), TPU-native.

Backbones: resnet18/50/101 (conv4|conv5 truncation), vgg16, and the ViT trunk
(token output, network.py:189-198 VitWrapper). Aggregations: mac / spoc / gem /
rmac / netvlad / crn / rrm — CNN feature maps are channels-last [B, h, w, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from anyloc_tpu.ops.common import l2_normalize
from anyloc_tpu.ops.gem import gem_pool_spatial
from anyloc_tpu.ops.pooling import mac_spatial, rmac_spatial, spoc_spatial
from anyloc_tpu.models.resnet import (
    AlexNet,
    ResNet,
    ResNetConfig,
    VGG16,
    resnet18_config,
    resnet50_config,
    resnet101_config,
)
from anyloc_tpu.training.aggregators import NetVLAD


class CRNModule(nn.Module):
    """Contextual reweighting mask (aggregation.py:178-241): downsample pool,
    multiscale context convs (32+32+20), frozen all-ones accumulation conv,
    bilinear upsample back."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, h, w, C] -> [B, h, w, 1]
        b, h, w, _ = x.shape
        # AvgPool2d(kernel 3, stride 2, ceil_mode): pad so output = ceil((n-3)/2)+1
        ph = (-(h - 3)) % 2
        pw = (-(w - 3)) % 2
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        down = nn.avg_pool(xp, (3, 3), (2, 2))
        g3 = nn.Conv(32, (3, 3), padding=1, name="filter_3_3")(down)
        g5 = nn.Conv(32, (5, 5), padding=2, name="filter_5_5")(down)
        g7 = nn.Conv(20, (7, 7), padding=3, name="filter_7_7")(down)
        g = nn.relu(jnp.concatenate([g3, g5, g7], axis=-1))
        # accumulation conv is frozen at ones/zero-bias in the reference
        wacc = nn.relu(jnp.sum(g, axis=-1, keepdims=True))
        mask = jax.image.resize(
            wacc, (b, down.shape[1] * 2, down.shape[2] * 2, 1), "bilinear"
        )
        return mask[:, :h, :w]


class CRN(nn.Module):
    """NetVLAD with CRN-mask-weighted soft assignment (aggregation.py:244-259)."""

    num_clusters: int = 64
    dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, h, w, C]
        b, h, w, d = x.shape
        x = l2_normalize(x, axis=-1)  # normalize_input across channels
        mask = CRNModule(self.dim, name="crn")(x)  # [B, h, w, 1]
        tokens = x.reshape(b, h * w, d)
        logits = nn.Dense(self.num_clusters, use_bias=True, name="assign")(tokens)
        a = jax.nn.softmax(logits, axis=-1)
        a = a * mask.reshape(b, h * w, 1)
        centroids = self.param(
            "centroids", nn.initializers.normal(1.0 / jnp.sqrt(d)),
            (self.num_clusters, d),
        )
        wsum = jnp.einsum("bnc,bnd->bcd", a, tokens)
        acount = jnp.sum(a, axis=1)
        v = wsum - acount[..., None] * centroids[None]
        v = l2_normalize(v, axis=-1)
        return l2_normalize(v.reshape(b, -1), axis=-1)


class RRM(nn.Module):
    """Residual retrieval module (aggregation.py:58-81): GAP -> LN -> MLP
    residual -> LN -> L2."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, h, w, C]
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(name="ln1")(x)
        out = nn.Dense(self.dim, name="fc1")(x)
        out = nn.relu(out)
        out = nn.Dense(self.dim, name="fc2")(out)
        out = out + x
        return l2_normalize(nn.LayerNorm(name="ln2")(out), axis=-1)


_RESNETS = {
    "resnet18conv4": (resnet18_config, "conv4"),
    "resnet18conv5": (resnet18_config, "conv5"),
    "resnet50conv4": (resnet50_config, "conv4"),
    "resnet50conv5": (resnet50_config, "conv5"),
    "resnet101conv4": (resnet101_config, "conv4"),
    "resnet101conv5": (resnet101_config, "conv5"),
}


class GeoLocalizationNet(nn.Module):
    """backbone + aggregation -> L2-normalized global descriptor.

    Backbones: resnet18/50/101 conv4|conv5, vgg16, alexnet (CNN feature
    maps), plus the token backbones of dvgl network.py:106-198 — cct384
    (Compact Convolutional Transformer, truncatable via ``trunc_te``) and
    vit (HF ViT-Base geometry; tokens for netvlad/gem, CLS otherwise —
    VitWrapper semantics, network.py:189-198)."""

    backbone: str = "resnet18conv4"
    aggregation: str = "netvlad"
    netvlad_clusters: int = 64
    fc_output_dim: Optional[int] = None  # optional linear head (CosPlace-style)
    gem_p: float = 3.0
    sync_axis: Optional[str] = None
    # token-backbone truncation: keep transformer blocks [0, trunc_te)
    # (reference --trunc_te; --freeze_te is an optimizer-mask concern here,
    # see train_cli)
    trunc_te: Optional[int] = None
    # jax.checkpoint each ViT block (backward memory lever for training the
    # token backbones; no effect on CNN backbones or inference)
    remat: bool = False

    def _backbone(self):
        if self.backbone in _RESNETS:
            fac, trunc = _RESNETS[self.backbone]
            cfg = fac(truncate=trunc, sync_axis=self.sync_axis)
            return ResNet(cfg, name="backbone"), ResNet(cfg).out_channels
        if self.backbone == "vgg16":
            return VGG16(name="backbone"), 512
        if self.backbone == "alexnet":
            return AlexNet(name="backbone"), 256
        raise ValueError(f"Unknown backbone {self.backbone}")

    def _token_backbone(self, imgs, train):
        """cct384 / vit: returns (tokens [B,T,D] or None, pooled [B,D] or
        None, channels)."""
        del train
        # reference parser.py:143-152 blocks spatial-map aggregators with
        # token backbones (and seqpool with ViT — it's CCT's native pool);
        # enforce at the model level too so the Python API can't silently
        # fall through to a different aggregator
        allowed = (
            ("netvlad", "gem", "cls", "seqpool")
            if self.backbone.startswith("cct") else ("netvlad", "gem", "cls")
        )
        if self.aggregation not in allowed:
            raise ValueError(
                f"{self.backbone} can't work with aggregation "
                f"{self.aggregation}; use one among {list(allowed)}"
            )
        agg_wants_tokens = self.aggregation in ("netvlad", "gem")
        if self.backbone.startswith("cct"):
            if self.remat:
                # CCT's blocks are inline (flat param names shared with the
                # dvgl checkpoint converter) — no checkpointing hook; its
                # [B, 577, 384] activations don't need one either
                raise ValueError(
                    "remat is supported for the 'vit' token backbone only")
            from anyloc_tpu.models.cct import CCT, cct_14_7x2_384

            cfg = cct_14_7x2_384(truncate_at=self.trunc_te)
            out = CCT(cfg, name="backbone")(
                imgs, return_tokens=agg_wants_tokens
            )
            return (out, None, 384) if agg_wants_tokens else (None, out, 384)
        # vit: HF ViT-Base geometry (dvgl uses google/vit-base-*), our trunk
        import dataclasses as _dc

        from anyloc_tpu.models.cosplace_vit import hf_vit_config
        from anyloc_tpu.models.vit import ViT

        cfg = hf_vit_config(img_size=imgs.shape[1])
        if self.trunc_te is not None:
            cfg = _dc.replace(cfg, depth=self.trunc_te)
        if self.remat:
            cfg = _dc.replace(cfg, remat=True)
        out = ViT(cfg, name="backbone")(imgs)
        if agg_wants_tokens:
            return out["tokens"], None, cfg.embed_dim
        return None, out["cls"], cfg.embed_dim

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        agg = self.aggregation
        if self.backbone.startswith(("cct", "vit")):
            tokens, pooled, channels = self._token_backbone(imgs, train)
            if pooled is not None:
                # VitWrapper CLS / CCT seq-pool route: the aggregation layer
                # reduces to L2 (+ optional fc) on the pooled vector
                out = l2_normalize(pooled.astype(jnp.float32), axis=-1)
            elif agg == "netvlad":
                tokens = l2_normalize(tokens.astype(jnp.float32), axis=-1)
                out = NetVLAD(
                    self.netvlad_clusters, channels, name="aggregation"
                )(tokens)
            else:  # gem over tokens (work_with_tokens)
                from anyloc_tpu.ops.gem import gem_pool

                out = l2_normalize(
                    gem_pool(tokens.astype(jnp.float32), p=self.gem_p),
                    axis=-1,
                )
            if self.fc_output_dim is not None:
                out = nn.Dense(self.fc_output_dim, name="fc")(out)
                out = l2_normalize(out, axis=-1)
            return out
        bb, channels = self._backbone()
        fmap = bb(imgs, train=train)  # [B, h, w, C]
        if agg == "netvlad":
            b, h, w, d = fmap.shape
            fmap = l2_normalize(fmap, axis=-1)  # dvgl normalize_input
            out = NetVLAD(self.netvlad_clusters, d, name="aggregation")(
                fmap.reshape(b, h * w, d)
            )
        elif agg == "crn":
            out = CRN(self.netvlad_clusters, channels, name="aggregation")(fmap)
        elif agg == "rrm":
            out = RRM(channels, name="aggregation")(fmap)
        elif agg == "gem":
            out = l2_normalize(gem_pool_spatial(fmap, p=self.gem_p), axis=-1)
        elif agg == "mac":
            out = l2_normalize(mac_spatial(fmap), axis=-1)
        elif agg == "spoc":
            out = l2_normalize(spoc_spatial(fmap), axis=-1)
        elif agg == "rmac":
            out = l2_normalize(rmac_spatial(fmap), axis=-1)
        else:
            raise ValueError(f"Unknown aggregation {agg}")
        if self.fc_output_dim is not None:
            out = nn.Dense(self.fc_output_dim, name="fc")(out)
            out = l2_normalize(out, axis=-1)
        return out


def make_freeze_te_mask(freeze_te: int):
    """Trainability mask callable for ``optax.masked`` implementing the dvgl
    ``--freeze_te`` semantics (network.py:150-160, 169-180): every backbone
    parameter freezes EXCEPT transformer-encoder blocks with index >
    ``freeze_te`` (embeddings/tokenizer stay frozen; -1 unfreezes all
    blocks). Heads/aggregation params stay trainable."""
    import re

    def mask(params):
        import jax

        def trainable(path, _leaf):
            names = [str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path]
            joined = "/".join(names)
            if "backbone" not in names:
                return True
            after = joined.split("backbone/", 1)[-1]
            m = re.search(r"(?:blocks_|norm1_|norm2_|qkv_|proj_|fc1_|fc2_)"
                          r"(\d+)(?:/|$)", after)
            if m is None:
                return False       # embeddings / tokenizer / final norm
            return int(m.group(1)) > freeze_te

        return jax.tree_util.tree_map_with_path(trainable, params)

    return mask
