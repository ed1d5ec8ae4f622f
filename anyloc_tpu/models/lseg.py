"""LSeg (Language-driven Semantic Segmentation) image encoder — the last
model family in the reference's zoo.

The reference never runs the model in-repo: ``scripts/lseg_vlad.py:1-304``
only consumes pixel-descriptor ``.npy`` caches produced by the external
lang-seg package in a separate conda env (``scripts/lseg_ablations_env.sh``).
This module closes that gap TPU-side: the full encoder that PRODUCES those
dense pixel descriptors, so ``pipelines.extras.lseg_vlad`` can run
end-to-end instead of cache-only.

Architecture (LSeg, Li et al. ICLR 2022; decoder = DPT, Ranftl et al.
ICCV 2021): a CLIP-initialized timm ViT-L/16 backbone evaluated at 384 px,
four intermediate block outputs (hooks [5, 11, 17, 23]) reassembled into a
multi-scale pyramid (readout-project -> 1x1 conv -> up/down-sample ->
3x3 conv to a common width), fused coarse-to-fine by four refinenets
(residual conv units + 2x bilinear up), then a 1x1 head projecting every
pixel into the 512-d CLIP text-embedding space. Zero-shot segmentation
logits are the dot product with CLIP text embeddings (the text tower is
the existing ``models/clip.py`` one).

TPU-native choices: the backbone reuses the hook-free trunk's
``capture_layers`` single-pass multi-layer capture (models/vit.py); the
k=stride transposed convs are expressed as one matmul + tile reshape
(MXU-friendly, no conv_transpose lowering); bilinear 2x align_corners=True
upsampling is two small dense interpolation matrices (exactly torch's
``F.interpolate`` semantics, same approach as the trunk's bicubic
pos-embed path); BatchNorms run frozen (inference statistics) — the trunk
is frozen in this framework, like every other extractor family.

Converter: ``convert_lseg`` ingests the published lang-seg lightning
checkpoint layout (``net.pretrained.model.*`` timm-ViT naming,
``net.pretrained.act_postprocessN.*`` reassemble stages, ``net.scratch.*``
refinenets/head, ``net.clip_pretrained.*`` CLIP text tower) — validated
structurally on synthetic state dicts and numerically against an
independent torch implementation of the DPT decoder
(tests/test_lseg.py); real-weight parity needs the published checkpoint
(tools/parity_check.py), same status as every family's L0 row.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import (conv_kernel, dense_params, ln_params,
                                        t2np)
from anyloc_tpu.models.vit import ViT, ViTConfig


def lseg_backbone_config(dtype=None, img_size: int = 384) -> ViTConfig:
    """timm ``vit_large_patch16_384`` geometry (lang-seg ``clip_vitl16_384``:
    CLIP-initialized but architecturally a plain timm ViT — post-LN blocks,
    erf GELU, learned pos-embed with CLS, no LayerScale)."""
    kwargs = dict(
        img_size=img_size,
        patch_size=16,
        embed_dim=1024,
        depth=24,
        num_heads=16,
        mlp_type="mlp",
        act="gelu",
        layerscale_init=None,
        ln_eps=1e-6,
        interpolate_offset=0.0,
        interpolate_antialias=False,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


@dataclasses.dataclass(frozen=True)
class LSegConfig:
    backbone: ViTConfig
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    reassemble_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256
    out_dim: int = 512           # CLIP text-embedding width
    use_bn: bool = True          # refinenet ResidualConvUnit BNs (frozen)
    bn_eps: float = 1e-5


def lseg_config(dtype=None, img_size: int = 384, **kw) -> LSegConfig:
    return LSegConfig(backbone=lseg_backbone_config(dtype, img_size), **kw)


# --------------------------------------------------------------- helpers
def _bilinear_ac_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] interpolation matrix for torch F.interpolate(...,
    mode='bilinear', align_corners=True) along one axis."""
    m = np.zeros((dst, src), np.float32)
    if src == 1:
        m[:, 0] = 1.0
        return m
    pos = np.arange(dst, dtype=np.float64) * (src - 1) / max(dst - 1, 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = (pos - lo).astype(np.float32)
    m[np.arange(dst), lo] += 1.0 - frac
    m[np.arange(dst), hi] += frac
    return m


def upsample2x_bilinear_ac(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x bilinear upsample with align_corners=True (torch-exact)."""
    _, h, w, _ = x.shape
    mh = jnp.asarray(_bilinear_ac_matrix(h, 2 * h), x.dtype)
    mw = jnp.asarray(_bilinear_ac_matrix(w, 2 * w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class TileDeconv(nn.Module):
    """ConvTranspose2d with kernel_size == stride (padding 0): each input
    pixel expands into a k x k output tile — one matmul + reshape instead
    of a transposed-conv lowering. Param layout [k, k, in, out] (torch
    weight [in, out, k, k] transposes via (2, 3, 0, 1))."""

    features: int
    k: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.k, self.k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        t = jnp.einsum(
            "bhwc,ijco->bhiwjo", x, kern.astype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        t = t.reshape(b, h * self.k, w * self.k, self.features)
        return t + bias.astype(self.dtype)


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm2d over stored statistics (the encoder is a
    frozen extractor, like every family here; reference analogue: torch
    .eval() everywhere in the hot paths)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)


class ResidualConvUnit(nn.Module):
    """relu -> 3x3 conv [-> bn] -> relu -> 3x3 conv [-> bn] -> + skip."""

    features: int
    use_bn: bool
    bn_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=not self.use_bn, dtype=self.dtype,
                      name="conv1")(out)
        if self.use_bn:
            out = FrozenBN(self.features, self.bn_eps, self.dtype,
                           name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=not self.use_bn, dtype=self.dtype,
                      name="conv2")(out)
        if self.use_bn:
            out = FrozenBN(self.features, self.bn_eps, self.dtype,
                           name="bn2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """DPT FeatureFusionBlock_custom: optional lateral RCU + RCU + 2x
    bilinear (align_corners=True) + 1x1 out conv."""

    features: int
    use_bn: bool
    bn_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res: Optional[jnp.ndarray] = None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, self.use_bn, self.bn_eps,
                                     self.dtype, name="rcu1")(res)
        x = ResidualConvUnit(self.features, self.use_bn, self.bn_eps,
                             self.dtype, name="rcu2")(x)
        x = upsample2x_bilinear_ac(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class LSegEncoder(nn.Module):
    """imgs [B, H, W, 3] (normalized, H/W multiples of 32) ->
    pixel features [B, H/2, W/2, out_dim] in CLIP text space
    (L2-normalized when ``normalize=True`` — the form the reference's
    lseg_vlad caches hold)."""

    cfg: LSegConfig

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, normalize: bool = True):
        c = self.cfg
        bc = c.backbone
        b, h, w, _ = imgs.shape
        gh, gw = h // bc.patch_size, w // bc.patch_size
        hooked = ViT(bc, name="trunk")(
            imgs, capture_layers=list(c.hooks), capture_facet="token"
        )

        dt = bc.dtype
        pyramids = []
        for idx, layer in enumerate(c.hooks):
            t = hooked[layer]                       # [B, 1+N, D]
            cls, toks = t[:, :1], t[:, 1:]
            # readout 'project': concat CLS onto every token, Linear + GELU
            r = jnp.concatenate(
                [toks, jnp.broadcast_to(cls, toks.shape)], axis=-1)
            r = nn.Dense(bc.embed_dim, dtype=dt,
                         name=f"readout_{idx}")(r)
            r = nn.gelu(r, approximate=False)
            r = r.reshape(b, gh, gw, bc.embed_dim)
            r = nn.Conv(c.reassemble_dims[idx], (1, 1), dtype=dt,
                        name=f"reassemble_{idx}")(r)
            if idx == 0:
                r = TileDeconv(c.reassemble_dims[idx], 4, dt,
                               name="resample_0")(r)
            elif idx == 1:
                r = TileDeconv(c.reassemble_dims[idx], 2, dt,
                               name="resample_1")(r)
            elif idx == 3:
                r = nn.Conv(c.reassemble_dims[idx], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=dt,
                            name="resample_3")(r)
            r = nn.Conv(c.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dt, name=f"layer_rn_{idx}")(r)
            pyramids.append(r)

        p = FeatureFusionBlock(c.features, c.use_bn, c.bn_eps, dt,
                               name="refinenet_3")(pyramids[3])
        for i in (2, 1, 0):
            p = FeatureFusionBlock(c.features, c.use_bn, c.bn_eps, dt,
                                   name=f"refinenet_{i}")(p, pyramids[i])
        feats = nn.Conv(c.out_dim, (1, 1), dtype=dt, name="head1")(p)
        feats = feats.astype(jnp.float32)
        if normalize:
            feats = feats / (
                jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
        return feats


def lseg_logits(
    pixel_feats: jnp.ndarray,
    text_feats: jnp.ndarray,
    logit_scale: float | jnp.ndarray = 1.0,
    upsample: bool = True,
) -> jnp.ndarray:
    """Zero-shot segmentation logits: [B, H/2, W/2, out_dim] pixel features
    (L2-normalized) x [K, out_dim] L2-normalized text embeddings ->
    [B, H, W, K] (2x bilinear align_corners=True up to input resolution,
    the LSegNet output_conv)."""
    logits = logit_scale * jnp.einsum(
        "bhwd,kd->bhwk", pixel_feats, text_feats,
        precision=jax.lax.Precision.HIGHEST,
    )
    return upsample2x_bilinear_ac(logits) if upsample else logits


# ------------------------------------------------------------- converter
def _strip_net(sd: Dict) -> Dict:
    if any(k.startswith("net.") for k in sd):
        return {k[4:]: v for k, v in sd.items() if k.startswith("net.")}
    return dict(sd)


def convert_lseg(sd: Dict, cfg: LSegConfig) -> Dict:
    """lang-seg checkpoint -> LSegEncoder flax params.

    Layout: ``pretrained.model.*`` (timm ViT-L/16), reassemble stages
    ``pretrained.act_postprocess{1..4}`` = Sequential(readout-project(.0),
    Transpose(.1), Unflatten(.2), 1x1 Conv(.3)[, resample(.4)]),
    ``scratch.layer{1..4}_rn`` 3x3 convs, ``scratch.refinenet{1..4}``
    fusion blocks, ``scratch.head1`` the 512-d pixel head. An optional
    leading ``net.`` (lightning module) prefix is stripped. ``use_bn`` is
    auto-respected: BN statistics are read iff the checkpoint has them."""
    sd = _strip_net(sd)
    bc = cfg.backbone

    trunk: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(sd["pretrained.model.patch_embed.proj.weight"]),
            "bias": t2np(sd["pretrained.model.patch_embed.proj.bias"]),
        },
        "cls_token": t2np(sd["pretrained.model.cls_token"]),
        "pos_embed": t2np(sd["pretrained.model.pos_embed"]),
    }
    if "pretrained.model.norm.weight" in sd:
        trunk["norm"] = ln_params(sd, "pretrained.model.norm")
    else:  # hooks never reach the final norm; synthesize identity
        trunk["norm"] = {
            "scale": np.ones((bc.embed_dim,), np.float32),
            "bias": np.zeros((bc.embed_dim,), np.float32),
        }
    for i in range(bc.depth):
        pre = f"pretrained.model.blocks.{i}"
        trunk[f"blocks_{i}"] = {
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

    def convp(prefix, bias=True) -> Dict:
        out = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
        if bias:
            out["bias"] = t2np(sd[f"{prefix}.bias"])
        return out

    p: Dict = {"trunk": trunk}
    for idx in range(4):
        ap = f"pretrained.act_postprocess{idx + 1}"
        p[f"readout_{idx}"] = dense_params(sd, f"{ap}.0.project.0")
        p[f"reassemble_{idx}"] = convp(f"{ap}.3")
        if idx in (0, 1):
            w = t2np(sd[f"{ap}.4.weight"])           # [in, out, k, k]
            p[f"resample_{idx}"] = {
                "kernel": w.transpose(2, 3, 0, 1),   # -> [k, k, in, out]
                "bias": t2np(sd[f"{ap}.4.bias"]),
            }
        elif idx == 3:
            p["resample_3"] = convp(f"{ap}.4")
        p[f"layer_rn_{idx}"] = convp(f"scratch.layer{idx + 1}_rn", bias=False)

    has_bn = "scratch.refinenet1.resConfUnit1.bn1.weight" in sd
    if has_bn != cfg.use_bn:
        raise ValueError(
            f"checkpoint use_bn={has_bn} but config use_bn={cfg.use_bn}"
        )

    def rcu(prefix) -> Dict:
        out = {
            "conv1": convp(f"{prefix}.conv1", bias=not cfg.use_bn),
            "conv2": convp(f"{prefix}.conv2", bias=not cfg.use_bn),
        }
        if cfg.use_bn:
            for bn in ("bn1", "bn2"):
                out[bn] = {
                    "scale": t2np(sd[f"{prefix}.{bn}.weight"]),
                    "bias": t2np(sd[f"{prefix}.{bn}.bias"]),
                    "mean": t2np(sd[f"{prefix}.{bn}.running_mean"]),
                    "var": t2np(sd[f"{prefix}.{bn}.running_var"]),
                }
        return out

    # scratch.refinenet4 consumes the deepest hook (our refinenet_3) and has
    # NO lateral input: its resConfUnit1 exists in the checkpoint but is
    # never executed (DPT builds all fusion blocks identically); skip it.
    for ours, theirs in ((3, 4), (2, 3), (1, 2), (0, 1)):
        blk: Dict = {
            "rcu2": rcu(f"scratch.refinenet{theirs}.resConfUnit2"),
            "out_conv": convp(f"scratch.refinenet{theirs}.out_conv"),
        }
        if ours != 3:
            blk["rcu1"] = rcu(f"scratch.refinenet{theirs}.resConfUnit1")
        p[f"refinenet_{ours}"] = blk
    p["head1"] = convp("scratch.head1")
    return {"params": p}


def convert_lseg_text(sd: Dict, depth: int = 12) -> Dict:
    """The CLIP text tower inside a lang-seg checkpoint
    (``clip_pretrained.*`` = an OpenAI CLIP model; LSeg uses ViT-B/32's
    text width 512 / 12 layers) -> models.clip.CLIPTextTower params."""
    from anyloc_tpu.models.clip import convert_clip_text

    sd = _strip_net(sd)
    inner = {k[len("clip_pretrained."):]: v for k, v in sd.items()
             if k.startswith("clip_pretrained.")}
    return convert_clip_text(inner, depth)


def lseg_logit_scale(sd: Dict) -> float:
    sd = _strip_net(sd)
    if "logit_scale" in sd:
        return float(np.exp(t2np(sd["logit_scale"])))
    return 1.0
