"""MAE (Masked Autoencoder ViT) — encoder + decoder, vendored-equivalent of
AnyLoc ``models_mae.py:24-255`` in Flax.

The VPR use is a frozen encoder at ``mask_ratio=0`` returning latents
(scripts/mae_vlad.py:166-177), but the full pretraining surface is here too:
random masking (noise argsort keep/restore), decoder with mask tokens,
patchify/unpatchify and the (optionally pixel-normalized) reconstruction
loss. Position embeddings are fixed 2-D sin-cos (utilities.py:309-356).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from anyloc_tpu.models.vit import Block, ViTConfig, sincos_2d_pos_embed
from anyloc_tpu.models.convert import conv_kernel, dense_params, ln_params, t2np


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    dtype: object = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    def block_cfg(self, decoder: bool = False) -> ViTConfig:
        return ViTConfig(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.decoder_embed_dim if decoder else self.embed_dim,
            depth=self.decoder_depth if decoder else self.depth,
            num_heads=self.decoder_num_heads if decoder else self.num_heads,
            mlp_ratio=self.mlp_ratio,
            layerscale_init=None,
            ln_eps=1e-6,
            dtype=self.dtype,
        )


def mae_vit_base_patch16(**kw) -> MAEConfig:
    return MAEConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12, **kw)


def mae_vit_large_patch16(**kw) -> MAEConfig:
    return MAEConfig(patch_size=16, embed_dim=1024, depth=24, num_heads=16, **kw)


def mae_vit_huge_patch14(**kw) -> MAEConfig:
    return MAEConfig(patch_size=14, embed_dim=1280, depth=32, num_heads=16, **kw)


MAE_FACTORIES = {
    "mae_vit_base_patch16": mae_vit_base_patch16,
    "mae_vit_large_patch16": mae_vit_large_patch16,
    "mae_vit_huge_patch14": mae_vit_huge_patch14,
}


class MaskedAutoencoderViT(nn.Module):
    cfg: MAEConfig

    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] -> [B, L, p*p*3] (channels-last version of
        models_mae.py patchify; inner layout [p, p, 3] row-major)."""
        p = self.cfg.patch_size
        b, h, w, c3 = imgs.shape
        gh, gw = h // p, w // p
        x = imgs.reshape(b, gh, p, gw, p, c3)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * gw, p * p * c3)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        b, l, _ = x.shape
        g = int(l ** 0.5)
        x = x.reshape(b, g, g, p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, g * p, g * p, 3)

    def random_masking(self, x, mask_ratio, rng):
        """Per-sample random masking by noise argsort (models_mae.py:129-155).
        Returns (x_masked, mask [B, L] (1=removed), ids_restore)."""
        b, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (b, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        mask = jnp.ones((b, l))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, mask_ratio: float = 0.75,
                 rng: Optional[jax.Array] = None):
        """Returns (loss, pred, mask, latent) — the reference's forward with
        ``ret_latents=True`` (mae_vlad.py:144,168-171)."""
        c = self.cfg
        b = imgs.shape[0]
        bc = c.block_cfg()
        # ---- encoder ----
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    dtype=c.dtype, name="patch_embed")(imgs.astype(c.dtype))
        x = x.reshape(b, -1, c.embed_dim)
        pos = sincos_2d_pos_embed(c.embed_dim, c.grid, cls_token=True)
        x = x + pos[:, 1:].astype(c.dtype)
        if mask_ratio > 0:
            rng = rng if rng is not None else self.make_rng("mask")
            x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        else:
            l = x.shape[1]
            mask = jnp.zeros((b, l))
            ids_restore = jnp.tile(jnp.arange(l)[None], (b, 1))
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.embed_dim))
        cls = cls + pos[:, :1]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.embed_dim)), x], 1
        )
        for i in range(c.depth):
            x = Block(bc, name=f"blocks_{i}")(x)
        latent = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm")(x)

        # ---- decoder ----
        dc = c.block_cfg(decoder=True)
        y = nn.Dense(c.decoder_embed_dim, dtype=c.dtype, name="decoder_embed")(latent)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, c.decoder_embed_dim))
        l_full = ids_restore.shape[1]
        n_vis = y.shape[1] - 1
        mts = jnp.broadcast_to(
            mask_token.astype(c.dtype), (b, l_full - n_vis, c.decoder_embed_dim)
        )
        y_ = jnp.concatenate([y[:, 1:], mts], axis=1)
        y_ = jnp.take_along_axis(y_, ids_restore[..., None], axis=1)
        y = jnp.concatenate([y[:, :1], y_], axis=1)
        dpos = sincos_2d_pos_embed(c.decoder_embed_dim, c.grid, cls_token=True)
        y = y + dpos.astype(c.dtype)
        for i in range(c.decoder_depth):
            y = Block(dc, name=f"decoder_blocks_{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="decoder_norm")(y)
        pred = nn.Dense(c.patch_size ** 2 * 3, dtype=c.dtype,
                        name="decoder_pred")(y)[:, 1:]

        # ---- loss ----
        target = self.patchify(imgs.astype(jnp.float32))
        if c.norm_pix_loss:
            mean = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        err = (pred.astype(jnp.float32) - target) ** 2
        err = err.mean(-1)
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = (err * mask).sum() / denom
        return loss, pred, mask, latent


def convert_mae(sd: Dict, cfg: MAEConfig) -> Dict:
    """torch MAE checkpoint -> flax params.  Accepts the facebookresearch/mae
    naming and the HuggingFace ``ViTMAEForPreTraining`` layout
    (facebook/vit-mae-*) — see models/hf_convert.py.

    decoder_pred needs NO column permutation: models_mae.py patchify's
    einsum 'nchpwq->nhwpqc' makes the target inner layout (ph, pw, c) —
    channels-LAST, identical to our patchify."""
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "mae")
    p: Dict = {
        "patch_embed": {
            "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": t2np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": t2np(sd["cls_token"]),
        "mask_token": t2np(sd["mask_token"]),
        "norm": ln_params(sd, "norm"),
        "decoder_embed": dense_params(sd, "decoder_embed"),
        "decoder_norm": ln_params(sd, "decoder_norm"),
        "decoder_pred": dense_params(sd, "decoder_pred"),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        p[f"blocks_{i}"] = {
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
    for i in range(cfg.decoder_depth):
        pre = f"decoder_blocks.{i}"
        p[f"decoder_blocks_{i}"] = {
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
    return {"params": p}
