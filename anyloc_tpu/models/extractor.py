"""Facet extractors — the hook-free replacement for the reference's
``DinoV2ExtractFeatures`` (utilities.py:219-288) and friends.

The reference registers a forward hook on ``blocks[layer].attn.qkv``, runs the
FULL model (DINOv2-G: 40 blocks), captures [B, 1+N, 3D], slices a third, drops
CLS, L2-normalizes. Here the trunk is truncated at the captured layer (blocks
after it never execute — a ~22% FLOP saving for the SOTA layer-31-of-40
config) and the facet slice happens inside the jitted forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from anyloc_tpu.ops.common import l2_normalize
from anyloc_tpu.models.vit import ViT, ViTConfig


class ViTFacetExtractor:
    """Jit-compiled batched facet extraction over any ``ViT`` config.

    Call with channels-last images [B, H, W, 3]: float32 inputs are assumed
    already normalized; uint8 inputs (the low-bandwidth transfer format,
    ``VPRDataset.batches(output="uint8")``) are normalized on-device with
    ImageNet statistics inside the jitted forward. Returns
    [B, n_patches(+1 if use_cls), D] facet descriptors.
    """

    # uint8 batches are normalized on-device in _forward; engines check this
    # before selecting the uint8 transfer format
    supports_uint8 = True

    def __init__(
        self,
        cfg: ViTConfig,
        params,
        layer: int,
        facet: str = "token",
        use_cls: bool = False,
        norm_descs: bool = True,
    ) -> None:
        assert facet in ("query", "key", "value", "token"), facet
        assert 0 <= layer < cfg.depth, f"layer {layer} out of range [0, {cfg.depth})"
        self.cfg = cfg
        self.params = params
        self.layer = layer
        self.facet = facet
        self.use_cls = use_cls
        self.norm_descs = norm_descs
        self.model = ViT(cfg)

        @jax.jit
        def _forward(params, imgs):
            if imgs.dtype == jnp.uint8:
                from anyloc_tpu.data.transforms import device_normalize

                imgs = device_normalize(imgs)
            out = self.model.apply(
                params, imgs, capture_layer=layer, capture_facet=facet
            )
            # out: [B, prefix + N, D] where prefix = 1 (CLS) + registers.
            skip = (1 if cfg.use_cls_token else 0) + cfg.num_register_tokens
            if use_cls:
                # Reference semantics (utilities.py:271): keep token 0 (CLS)
                # along with patches; register tokens are always dropped.
                if cfg.num_register_tokens:
                    out = jnp.concatenate([out[:, :1], out[:, skip:]], axis=1)
            else:
                out = out[:, skip:]
            out = out.astype(jnp.float32)
            if norm_descs:
                out = l2_normalize(out, axis=-1)
            return out

        self._forward = _forward

    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        if imgs.ndim == 3:
            imgs = imgs[None]
        return self._forward(self.params, imgs)

    def extract_multilayer(self, imgs: jnp.ndarray, layers) -> dict:
        """Facets for several layers in ONE trunk pass (the reference's
        multi-hook pattern, dino_extractor.py:215-230; feeds
        pipelines.extras.multilayer_vlad). Returns {layer: [B, N(+1), D]}."""
        if imgs.ndim == 3:
            imgs = imgs[None]
        cfg, facet = self.cfg, self.facet
        skip = (1 if cfg.use_cls_token else 0) + cfg.num_register_tokens

        @jax.jit
        def fwd(params, imgs):
            if imgs.dtype == jnp.uint8:
                from anyloc_tpu.data.transforms import device_normalize

                imgs = device_normalize(imgs)
            outs = self.model.apply(
                params, imgs, capture_layers=tuple(layers),
                capture_facet=facet,
            )
            post = {}
            for li, out in outs.items():
                if self.use_cls:
                    if cfg.num_register_tokens:
                        out = jnp.concatenate(
                            [out[:, :1], out[:, skip:]], axis=1)
                else:
                    out = out[:, skip:]
                out = out.astype(jnp.float32)
                if self.norm_descs:
                    out = l2_normalize(out, axis=-1)
                post[li] = out
            return post

        return fwd(self.params, imgs)


class DinoV2ExtractFeatures(ViTFacetExtractor):
    """API-parity constructor mirroring utilities.py:223-236:
    ``DinoV2ExtractFeatures(dino_model, layer, facet, use_cls, norm_descs)``.

    ``checkpoint`` is a local torch ``.pth`` state dict (torch.hub is not used
    — zero-egress TPU pods load converted or local checkpoints); when None,
    parameters are randomly initialized (shape-true, for benchmarks/tests).
    """

    def __init__(
        self,
        dino_model: str,
        layer: int,
        facet: str = "token",
        use_cls: bool = False,
        norm_descs: bool = True,
        device: Optional[str] = None,  # API parity; placement is managed by JAX
        checkpoint: Optional[str] = None,
        dtype=jnp.bfloat16,
        seed: int = 42,
        quant: Optional[str] = None,
    ) -> None:
        """``quant``: None (full precision) or an int8 trunk mode
        ('int8' / 'int8_fused' / 'int8_full' — see ViTConfig.quant);
        'int8_full' is the fastest frozen-trunk serving mode. Checkpoint
        weights are quantized after conversion (ops.quant.quantize_vit_params)."""
        del device
        import dataclasses

        from anyloc_tpu.models.dinov2 import convert_dinov2, dinov2_config

        cfg = dinov2_config(dino_model, dtype=dtype)
        if quant:
            cfg = dataclasses.replace(cfg, quant=quant)
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            params = convert_dinov2(load_torch_checkpoint(checkpoint), cfg)
            if quant:
                from anyloc_tpu.ops.quant import quantize_vit_params

                params = quantize_vit_params(params, quant)
        else:
            params = init_params(cfg, seed=seed)
        super().__init__(
            cfg, params, layer, facet, use_cls=use_cls, norm_descs=norm_descs
        )
        self.vit_type = dino_model


def init_params(cfg: ViTConfig, seed: int = 42, img_size: Optional[int] = None):
    """Random shape-true initialization (no pretrained weights available)."""
    size = img_size or cfg.img_size
    # init on a small image for speed — params don't depend on input H/W
    size = min(size, 4 * cfg.patch_size)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return ViT(cfg).init(jax.random.PRNGKey(seed), dummy)
