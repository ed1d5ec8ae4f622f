"""Extractor factory: model name -> batched patch-descriptor callable.

One constructor for every family the reference spreads across six wrappers
(DinoV2ExtractFeatures / ViTExtractor / ClipWrapper / MAE / SAM / ImageBind).
All return a callable ``imgs [B, H, W, 3] -> [B, N, D]`` patch descriptors
(or [B, D] globals where the family is inherently global), jit-compiled.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_extractor(
    model_type: str,
    layer: int = 11,
    facet: str = "value",
    checkpoint: Optional[str] = None,
    dtype=jnp.bfloat16,
    use_cls: bool = False,
    norm_descs: bool = True,
    stride: Optional[int] = None,
    seed: int = 42,
    quant: Optional[str] = None,
):
    """Returns an object with ``__call__(imgs) -> descs`` and attributes
    ``cfg`` (with .patch_size) where applicable. ``quant`` selects an int8
    trunk mode (DINOv2 family only — the frozen-trunk serving path)."""
    if quant and not model_type.startswith("dinov2"):
        raise ValueError(
            f"quant={quant!r} is only supported for the dinov2 family "
            f"(got {model_type!r})"
        )
    if model_type.startswith("dinov2"):
        from anyloc_tpu.models.extractor import DinoV2ExtractFeatures

        return DinoV2ExtractFeatures(
            model_type, layer, facet, use_cls=use_cls, norm_descs=norm_descs,
            checkpoint=checkpoint, dtype=dtype, seed=seed, quant=quant,
        )
    if model_type.startswith("dino_"):
        from anyloc_tpu.models.dino_v1 import ViTExtractor

        ext = ViTExtractor(
            model_type, stride=stride or 4, checkpoint=checkpoint,
            dtype=dtype, seed=seed,
        )

        class _D1:
            cfg = ext.cfg

            def __call__(self, imgs):
                out = ext.extract_descriptors(
                    imgs, layer=layer, facet=facet, include_cls=use_cls
                )[:, 0]
                if norm_descs:
                    from anyloc_tpu.ops.common import l2_normalize

                    out = l2_normalize(out, axis=-1)
                return out

        return _D1()
    if model_type.startswith("clip_"):
        from anyloc_tpu.models.clip import ClipWrapper

        name = model_type[len("clip_"):]
        m = ClipWrapper(
            ClipWrapper.IMPL_OPENAI, name, use_caching=False,
            checkpoint=checkpoint, dtype=dtype, seed=seed,
        )

        class _Clip:
            cfg = m.vcfg

            def __call__(self, imgs):
                return m.encode_image(imgs, normalize=norm_descs)[:, None, :]

        return _Clip()
    if model_type.startswith("mae_"):
        from anyloc_tpu.models.mae import MAE_FACTORIES, MaskedAutoencoderViT
        from anyloc_tpu.models.convert import load_torch_checkpoint
        from anyloc_tpu.models.mae import convert_mae

        mcfg = MAE_FACTORIES[model_type](dtype=dtype)
        model = MaskedAutoencoderViT(mcfg)
        if checkpoint is not None:
            params = convert_mae(load_torch_checkpoint(checkpoint), mcfg)
        else:
            params = model.init(
                {"params": jax.random.PRNGKey(seed),
                 "mask": jax.random.PRNGKey(0)},
                jnp.zeros((1, mcfg.img_size, mcfg.img_size, 3)), 0.75,
            )

        @jax.jit
        def fwd(p, imgs):
            _, _, _, latent = model.apply(p, imgs, 0.0)
            out = latent[:, 1:] if not use_cls else latent
            out = out.astype(jnp.float32)
            if norm_descs:
                from anyloc_tpu.ops.common import l2_normalize

                out = l2_normalize(out, axis=-1)
            return out

        class _MAE:
            cfg = mcfg.block_cfg()

            def __call__(self, imgs):
                return fwd(params, jnp.asarray(imgs))

        return _MAE()
    if model_type.startswith("sam_"):
        from anyloc_tpu.models.sam import SAM_FACTORIES, SAMImageEncoder

        scfg = SAM_FACTORIES[model_type[len("sam_"):]]()
        scfg = scfg.__class__(**{**scfg.__dict__, "dtype": dtype})
        model = SAMImageEncoder(scfg)
        params = None
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint
            from anyloc_tpu.models.sam import convert_sam

            params = convert_sam(load_torch_checkpoint(checkpoint), scfg)

        class _SAM:
            cfg = scfg

            def __init__(self):
                self.params = params
                self._fwd = jax.jit(
                    lambda p, im: model.apply(p, im, return_tokens=True)
                )

            def __call__(self, imgs):
                imgs = jnp.asarray(imgs)
                if self.params is None:
                    self.params = model.init(jax.random.PRNGKey(seed), imgs)
                out = self._fwd(self.params, imgs).astype(jnp.float32)
                if norm_descs:
                    from anyloc_tpu.ops.common import l2_normalize

                    out = l2_normalize(out, axis=-1)
                return out

        return _SAM()
    if model_type.startswith("imagebind"):
        from anyloc_tpu.models.imagebind import ImageBindVision

        m = ImageBindVision(checkpoint, dtype=dtype, seed=seed)

        class _IB:
            cfg = m.cfg

            def __call__(self, imgs):
                out = m(imgs)
                toks = out["tokens"]
                if norm_descs:
                    from anyloc_tpu.ops.common import l2_normalize

                    toks = l2_normalize(toks, axis=-1)
                return toks

        return _IB()
    if model_type.startswith("hf_vit") or model_type.startswith("cosplace_vit"):
        from anyloc_tpu.models.cosplace_vit import CosPlaceViTExtractFeatures

        return CosPlaceViTExtractFeatures(
            checkpoint, layer, facet, use_cls=use_cls, norm_descs=norm_descs,
            dtype=dtype, seed=seed,
        )
    if model_type.startswith("lseg"):
        # The reference cannot do this in-repo at all: scripts/lseg_vlad.py
        # only consumes .npy caches produced by the external lang-seg env
        # (scripts/lseg_ablations_env.sh). Here the encoder itself runs
        # (models/lseg.py); descriptors = dense pixel features in CLIP text
        # space, flattened to the standard [B, N, D] patch layout so
        # pipelines.extras.lseg_vlad can run end-to-end from images.
        from anyloc_tpu.models.lseg import (LSegEncoder, convert_lseg,
                                             lseg_config)

        cfg = lseg_config(dtype=dtype)
        enc = LSegEncoder(cfg)
        if checkpoint:
            import torch

            sd = torch.load(checkpoint, map_location="cpu",
                            weights_only=False)
            sd = sd.get("state_dict", sd)
            params = convert_lseg(sd, cfg)
        else:
            s = cfg.backbone.img_size
            params = enc.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, s, s, 3), jnp.float32)
            )

        apply = jax.jit(
            lambda p, imgs: enc.apply(p, imgs, normalize=norm_descs)
        )

        class _LSeg:
            backbone_cfg = cfg.backbone
            lseg_cfg = cfg

            def __call__(self, imgs):
                feats = apply(params, jnp.asarray(imgs))
                b, h, w, d = feats.shape
                return feats.reshape(b, h * w, d)

        return _LSeg()
    raise KeyError(f"Unknown model family for '{model_type}'")
