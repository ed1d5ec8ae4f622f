"""Model registry: name -> (config factory, converter).

Replaces the reference's scattered per-script model construction (torch.hub /
HF / vendored files) with one lookup, mirroring the model names the reference
uses across scripts (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple


class ModelEntry(NamedTuple):
    config: Callable  # (**kwargs) -> ViTConfig
    convert: Callable  # (state_dict, cfg) -> flax params
    family: str


_REGISTRY: Dict[str, ModelEntry] = {}


def register(name: str, config: Callable, convert: Callable, family: str):
    _REGISTRY[name] = ModelEntry(config, convert, family)


def get(name: str) -> ModelEntry:
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model '{name}'. Registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def names():
    return sorted(_REGISTRY)


def _install_builtin():
    from anyloc_tpu.models import dinov2

    for n in ("dinov2_vits14", "dinov2_vitb14", "dinov2_vitl14", "dinov2_vitg14"):
        register(
            n,
            lambda name=n, **kw: dinov2.dinov2_config(name, **kw),
            dinov2.convert_dinov2,
            "dinov2",
        )
        register(
            n + "_reg",
            lambda name=n + "_reg", **kw: dinov2.dinov2_config(name, **kw),
            dinov2.convert_dinov2,
            "dinov2",
        )

    from anyloc_tpu.models import dino_v1

    for n in ("dino_vits8", "dino_vits16", "dino_vitb8", "dino_vitb16"):
        register(
            n,
            lambda name=n, **kw: dino_v1.dino_v1_config(name, **kw),
            dino_v1.convert_dino_v1,
            "dino_v1",
        )

    from anyloc_tpu.models import clip as _clip

    for n in _clip._VISION:
        register(
            f"clip_{n}",
            lambda name=n, **kw: _clip.clip_vision_config(name, **kw),
            _clip.convert_clip_vision,
            "clip",
        )

    from anyloc_tpu.models import cosplace_vit, imagebind, mae, sam

    register("hf_vit_base", lambda **kw: cosplace_vit.hf_vit_config(**kw),
             cosplace_vit.convert_hf_vit, "hf_vit")
    register("imagebind_huge",
             lambda **kw: imagebind.imagebind_vision_config(**kw),
             imagebind.convert_imagebind_vision, "imagebind")
    for n, fac in mae.MAE_FACTORIES.items():
        register(n, lambda fac=fac, **kw: fac(**kw), mae.convert_mae, "mae")
    import dataclasses as _dc

    for n, fac in sam.SAM_FACTORIES.items():
        register(
            f"sam_{n}",
            lambda fac=fac, **kw: _dc.replace(fac(), **kw),
            sam.convert_sam,
            "sam",
        )


_install_builtin()
