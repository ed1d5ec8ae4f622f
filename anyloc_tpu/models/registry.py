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


_install_builtin()
