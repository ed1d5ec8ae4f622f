"""Generic torch-state-dict → Flax-params conversion helpers.

No torch import at module level — torch is only needed when actually loading a
``.pth`` checkpoint (``load_torch_checkpoint``); conversion itself works on
plain numpy arrays, so tests can build state dicts without touching disk.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np


def t2np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight [out, in] -> flax Dense kernel [in, out]."""
    return t2np(w).T


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight [out, in, kh, kw] -> flax Conv kernel [kh, kw, in, out]."""
    return t2np(w).transpose(2, 3, 1, 0)


def ln_params(sd: Mapping, prefix: str) -> Dict:
    return {"scale": t2np(sd[f"{prefix}.weight"]), "bias": t2np(sd[f"{prefix}.bias"])}


def dense_params(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": linear_kernel(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = t2np(sd[f"{prefix}.bias"])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt state dict into {name: np.float32 array}."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for key in ("state_dict", "model", "model_state_dict", "teacher"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    return {k: t2np(v) for k, v in sd.items() if hasattr(v, "detach") or isinstance(v, np.ndarray)}


def strip_prefix(sd: Mapping, prefix: str) -> Dict:
    """Drop a wrapper prefix ('module.', 'backbone.', ...) from all keys."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def maybe_tp_split(params: Dict, cfg) -> Dict:
    """Honor ``ViTConfig.tp_split`` for converters that emit the fused
    layouts: rewrite ``attn/qkv`` -> ``wq/wk/wv`` (and SwiGLU ``w12`` ->
    ``w1/w2``) so every family's converted tree can be applied to a
    ``tp_split=True`` trunk, not just DINOv2's (which splits inline)."""
    if getattr(cfg, "tp_split", False):
        from anyloc_tpu.parallel.tp import split_fused_params

        return split_fused_params(params)
    return params
