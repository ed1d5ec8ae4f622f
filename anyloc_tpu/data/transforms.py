"""Image preprocessing — the exact constants/order the reference uses.

Reference preprocessing (SURVEY.md §2.2): PIL decode -> ToTensor (/255) ->
ImageNet normalize (mean/std below, e.g. baidu_dataloader.py:76-79) ->
resize (320, 320) bilinear for the VLAD pipelines
(dino_v2_global_vocab_vlad.py:241-246) -> center-crop to multiples of 14
before DINOv2 (:355-357). The demo path resizes the longest edge to <=1024
first (demo/anyloc_vlad_generate.py:165-177).

Output layout is channels-last [H, W, 3] float32 (TPU-native; the trunk's
patch conv expects NHWC).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_pil(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def normalize(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float in [0,1] -> ImageNet-normalized."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def resize_pil(img: Image.Image, size_hw: Tuple[int, int]) -> Image.Image:
    """(H, W) PIL bilinear resize (antialiased on downscale)."""
    h, w = size_hw
    return img.resize((w, h), Image.BILINEAR)


def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] matrix reproducing torch tensor-mode bilinear resize
    (align_corners=False, antialias=False — the torchvision<=0.14 default the
    reference ran with). PIL bilinear antialiases on downscale and therefore
    does NOT match; the reference resizes the normalized *tensor*
    (T.Compose([ToTensor, Normalize, Resize]))."""
    m = np.zeros((dst, src), np.float32)
    scale = src / dst
    for i in range(dst):
        pos = (i + 0.5) * scale - 0.5
        lo = int(np.floor(pos))
        t = pos - lo
        m[i, min(max(lo, 0), src - 1)] += 1.0 - t
        m[i, min(max(lo + 1, 0), src - 1)] += t
    return m


def resize_tensor_bilinear(arr: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """[H, W, C] float -> [h, w, C], torch F.interpolate bilinear semantics."""
    h, w = size_hw
    if arr.shape[:2] == (h, w):
        return arr
    mh = _bilinear_matrix(arr.shape[0], h)
    mw = _bilinear_matrix(arr.shape[1], w)
    return np.einsum("hs,swc,tw->htc", mh, arr, mw, optimize=True)


def max_edge_resize(img: Image.Image, max_edge: int = 1024) -> Image.Image:
    """Demo path: cap the longest edge (demo/anyloc_vlad_generate.py:165-177)."""
    w, h = img.size
    if max(w, h) <= max_edge:
        return img
    scale = max_edge / max(w, h)
    return img.resize((int(round(w * scale)), int(round(h * scale))), Image.BILINEAR)


def center_crop_multiple(img: np.ndarray, multiple: int = 14) -> np.ndarray:
    """Center-crop [H, W, C] so H and W are multiples of ``multiple``.
    Margin split uses torchvision CenterCrop semantics — crop_top =
    int(round(margin / 2)) (python banker's rounding), NOT floor-div; the
    two differ by one pixel for odd margins of 3, 7, 11."""
    h, w = img.shape[:2]
    ch, cw = (h // multiple) * multiple, (w // multiple) * multiple
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return img[top : top + ch, left : left + cw]


def base_transform(img: Image.Image, size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """decode -> [0,1] -> normalize -> optional resize. Returns [H, W, 3] f32.

    The reference composes ToTensor -> Normalize -> Resize, i.e. a
    *tensor-mode* torchvision Resize (4-tap bilinear, align_corners=False,
    antialias=False in the torchvision the reference pins). Normalize is
    affine and bilinear is linear, so normalize/resize commute — but
    PIL-vs-tensor bilinear do NOT (PIL antialiases on downscale), so the
    resize here reproduces the tensor-mode kernel exactly.
    """
    arr = np.asarray(img, np.float32) / 255.0
    arr = normalize(arr)
    if size_hw is not None and arr.shape[:2] != tuple(size_hw):
        arr = resize_tensor_bilinear(arr, tuple(size_hw))
    return arr


def load_image(path: str, size_hw: Optional[Tuple[int, int]] = (320, 320)) -> np.ndarray:
    return base_transform(load_pil(path), size_hw)


def resize_round_u8(arr: np.ndarray,
                    size_hw: Optional[Tuple[int, int]]) -> np.ndarray:
    """[H, W, 3] float array -> tensor-mode bilinear resize -> rounded
    uint8 — the ONE implementation of the uint8-transfer rounding contract
    (shared by ``load_image_u8`` and the serving daemon's PIL fallback;
    the native ``decode_batch_u8`` mirrors it within 1 count)."""
    if size_hw is not None and arr.shape[:2] != tuple(size_hw):
        arr = resize_tensor_bilinear(arr, tuple(size_hw))
    return np.clip(np.rint(arr), 0, 255).astype(np.uint8)


def load_image_u8(
    path: str, size_hw: Optional[Tuple[int, int]] = (320, 320)
) -> np.ndarray:
    """decode -> optional tensor-mode bilinear resize -> rounded uint8
    [H, W, 3]. The low-bandwidth transfer format (PIL fallback of the native
    ``decode_batch_u8``): normalization happens on-device, so the only
    deviation from the f32 path is the 8-bit rounding of resized values
    (<= 0.5/255 per channel before normalization)."""
    return resize_round_u8(np.asarray(load_pil(path), np.float32), size_hw)


def device_normalize(imgs, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """On-device counterpart of ``normalize`` for uint8 batches:
    (x/255 - mean)/std in float32. Jit-traceable."""
    import jax.numpy as jnp

    x = imgs.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)


def preprocess_image(
    img: Image.Image,
    size_hw: Optional[Tuple[int, int]] = None,
    max_edge: Optional[int] = None,
    crop_multiple: Optional[int] = 14,
) -> np.ndarray:
    """Full demo-style preprocessing chain."""
    if max_edge is not None:
        img = max_edge_resize(img, max_edge)
    arr = base_transform(img, size_hw)
    if crop_multiple:
        arr = center_crop_multiple(arr, crop_multiple)
    return arr
