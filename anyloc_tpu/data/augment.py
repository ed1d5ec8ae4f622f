"""Device-side batched augmentations — the CosPlace ``augmentations.py``
DeviceAgnostic* classes (GPU-batch ColorJitter + RandomResizedCrop) rebuilt
as jit-able JAX transforms over [B, H, W, 3] batches with explicit keys.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _rgb_to_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


@functools.partial(jax.jit, static_argnames=("brightness", "contrast",
                                             "saturation", "hue"))
def color_jitter(
    key: jax.Array,
    imgs: jnp.ndarray,
    brightness: float = 0.7,
    contrast: float = 0.7,
    saturation: float = 0.7,
    hue: float = 0.5,
) -> jnp.ndarray:
    """Per-image random brightness/contrast/saturation/hue jitter with
    torchvision ColorJitter factor semantics (CosPlace train.py defaults).
    Operates on [B, H, W, 3] in [0, 1]-ish space."""
    b = imgs.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    x = imgs
    if brightness:
        f = jax.random.uniform(kb, (b, 1, 1, 1),
                               minval=max(0, 1 - brightness),
                               maxval=1 + brightness)
        x = x * f
    if contrast:
        f = jax.random.uniform(kc, (b, 1, 1, 1),
                               minval=max(0, 1 - contrast),
                               maxval=1 + contrast)
        mean = jnp.mean(_rgb_to_gray(x), axis=(1, 2, 3), keepdims=True)
        x = mean + (x - mean) * f
    if saturation:
        f = jax.random.uniform(ks, (b, 1, 1, 1),
                               minval=max(0, 1 - saturation),
                               maxval=1 + saturation)
        gray = _rgb_to_gray(x)
        x = gray + (x - gray) * f
    if hue:
        # cheap hue rotation in YIQ space
        # torchvision hue factor is a fraction of the FULL hue circle
        theta = jax.random.uniform(kh, (b, 1, 1),
                                   minval=-hue * 2 * jnp.pi,
                                   maxval=hue * 2 * jnp.pi)
        y = _rgb_to_gray(x)[..., 0]
        i = 0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2]
        q = 0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2]
        ci, si = jnp.cos(theta), jnp.sin(theta)
        i2 = ci * i - si * q
        q2 = si * i + ci * q
        r = y + 0.956 * i2 + 0.621 * q2
        g = y - 0.272 * i2 - 0.647 * q2
        bch = y - 1.106 * i2 + 1.703 * q2
        x = jnp.stack([r, g, bch], axis=-1)
    return x


@functools.partial(jax.jit, static_argnames=("out_hw", "scale"))
def random_resized_crop(
    key: jax.Array,
    imgs: jnp.ndarray,
    out_hw: Tuple[int, int],
    scale: Tuple[float, float] = (0.5, 1.0),
) -> jnp.ndarray:
    """Per-image random square-ish crop + resize (DeviceAgnostic
    RandomResizedCrop; bilinear)."""
    b, h, w, c = imgs.shape
    ks, ky, kx = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (b,), minval=scale[0], maxval=scale[1])
    ch = jnp.floor(h * jnp.sqrt(s)).astype(jnp.int32)
    cw = jnp.floor(w * jnp.sqrt(s)).astype(jnp.int32)
    y0 = (jax.random.uniform(ky, (b,)) * (h - ch)).astype(jnp.int32)
    x0 = (jax.random.uniform(kx, (b,)) * (w - cw)).astype(jnp.int32)

    oh, ow = out_hw
    ys = jnp.linspace(0.0, 1.0, oh)
    xs = jnp.linspace(0.0, 1.0, ow)

    def crop_one(img, y0i, x0i, chi, cwi):
        yy = y0i + ys * (chi - 1)
        xx = x0i + xs * (cwi - 1)
        yf, xf = jnp.floor(yy), jnp.floor(xx)
        wy, wx = (yy - yf)[:, None, None], (xx - xf)[None, :, None]
        y0_ = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
        y1_ = jnp.clip(y0_ + 1, 0, h - 1)
        x0_ = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
        x1_ = jnp.clip(x0_ + 1, 0, w - 1)
        tl = img[y0_][:, x0_]
        tr = img[y0_][:, x1_]
        bl = img[y1_][:, x0_]
        br = img[y1_][:, x1_]
        top = tl + (tr - tl) * wx
        bot = bl + (br - bl) * wx
        return top + (bot - top) * wy

    return jax.vmap(crop_one)(imgs, y0, x0, ch, cw)


def make_augment_fn(
    brightness: float = 0,
    contrast: float = 0,
    saturation: float = 0,
    hue: float = 0,
    horizontal_flip: bool = False,
    random_resized_crop: float = 0,
):
    """Compose the dvgl parser's data-augmentation flags (parser.py:76-84)
    into one ``(key, imgs [B,H,W,3]) -> imgs`` transform for the triplet
    train loop. ``random_resized_crop`` is the minimum area scale (0 = off),
    matching torchvision RandomResizedCrop(scale=(s, 1))."""

    def augment(key, imgs):
        kj, kf, kc = jax.random.split(key, 3)
        x = imgs
        if brightness or contrast or saturation or hue:
            x = color_jitter(kj, x, brightness=brightness, contrast=contrast,
                             saturation=saturation, hue=hue)
        if horizontal_flip:
            flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
            x = jnp.where(flip, x[:, :, ::-1], x)
        if random_resized_crop:
            x = globals()["random_resized_crop"](
                kc, x, out_hw=x.shape[1:3],
                scale=(float(random_resized_crop), 1.0),
            )
        return x

    return augment
