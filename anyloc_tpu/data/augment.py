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
        yy = jnp.broadcast_to((y0i + ys * (chi - 1))[:, None], (oh, ow))
        xx = jnp.broadcast_to((x0i + xs * (cwi - 1))[None, :], (oh, ow))
        # crops are always in-bounds, so the fill never triggers
        return _bilinear_gather(img, yy, xx, jnp.zeros((3,), img.dtype))

    return jax.vmap(crop_one)(imgs, y0, x0, ch, cw)


def _bilinear_gather(img, yy, xx, fill):
    """Sample one image [H, W, 3] at float source coords ``yy``/``xx``
    [h, w]; coordinates outside the image take ``fill`` [3]."""
    h, w = img.shape[:2]
    inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (yy - y0)[..., None]
    wx = (xx - x0)[..., None]
    tl, tr = img[y0, x0], img[y0, x1]
    bl, br = img[y1, x0], img[y1, x1]
    top = tl + (tr - tl) * wx
    bot = bl + (br - bl) * wx
    out = top + (bot - top) * wy
    return jnp.where(inb[..., None], out, fill)


def rotate_batch(imgs: jnp.ndarray, angles_deg: jnp.ndarray,
                 fill: jnp.ndarray) -> jnp.ndarray:
    """Rotate each image about its center by its angle (degrees, CCW in
    image coords — matching torchvision F.rotate), bilinear, expand=False,
    out-of-bounds -> fill. Deterministic core of random_rotation."""
    b, h, w, _ = imgs.shape
    theta = jnp.deg2rad(angles_deg.astype(jnp.float32))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ygrid, xgrid = jnp.mgrid[0:h, 0:w]
    dy, dx = ygrid - cy, xgrid - cx

    def one(img, t):
        c, s = jnp.cos(t), jnp.sin(t)
        # inverse rotation of the output grid back into the source image
        sx = cx + c * dx - s * dy
        sy = cy + s * dx + c * dy
        return _bilinear_gather(img, sy, sx, fill)

    return jax.vmap(one)(imgs, theta)


def perspective_batch(imgs: jnp.ndarray, endpoints: jnp.ndarray,
                      fill: jnp.ndarray) -> jnp.ndarray:
    """Warp each image so its corners land on ``endpoints`` [B, 4, 2]
    ((x, y) order: top-left, top-right, bottom-right, bottom-left) —
    torchvision F.perspective semantics. Deterministic core of
    random_perspective."""
    b, h, w, _ = imgs.shape
    starts = jnp.asarray(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], jnp.float32
    )
    ygrid, xgrid = jnp.mgrid[0:h, 0:w]
    yg = ygrid.astype(jnp.float32)
    xg = xgrid.astype(jnp.float32)

    def coeffs(ends):
        # homography (a..h) mapping endpoint (xe, ye) -> start (xs, ys):
        #   xs = (a xe + b ye + c) / (g xe + h ye + 1), ys likewise —
        # the inverse map needed to sample the source at each output pixel
        rows = []
        rhs = []
        for i in range(4):
            xe, ye = ends[i, 0], ends[i, 1]
            xs, ys = starts[i, 0], starts[i, 1]
            rows.append(jnp.stack(
                [xe, ye, 1.0, 0.0, 0.0, 0.0, -xs * xe, -xs * ye]))
            rows.append(jnp.stack(
                [0.0, 0.0, 0.0, xe, ye, 1.0, -ys * xe, -ys * ye]))
            rhs.extend([xs, ys])
        return jnp.linalg.solve(jnp.stack(rows), jnp.stack(rhs))

    def one(img, ends):
        a, bb, c, d, e, f, g, hh = coeffs(ends.astype(jnp.float32))
        den = g * xg + hh * yg + 1.0
        sx = (a * xg + bb * yg + c) / den
        sy = (d * xg + e * yg + f) / den
        return _bilinear_gather(img, sy, sx, fill)

    return jax.vmap(one)(imgs, endpoints)


@functools.partial(jax.jit, static_argnames=("degrees",))
def random_rotation(key, imgs, degrees: float, fill) -> jnp.ndarray:
    """torchvision RandomRotation(degrees): per-image uniform angle in
    [-degrees, degrees]."""
    angles = jax.random.uniform(
        key, (imgs.shape[0],), minval=-degrees, maxval=degrees
    )
    return rotate_batch(imgs, angles, fill)


@functools.partial(jax.jit, static_argnames=("distortion_scale", "p"))
def random_perspective(key, imgs, distortion_scale: float, fill,
                       p: float = 0.5) -> jnp.ndarray:
    """torchvision RandomPerspective(distortion_scale, p=0.5): each corner
    moves inward by uniform(0, scale * half_extent); applied per image with
    probability ``p``."""
    b, h, w, _ = imgs.shape
    kd, kp = jax.random.split(key)
    half_h, half_w = h // 2, w // 2
    d = jax.random.uniform(kd, (b, 4, 2))  # per-corner (dx, dy) fractions
    dx = d[..., 0] * (distortion_scale * half_w)
    dy = d[..., 1] * (distortion_scale * half_h)
    ends = jnp.stack([
        jnp.stack([dx[:, 0], dy[:, 0]], -1),                       # TL
        jnp.stack([w - 1 - dx[:, 1], dy[:, 1]], -1),               # TR
        jnp.stack([w - 1 - dx[:, 2], h - 1 - dy[:, 2]], -1),       # BR
        jnp.stack([dx[:, 3], h - 1 - dy[:, 3]], -1),               # BL
    ], axis=1)
    warped = perspective_batch(imgs, ends, fill)
    apply = jax.random.bernoulli(kp, p, (b, 1, 1, 1))
    return jnp.where(apply, warped, imgs)


# aliases: the make_augment_fn params of the same (dvgl flag) names shadow
# these module functions inside its closure
_random_resized_crop = random_resized_crop
_random_rotation = random_rotation


def make_augment_fn(
    brightness: float = 0,
    contrast: float = 0,
    saturation: float = 0,
    hue: float = 0,
    horizontal_flip: bool = False,
    random_resized_crop: float = 0,
    rand_perspective: float = 0,
    random_rotation: float = 0,
    imagenet_normalized: bool = True,
):
    """Compose the dvgl parser's data-augmentation flags (parser.py:73-84)
    into one ``(key, imgs [B,H,W,3]) -> imgs`` transform for the triplet
    train loop, applied in the reference query_transform's order
    (datasets_ws.py:292-298): jitter -> perspective -> resized-crop ->
    rotation. ``random_resized_crop`` follows the dvgl flag semantics:
    crop area scale is ``(1 - r, 1)`` (datasets_ws.py:297), 0 = off.

    The reference jitters PIL images in [0, 1] RGB *before* ImageNet
    normalization; our batches arrive already normalized, so with
    ``imagenet_normalized=True`` (default) the color jitter un-normalizes,
    operates in [0, 1] space, and re-normalizes — identical math to the
    reference ordering (the geometric ops are channel-affine-invariant).
    Geometric fills use normalized black, the reference's fill=0."""

    def augment(key, imgs):
        kj, kf, kc, kp, kr = jax.random.split(key, 5)
        x = imgs
        if imagenet_normalized:
            from anyloc_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

            fill = jnp.asarray(
                (0.0 - IMAGENET_MEAN) / IMAGENET_STD, imgs.dtype
            )
        else:
            fill = jnp.zeros((3,), imgs.dtype)
        if brightness or contrast or saturation or hue:
            # only the color jitter needs [0, 1] space — flip and the
            # bilinear crop are linear per channel, so per-channel affine
            # normalization commutes with them exactly
            if imagenet_normalized:
                from anyloc_tpu.data.transforms import (
                    IMAGENET_MEAN, IMAGENET_STD,
                )

                mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
                std = jnp.asarray(IMAGENET_STD, x.dtype)
                x = x * std + mean
            x = color_jitter(kj, x, brightness=brightness, contrast=contrast,
                             saturation=saturation, hue=hue)
            if imagenet_normalized:
                x = (x - mean) / std
        if rand_perspective:
            x = random_perspective(kp, x, float(rand_perspective), fill)
        if horizontal_flip:
            flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
            x = jnp.where(flip, x[:, :, ::-1], x)
        if random_resized_crop:
            x = _random_resized_crop(
                kc, x, out_hw=x.shape[1:3],
                scale=(1.0 - float(random_resized_crop), 1.0),
            )
        if random_rotation:
            x = _random_rotation(kr, x, float(random_rotation), fill)
        return x

    return augment
