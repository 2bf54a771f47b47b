"""Device-resident paired augmentation pipeline.

TPU-native redesign of the reference's PIL transform chain (reference
utils/ext_transforms.py; assembled at train.py:355-368).  The reference
resizes/crops on the host per-sample with dynamic intermediate shapes; here
random-scale + random-crop(pad_if_needed) + hflip compose into ONE static-
shape affine gather per sample executed on device under ``vmap`` + ``jit``:

    out[y, x] = img[(crop_top + y + 0.5)/s - 0.5, (crop_left + x + 0.5)/s - 0.5]

with bilinear taps for images (PIL BILINEAR), nearest for labels (NEAREST,
ext_transforms.py:111 & 137), and zero fill outside the source — matching
ExtRandomCrop's pad fill of 0 for both image and label
(ext_transforms.py:380-388, torchvision F.pad default).

Semantics preserved:
  - scale ~ U(0.5, 2.0) (ExtRandomScale, :94-115)
  - crop offset ~ U{0 .. scaled-th} when larger, centered pad when smaller
    (ExtRandomCrop(pad_if_needed=True), :327-396)
  - hflip with p=0.5 (ExtRandomHorizontalFlip, :212-233)
  - ToTensor /255 + ImageNet normalize (:273-324)

The "available but unused" reference transforms (center crop, fixed scale,
vflip, pad-to-multiple, resize; ext_transforms.py:67-271,399-427) are
provided as pure functions below for API completeness.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class AugmentConfig(NamedTuple):
    crop_size: int = 513
    scale_min: float = 0.5
    scale_max: float = 2.0
    hflip_prob: float = 0.5
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD


# --------------------------------------------------------------- sampling
# The scale+crop affine has no rotation, so the resample is SEPARABLE:
# out[y, x] = img[f(y), g(x)].  Two 1-D takes (whole rows, then whole
# columns) replace a 2-D gather — contiguous-lane friendly on TPU, where
# the naive 4-tap scatter/gather costs ~10x more (measured 143 -> ~40 ms
# per 8x512^2 fused train step).


def _separable_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample HWC image at the outer grid of float coords ys [Th], xs [Tw];
    out-of-bounds taps contribute 0 (pad fill)."""
    h, w = img.shape[0], img.shape[1]

    y0 = jnp.floor(ys)
    wy = (ys - y0)[:, None, None]
    y0i = y0.astype(jnp.int32)

    def take_rows(idx):
        valid = ((idx >= 0) & (idx < h))[:, None, None]
        return jnp.take(img, jnp.clip(idx, 0, h - 1), axis=0) * valid

    tmp = take_rows(y0i) * (1 - wy) + take_rows(y0i + 1) * wy  # [Th, W, C]

    x0 = jnp.floor(xs)
    wx = (xs - x0)[None, :, None]
    x0i = x0.astype(jnp.int32)

    def take_cols(idx):
        valid = ((idx >= 0) & (idx < w))[None, :, None]
        return jnp.take(tmp, jnp.clip(idx, 0, w - 1), axis=1) * valid

    return take_cols(x0i) * (1 - wx) + take_cols(x0i + 1) * wx


def _separable_nearest(lbl: jax.Array, ys: jax.Array, xs: jax.Array, fill) -> jax.Array:
    """Nearest sample of an HW integer label at the outer grid (ys, xs)."""
    h, w = lbl.shape[0], lbl.shape[1]
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    rows = jnp.take(lbl, jnp.clip(yi, 0, h - 1), axis=0)
    out = jnp.take(rows, jnp.clip(xi, 0, w - 1), axis=1)
    valid = ((yi >= 0) & (yi < h))[:, None] & ((xi >= 0) & (xi < w))[None, :]
    return jnp.where(valid, out, fill)


# --------------------------------------------------------- train pipeline
def augment_sample(
    key: jax.Array,
    image: jax.Array,  # [H, W, C] float in [0, 1] (post /255)
    label: jax.Array,  # [H, W] int
    cfg: AugmentConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Random scale + crop(pad) + hflip + normalize for one sample."""
    th = tw = cfg.crop_size
    h, w = image.shape[0], image.shape[1]
    k_scale, k_top, k_left, k_flip = jax.random.split(key, 4)

    scale = jax.random.uniform(k_scale, (), minval=cfg.scale_min, maxval=cfg.scale_max)
    # Integer scaled dims, as PIL computes them (int(h*s); ext_transforms.py:110)
    sh = jnp.floor(h * scale).astype(jnp.int32)
    sw = jnp.floor(w * scale).astype(jnp.int32)
    eff_sy = sh.astype(jnp.float32) / h  # effective per-axis scale after int floor
    eff_sx = sw.astype(jnp.float32) / w

    def offset(k, scaled, target):
        # larger: U{0..scaled-target}; smaller: centered negative offset
        # (pad_if_needed centers via symmetric pad, ext_transforms.py:380-388)
        big = jax.random.randint(k, (), 0, jnp.maximum(scaled - target, 0) + 1)
        small = (scaled - target) // 2
        return jnp.where(scaled >= target, big, small).astype(jnp.float32)

    top = offset(k_top, sh, th)
    left = offset(k_left, sw, tw)

    oy = jnp.arange(th, dtype=jnp.float32)
    ox = jnp.arange(tw, dtype=jnp.float32)
    # map output pixel center -> scaled-space -> source space (half-pixel);
    # the transform is axis-separable (no rotation), so 1-D coord vectors
    # suffice and the resample runs as two contiguous takes
    src_y = (top + oy + 0.5) / eff_sy - 0.5  # [th]
    src_x = (left + ox + 0.5) / eff_sx - 0.5  # [tw]
    # hflip folds into the output-column order (no flipped copy materialized)
    flip = jax.random.uniform(k_flip) < cfg.hflip_prob
    src_x = jnp.where(flip, src_x[::-1], src_x)

    out_img = _separable_bilinear(image.astype(jnp.float32), src_y, src_x)
    out_lbl = _separable_nearest(label, src_y, src_x, fill=jnp.zeros((), label.dtype))

    out_img = normalize(out_img, cfg.mean, cfg.std)
    return out_img, out_lbl


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, C] float [0,1] or uint8
    labels: jax.Array,  # [B, H, W] int
    cfg: AugmentConfig,
) -> Tuple[jax.Array, jax.Array]:
    """vmap the per-sample augmentation over the batch (device-resident)."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, l: augment_sample(k, i, l, cfg))(keys, images, labels)


# ---------------------------------------------------------- val / predict
def normalize(
    image: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jax.Array:
    """(x - mean) / std per channel (ExtNormalize, ext_transforms.py:298-324)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (image.astype(jnp.float32) - mean) / std


def denormalize(
    image: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return image * std + mean


def val_transform_batch(images: jax.Array, cfg: Optional[AugmentConfig] = None):
    """ToTensor + Normalize only (reference train.py:364-368)."""
    cfg = cfg or AugmentConfig()
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    return normalize(images, cfg.mean, cfg.std)


# ------------------------------------- API-completeness paired transforms
def center_crop(image: jax.Array, label: jax.Array, size: int):
    """ExtCenterCrop (ext_transforms.py:67-91)."""
    h, w = image.shape[0], image.shape[1]
    top = (h - size) // 2
    left = (w - size) // 2
    return (
        jax.lax.dynamic_slice(image, (top, left, 0), (size, size, image.shape[2])),
        jax.lax.dynamic_slice(label, (top, left), (size, size)),
    )


def fixed_scale(image: jax.Array, label: jax.Array, scale: float):
    """ExtScale (ext_transforms.py:117-144): fixed scale, bilinear/nearest."""
    h, w = int(image.shape[0] * scale), int(image.shape[1] * scale)
    img = jax.image.resize(image, (h, w, image.shape[2]), "bilinear")
    lbl = jax.image.resize(label, (h, w), "nearest")
    return img, lbl


def random_vflip(key: jax.Array, image: jax.Array, label: jax.Array, p: float = 0.5):
    """ExtRandomVerticalFlip (ext_transforms.py:236-259)."""
    flip = jax.random.uniform(key) < p
    return (
        jnp.where(flip, image[::-1, :, :], image),
        jnp.where(flip, label[::-1, :], label),
    )


def pad_to_multiple(image: jax.Array, label: jax.Array, multiple: int = 32):
    """ExtPad (ext_transforms.py:261-271): right/bottom-pad to a multiple."""
    h, w = image.shape[0], image.shape[1]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    img = jnp.pad(image, ((0, ph), (0, pw), (0, 0)))
    lbl = jnp.pad(label, ((0, ph), (0, pw)))
    return img, lbl


def paired_resize(image: jax.Array, label: jax.Array, size: Tuple[int, int]):
    """ExtResize (ext_transforms.py:399-427)."""
    img = jax.image.resize(image, (*size, image.shape[2]), "bilinear")
    lbl = jax.image.resize(label, size, "nearest")
    return img, lbl


def rotate_pair(
    image: jax.Array,
    label: jax.Array,
    angle_degrees,
    fill: float = 0.0,
):
    """Paired rotation by ``angle_degrees`` counterclockwise around the image
    center, output size unchanged (``expand=False``) — PIL ``F.rotate``
    semantics as used by ExtRandomRotation (ext_transforms.py:147-210).

    Coordinate convention matches PIL ``Image.rotate``: the inverse affine
    maps output pixel centers ``(x+0.5, y+0.5)`` to source coordinates, with
    the matrix built from ``-radians(angle)`` and recentered on ``(w/2, h/2)``.
    Images sample BILINEAR, labels NEAREST (PIL floor of the source coord);
    out-of-frame pixels take ``fill`` (PIL default 0).  Unlike the
    scale/crop/flip chain this transform is not axis-separable, so it uses a
    2-D gather; it is an API-completeness transform (the reference never
    wires rotation into training).
    """
    h, w = image.shape[0], image.shape[1]
    a = -jnp.deg2rad(jnp.asarray(angle_degrees, jnp.float32))
    cos, sin = jnp.cos(a), jnp.sin(a)
    cx, cy = w / 2.0, h / 2.0
    # inverse-affine coefficients, recentered (PIL Image.rotate)
    c0 = cx - cos * cx - sin * cy
    f0 = cy + sin * cx - cos * cy
    oy, ox = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    xin = cos * (ox + 0.5) + sin * (oy + 0.5) + c0  # [H, W]
    yin = -sin * (ox + 0.5) + cos * (oy + 0.5) + f0

    # label: NEAREST = floor of the source coordinate (PIL COORD)
    xi = jnp.floor(xin).astype(jnp.int32)
    yi = jnp.floor(yin).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    lbl = label[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    out_lbl = jnp.where(valid, lbl, jnp.asarray(fill, label.dtype))

    # image: BILINEAR on pixel-center coords, edge taps weighted out
    u = xin - 0.5
    v = yin - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    wx = (u - x0)[..., None]
    wy = (v - y0)[..., None]
    img = image.astype(jnp.float32)

    def tap(yidx, xidx):
        ok = ((xidx >= 0) & (xidx < w) & (yidx >= 0) & (yidx < h))[..., None]
        return img[jnp.clip(yidx, 0, h - 1), jnp.clip(xidx, 0, w - 1)] * ok

    out_img = (
        tap(y0, x0) * (1 - wy) * (1 - wx)
        + tap(y0, x0 + 1) * (1 - wy) * wx
        + tap(y0 + 1, x0) * wy * (1 - wx)
        + tap(y0 + 1, x0 + 1) * wy * wx
    )
    # pixels whose center falls outside the source frame take the fill
    # (PIL writes fill wherever the nearest source pixel is out of frame)
    out_img = jnp.where(valid[..., None], out_img, fill)
    return out_img, out_lbl


def random_rotation(
    key: jax.Array,
    image: jax.Array,
    label: jax.Array,
    degrees=(-10.0, 10.0),
    fill: float = 0.0,
):
    """ExtRandomRotation (ext_transforms.py:147-210): uniform angle in
    ``degrees`` (a scalar d means (-d, d)), expand=False, center rotation."""
    if not hasattr(degrees, "__len__"):
        degrees = (-float(degrees), float(degrees))
    angle = jax.random.uniform(
        key, (), minval=degrees[0], maxval=degrees[1]
    )
    return rotate_pair(image, label, angle, fill=fill)


def color_jitter(
    key: jax.Array,
    image: jax.Array,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
):
    """ExtColorJitter subset (ext_transforms.py:429-519): brightness/contrast/
    saturation jitter with torchvision factor semantics, random order omitted."""
    k_b, k_c, k_s = jax.random.split(key, 3)
    img = image.astype(jnp.float32)
    if brightness > 0:
        f = jax.random.uniform(k_b, (), minval=max(0, 1 - brightness), maxval=1 + brightness)
        img = img * f
    if contrast > 0:
        f = jax.random.uniform(k_c, (), minval=max(0, 1 - contrast), maxval=1 + contrast)
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
        img = gray + (img - gray) * f
    if saturation > 0:
        f = jax.random.uniform(k_s, (), minval=max(0, 1 - saturation), maxval=1 + saturation)
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])[..., None]
        img = gray + (img - gray) * f
    return jnp.clip(img, 0.0, 1.0)
