"""Spatial resize ops with torch-interpolate semantics.

The reference upsamples with ``F.interpolate(mode='bilinear',
align_corners=False)`` (reference network/utils.py:22, _deeplab.py:58,141).
``jax.image.resize(method='bilinear')`` uses the same half-pixel-center
convention, so outputs match torch within float tolerance.  Labels are
always resized NEAREST (reference utils/ext_transforms.py:137-140).
"""

from __future__ import annotations

import jax


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinearly resize NHWC (or HWC) ``x`` to spatial ``size`` (H, W)."""
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"expected 3D/4D input, got {x.ndim}D")
    return jax.image.resize(x, shape, method="bilinear")


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize; preserves integer dtypes (for labels)."""
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        shape = (size[0], size[1], x.shape[2])
    elif x.ndim == 2:
        shape = size
    else:
        raise ValueError(f"expected 2D/3D/4D input, got {x.ndim}D")
    return jax.image.resize(x, shape, method="nearest")
