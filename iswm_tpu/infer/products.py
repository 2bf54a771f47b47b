"""Prediction products: masks, confidence maps, broken-area bands,
synthetic damage.

Semantics parity with the reference inference pipeline (reference
predict.py):
  - prediction = fg-prob > threshold (0.5 default) — NOT argmax
    (predict.py:275; validation uses argmax, train.py:644 — both offered);
  - confidence map = fg-prob * 255 uint8 (predict.py:281-284);
  - broken-area band: pixels with fg prob in [min_prob, max_prob] ->
    255 (binarize_confidence_map, predict.py:214-256);
  - wave presence: fg area ratio > 0.01 (has_internal_wave,
    predict.py:99-125);
  - synthetic damage for no-wave scenes with prob 0.8: rotated ellipses
    ('random_structures'), sinusoidal vertical curves ('linear'), noise
    fill to the 0.05 target ratio (generate_synthetic_broken_areas,
    predict.py:127-212) — cv2.line replaced by a numpy disk-stamped
    polyline.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np


def prob_to_mask(prob_fg: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """Thresholded foreground mask (predict semantics)."""
    return (np.asarray(prob_fg) > threshold).astype(np.uint8)


def confidence_map(prob_fg: np.ndarray) -> np.ndarray:
    """fg-prob scaled to uint8 0-255."""
    return (np.clip(np.asarray(prob_fg), 0, 1) * 255).astype(np.uint8)


def has_internal_wave(pred_mask: np.ndarray, area_threshold: float = 0.01) -> bool:
    """Foreground-area presence test (reference predict.py:99-125)."""
    pred_mask = np.asarray(pred_mask)
    if pred_mask.ndim == 3 and pred_mask.shape[2] == 3:
        foreground = np.all(pred_mask == 255, axis=2)
    else:
        foreground = pred_mask > 127
    return float(foreground.sum()) / foreground.size > area_threshold


def _stamp_disk(mask: np.ndarray, cy: int, cx: int, r: int) -> None:
    h, w = mask.shape
    y0, y1 = max(0, cy - r), min(h, cy + r + 1)
    x0, x1 = max(0, cx - r), min(w, cx + r + 1)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.ogrid[y0:y1, x0:x1]
    mask[y0:y1, x0:x1][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255


def _draw_polyline(mask: np.ndarray, xs: np.ndarray, ys: np.ndarray, thickness: int):
    """Thick polyline by stamping disks along densified segments (replaces
    cv2.line in the reference, predict.py:203)."""
    r = max(1, thickness // 2)
    for i in range(len(xs) - 1):
        n = max(2, int(np.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])) + 1)
        for t in np.linspace(0, 1, n):
            _stamp_disk(
                mask,
                int(round(ys[i] + t * (ys[i + 1] - ys[i]))),
                int(round(xs[i] + t * (xs[i + 1] - xs[i]))),
                r,
            )


def generate_synthetic_broken_areas(
    image_shape,
    style: str = "linear",
    ratio: float = 0.05,
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Synthetic 'damage' mask for no-wave scenes (reference
    predict.py:127-212).  Styles: 'random_structures' (rotated ellipses),
    'linear' (sinusoidal vertical curves), anything else falls through to
    the noise fill that tops the area up to ``ratio``."""
    rng = rng or random
    height, width = image_shape[:2]
    target = int(height * width * ratio)
    mask = np.zeros((height, width), dtype=np.uint8)

    if style == "random_structures":
        for _ in range(rng.randint(2, 5)):
            cy = rng.randint(0, height - 1)
            cx = rng.randint(0, width - 1)
            major = rng.randint(10, max(11, int(min(height, width) * 0.3)))
            minor = rng.randint(5, major)
            angle = rng.uniform(0, 180)
            y, x = np.ogrid[:height, :width]
            ca, sa = np.cos(np.radians(angle)), np.sin(np.radians(angle))
            xc, yc = x - cx, y - cy
            xct = xc * ca - yc * sa
            yct = xc * sa + yc * ca
            mask[(xct**2) / major**2 + (yct**2) / minor**2 <= 1] = 255
    elif style == "linear":
        num_lines = rng.randint(1, 3)
        thickness = rng.randint(3, 15)
        for _ in range(num_lines):
            x_level = rng.randint(int(width * 0.3), int(width * 0.7))
            start_y = rng.randint(0, int(height * 0.3))
            end_y = rng.randint(int(height * 0.7), height - 1)
            ys = np.linspace(start_y, end_y, 100)
            amplitude = rng.uniform(5, 20)
            frequency = rng.uniform(0.1, 0.5)
            xs = x_level + amplitude * np.sin(
                frequency * np.pi * np.linspace(0, 1, 100)
            )
            _draw_polyline(mask, xs, ys, thickness)

    current = int((mask > 0).sum())
    if current < target:
        remaining = target - current
        np_rng = np.random.default_rng(rng.randint(0, 2**31 - 1) if rng is not random else None)
        ys = np_rng.integers(0, height, size=remaining)
        xs = np_rng.integers(0, width, size=remaining)
        mask[ys, xs] = 255
    return mask


def binarize_confidence_map(
    confidence: np.ndarray,
    *,
    min_prob: float = 0.2,
    max_prob: float = 0.7,
    pred_mask: Optional[np.ndarray] = None,
    enable_wave_processing: bool = False,
    internal_wave_area_threshold: float = 0.01,
    synthetic_prob: float = 0.8,
    synthetic_ratio: float = 0.05,
    force_style: Optional[str] = None,
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Broken-area ("to repair") mask from a uint8 confidence map
    (reference binarize_confidence_map, predict.py:214-256)."""
    rng = rng or random
    conf = np.asarray(confidence, dtype=np.float32) / 255.0
    binary = np.zeros(conf.shape, dtype=np.uint8)
    binary[(conf >= min_prob) & (conf <= max_prob)] = 255

    if enable_wave_processing and pred_mask is not None:
        if not has_internal_wave(pred_mask, internal_wave_area_threshold):
            if rng.random() < synthetic_prob:
                style = force_style or rng.choice(
                    ["random_structures", "blob", "linear"]
                )
                synthetic = generate_synthetic_broken_areas(
                    conf.shape, style=style, ratio=synthetic_ratio, rng=rng
                )
                binary = np.maximum(binary, synthetic)
    return binary
