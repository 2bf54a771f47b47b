"""On-device metric reductions (the fast in-training evaluation path).

The canonical metrics engine (``iswm_tpu.metrics.stream``) reproduces the
reference's host-side evaluators exactly, quirks and all — it is the
parity oracle.  This module provides jit-compatible device reductions for
the pieces that dominate evaluation time, so training-time quick-eval can
run without a host round-trip per frame:

  - streaming confusion matrix (Pallas kernel for the binary case,
    one-hot einsum otherwise; reference stream_metrics.py:24-31);
  - MIoU/FIoU/precision/recall/F1 from the CM (stream_metrics.py:33-63);
  - wave presence ratios (mask_utils.py:138-143, without the morphological
    cleanup — documented approximation);
  - batched per-row front extraction (mask_utils.py:54-75 core) and a
    batched symmetric front-distance error (the O(P*G) double loop of
    front_tracking_metrics.py:48-86 as one [H,H] distance-matrix
    reduction per frame — without the preprocess/weighting quirks).

Use StreamMetrics for reported/parity numbers; use these for cheap
on-device monitoring at scale.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7


@partial(jax.jit, static_argnames=("n_classes",))
def confusion_matrix(gts: jax.Array, preds: jax.Array, n_classes: int = 2) -> jax.Array:
    """[...] int labels/preds -> [C, C] f32 CM (rows = true), 255 excluded."""
    gt = gts.reshape(-1)
    pred = preds.reshape(-1)
    valid = (gt >= 0) & (gt < n_classes)
    onehot_t = jax.nn.one_hot(jnp.where(valid, gt, 0), n_classes, dtype=jnp.float32)
    onehot_p = jax.nn.one_hot(pred, n_classes, dtype=jnp.float32)
    onehot_t = onehot_t * valid[:, None]
    return jnp.einsum("nc,nk->ck", onehot_t, onehot_p)


def binary_confusion_matrix_tpu(gts: jax.Array, preds: jax.Array) -> jax.Array:
    """Pallas path for the binary case (single-chip TPU)."""
    from ..ops.pallas.confusion import binary_confusion_matrix

    return binary_confusion_matrix(gts, preds)


@jax.jit
def foreground_metrics_from_cm(cm: jax.Array) -> dict:
    """(miou, fiou, precision, recall, f1) on device (stream_metrics.py:33-63)."""
    tp = cm[1, 1]
    fp = cm[:, 1].sum() - tp
    fn = cm[1, :].sum() - tp
    fiou = tp / (tp + fp + fn + EPS)
    precision = tp / (tp + fp + EPS)
    recall = tp / (tp + fn + EPS)
    f1 = 2 * precision * recall / (precision + recall + EPS)
    btp = cm[0, 0]
    bfp = cm[:, 0].sum() - btp
    bfn = cm[0, :].sum() - btp
    biou = btp / (btp + bfp + bfn + EPS)
    return {
        "miou": (biou + fiou) / 2.0,
        "fiou": fiou,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


@jax.jit
def wave_presence(masks: jax.Array, threshold: float = 0.005) -> jax.Array:
    """[B, H, W] masks -> [B] bool presence by foreground fraction."""
    ratio = jnp.mean((masks > 0).astype(jnp.float32), axis=(1, 2))
    return ratio >= threshold


@jax.jit
def front_positions_batch(masks: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, H, W] binary masks -> ([B, H] leftmost col, [B, H] row-has-fg)."""
    binary = masks > 0
    has_fg = binary.any(axis=-1)
    cols = jnp.argmax(binary, axis=-1)
    return cols, has_fg


@jax.jit
def symmetric_front_error(
    pred_mask: jax.Array, gt_mask: jax.Array
) -> jax.Array:
    """Batched symmetric nearest-front distance for one frame pair [H, W].

    The device counterpart of the reference's per-point double loop
    (front_tracking_metrics.py:48-86): fronts are (row, leftmost col)
    points; each direction takes the nearest-euclidean distance weighted by
    1/(|dx|+1e-6); the result is max of the two weighted means.  Empty
    cases return the reference's penalties (2*tau miss, 1.5*tau FA, 0).
    """
    h, w = pred_mask.shape
    tau = w * 0.1
    p_cols, p_valid = front_positions_batch(pred_mask[None])
    g_cols, g_valid = front_positions_batch(gt_mask[None])
    p_cols, p_valid = p_cols[0], p_valid[0]
    g_cols, g_valid = g_cols[0], g_valid[0]
    rows = jnp.arange(h, dtype=jnp.float32)

    def directional(src_cols, src_valid, dst_cols, dst_valid):
        dy = rows[:, None] - rows[None, :]
        dx = src_cols.astype(jnp.float32)[:, None] - dst_cols.astype(jnp.float32)[None, :]
        dist = jnp.sqrt(dy**2 + dx**2)
        dist = jnp.where(dst_valid[None, :], dist, jnp.inf)
        nearest = jnp.argmin(dist, axis=1)
        min_dist = jnp.min(dist, axis=1)
        min_dx = jnp.abs(
            src_cols.astype(jnp.float32) - dst_cols.astype(jnp.float32)[nearest]
        )
        ok = src_valid & (min_dist < tau)
        wgt = jnp.where(ok, 1.0 / (min_dx + 1e-6), 0.0)
        err_sum = jnp.sum(jnp.where(ok, min_dist, 0.0) * wgt)
        w_sum = jnp.sum(wgt)
        n_valid = jnp.sum(ok)
        return err_sum, w_sum, n_valid

    p2g = directional(p_cols, p_valid, g_cols, g_valid)
    g2p = directional(g_cols, g_valid, p_cols, p_valid)

    has_p = p_valid.any()
    has_g = g_valid.any()

    pred_avg = p2g[0] / jnp.maximum(p2g[1], 1e-12)
    gt_avg = g2p[0] / jnp.maximum(g2p[1], 1e-12)
    n_g = jnp.maximum(jnp.sum(g_valid), 1)
    coverage = g2p[2] / n_g
    both = jnp.maximum(pred_avg, gt_avg) + 0.5 * (1.0 - coverage) * tau
    both = jnp.where((p2g[2] == 0) | (g2p[2] == 0), 2.0 * tau, both)

    return jnp.where(
        has_g & ~has_p,
        2.0 * tau,
        jnp.where(~has_g & has_p, 1.5 * tau, jnp.where(~has_g & ~has_p, 0.0, both)),
    )


class DeviceEvalAccumulator:
    """Streaming device-side CM accumulation over eval batches."""

    def __init__(self, n_classes: int = 2):
        self.n_classes = n_classes
        self.cm = jnp.zeros((n_classes, n_classes), jnp.float32)

    def update(self, gts: jax.Array, preds: jax.Array) -> None:
        self.cm = self.cm + confusion_matrix(gts, preds, self.n_classes)

    def results(self) -> dict:
        return {k: float(v) for k, v in foreground_metrics_from_cm(self.cm).items()}

    def reset(self) -> None:
        self.cm = jnp.zeros((self.n_classes, self.n_classes), jnp.float32)
