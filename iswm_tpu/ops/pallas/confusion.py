"""Pallas TPU kernel: streaming binary confusion-matrix accumulation.

On-device replacement for the reference's host-side bincount
(reference metrics/stream_metrics.py:24-31): predictions and labels never
leave the device; the kernel walks 128-lane row tiles sequentially and
keeps the four counters (tn, fp, fn, tp) in SMEM, emitting one [2,2]
matrix.  Labels outside [0, 2) (the 255 ignore value) are excluded, as in
``_fast_hist``'s mask.

Generalization to n_classes > 2 uses the jnp one-hot matmul path in
``iswm_tpu.metrics.device`` — the binary case is the production config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BLOCK_ROWS = 512


def _kernel(gt_ref, pred_ref, out_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for i in range(4):
            acc_ref[i] = 0.0

    gt = gt_ref[:]
    pred = pred_ref[:]
    valid = (gt >= 0) & (gt < 2)
    g = jnp.where(valid & (gt == 1), 1.0, 0.0)
    p = jnp.where(pred == 1, 1.0, 0.0)
    v = jnp.where(valid, 1.0, 0.0)
    tp = jnp.sum(g * p)
    fn = jnp.sum(g * (1.0 - p) * v)
    fp = jnp.sum((1.0 - g) * p * v)
    tn = jnp.sum((1.0 - g) * (1.0 - p) * v)
    acc_ref[0] += tn
    acc_ref[1] += fp
    acc_ref[2] += fn
    acc_ref[3] += tp

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        for i in range(4):
            out_ref[i] = acc_ref[i]


def binary_confusion_matrix(
    gts: jax.Array, preds: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """[...,] int labels/preds -> [2,2] float32 confusion matrix (rows=true)."""
    gt = gts.reshape(-1).astype(jnp.int32)
    pred = preds.reshape(-1).astype(jnp.int32)
    m = gt.shape[0]
    rows = -(-m // LANES)
    rows = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    pad = rows * LANES - m
    # pad labels with an out-of-range value -> excluded by the valid mask
    gt = jnp.pad(gt, (0, pad), constant_values=255).reshape(rows, LANES)
    pred = jnp.pad(pred, (0, pad)).reshape(rows, LANES)

    out = pl.pallas_call(
        _kernel,
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((4,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(gt, pred)
    return out.reshape(2, 2)
