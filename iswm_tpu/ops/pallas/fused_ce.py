"""Pallas TPU kernel: fused binary softmax-cross-entropy.

The BASELINE north star asks for the loss to fuse into the network tail
(BASELINE.json: "custom adaptive weighted cross-entropy ... fuse into the
final conv+softmax").  For the binary case (num_classes=2 — the
framework's production configuration, reference train.py:384-387) the
whole loss collapses to elementwise VPU math over well-tiled arrays:

    logz  = max(a,b) + log1p(exp(-|a-b|))
    ce    = logz - (label ? b : a)
    loss  = sum(w[label] * ce * valid) / sum(w[label] * valid)

Layout: the [B,H,W,2] logits are flattened and padded to rows of 128
lanes; the kernel walks row-tiles sequentially (TPU grid order), keeping
running (ce_sum, w_sum) accumulators in SMEM and emitting the two scalars
once at the end.  Ignored pixels (255) carry weight 0, padding is labeled
255, so no masking logic is needed beyond the weight.

The backward pass is the usual (softmax - onehot) * w / w_sum, also pure
VPU, recomputed from the saved logits (no residual activations).

``fused_binary_ce(logits, labels, class_weights, ignore_index)`` is a
drop-in for ``ops.losses.cross_entropy_loss`` / ``weighted_...`` when
num_classes == 2; falls back to the jnp path otherwise.  Set
``interpret=True`` for CPU tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
_BLOCK_ROWS = 512  # rows of 128 lanes per grid step (64 KB of f32 per operand)


def _pad_flatten(
    logits: jax.Array, labels: jax.Array, ignore_index: int
) -> Tuple[jax.Array, jax.Array, jax.Array, int]:
    """[..., 2] logits + [...] labels -> ([R,128] a, [R,128] b, [R,128] lbl)."""
    a = logits[..., 0].reshape(-1)
    b = logits[..., 1].reshape(-1)
    lbl = labels.reshape(-1)
    m = a.shape[0]
    rows = -(-m // LANES)
    # round rows up to a block multiple so the grid is exact
    rows = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    pad = rows * LANES - m
    a = jnp.pad(a, (0, pad)).reshape(rows, LANES)
    b = jnp.pad(b, (0, pad)).reshape(rows, LANES)
    lbl = jnp.pad(lbl, (0, pad), constant_values=ignore_index).reshape(rows, LANES)
    return a, b, lbl, rows


def _ce_elements(a, b, lbl, w0, w1, ignore_index):
    """Per-element (weighted ce, weight) in f32."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mx = jnp.maximum(a, b)
    logz = mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    is_one = lbl == 1
    label_logit = jnp.where(is_one, b, a)
    ce = logz - label_logit
    valid = lbl != ignore_index
    w = jnp.where(is_one, w1, w0)
    w = jnp.where(valid, w, 0.0)
    return ce * w, w


def _fwd_kernel(a_ref, b_ref, lbl_ref, cw_ref, out_ref, acc_ref, *, ignore_index):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[0] = 0.0
        acc_ref[1] = 0.0

    wce, w = _ce_elements(
        a_ref[:], b_ref[:], lbl_ref[:], cw_ref[0], cw_ref[1], ignore_index
    )
    acc_ref[0] += jnp.sum(wce)
    acc_ref[1] += jnp.sum(w)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[0] = acc_ref[0]
        out_ref[1] = acc_ref[1]


def _fwd_sums(a, b, lbl, cw, ignore_index, interpret):
    rows = a.shape[0]
    grid = rows // _BLOCK_ROWS
    kernel = functools.partial(_fwd_kernel, ignore_index=ignore_index)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(a, b, lbl, cw)
    return out


def _bwd_kernel(a_ref, b_ref, lbl_ref, cw_ref, scale_ref, da_ref, db_ref, *, ignore_index):
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    lbl = lbl_ref[:]
    # p1 = sigmoid(b - a); softmax over 2 classes
    p1 = jax.nn.sigmoid(b - a)
    is_one = lbl == 1
    valid = lbl != ignore_index
    w = jnp.where(is_one, cw_ref[1], cw_ref[0])
    w = jnp.where(valid, w, 0.0)
    scale = scale_ref[0]  # g / w_sum
    y1 = jnp.where(is_one, 1.0, 0.0)
    da_ref[:] = ((1.0 - p1) - (1.0 - y1)) * w * scale
    db_ref[:] = (p1 - y1) * w * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_binary_ce(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array,
    ignore_index: int = 255,
    interpret: bool = False,
) -> jax.Array:
    """Weighted mean CE over valid pixels for 2-class logits [..., 2]."""
    loss, _ = _fwd(logits, labels, class_weights, ignore_index, interpret)
    return loss


def _fwd(logits, labels, class_weights, ignore_index, interpret):
    a, b, lbl, _ = _pad_flatten(logits, labels, ignore_index)
    cw = jnp.asarray(class_weights, jnp.float32)
    sums = _fwd_sums(a, b, lbl, cw, ignore_index, interpret)
    w_sum = jnp.maximum(sums[1], 1e-12)
    loss = sums[0] / w_sum
    return loss, (logits, labels, cw, w_sum)


def _bwd(ignore_index, interpret, res, g):
    logits, labels, cw, w_sum = res
    a, b, lbl, rows = _pad_flatten(logits, labels, ignore_index)
    scale = jnp.asarray([g / w_sum], jnp.float32)
    grid = rows // _BLOCK_ROWS
    kernel = functools.partial(_bwd_kernel, ignore_index=ignore_index)
    da, db = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, lbl, jnp.asarray(cw, jnp.float32), scale)

    m = int(np_prod(labels.shape))
    da = da.reshape(-1)[:m].reshape(labels.shape)
    db = db.reshape(-1)[:m].reshape(labels.shape)
    d_logits = jnp.stack([da, db], axis=-1).astype(logits.dtype)
    return d_logits, None, None


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


fused_binary_ce.defvjp(
    lambda logits, labels, cw, ignore_index, interpret: _fwd(
        logits, labels, cw, ignore_index, interpret
    ),
    _bwd,
)


# ------------------------------------------------------------- multi-chip
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sharded_local_ce(logits, labels, cw, ignore_index, interpret, axis):
    """Per-shard fused CE body: local Pallas partial sums, psum over the
    data axis (ICI), global weighted mean.  Runs inside shard_map."""
    loss, _ = _sharded_local_fwd(logits, labels, cw, ignore_index, interpret, axis)
    return loss


def _sharded_local_fwd(logits, labels, cw, ignore_index, interpret, axis):
    a, b, lbl, _ = _pad_flatten(logits, labels, ignore_index)
    sums = _fwd_sums(a, b, lbl, cw, ignore_index, interpret)
    sums = jax.lax.psum(sums, axis)  # ICI all-reduce of (ce_sum, w_sum)
    w_sum = jnp.maximum(sums[1], 1e-12)
    return sums[0] / w_sum, (logits, labels, cw, w_sum)


def _sharded_local_bwd(ignore_index, interpret, axis, res, g):
    # With out_specs=P() + check_rep=False the replicated scalar's cotangent
    # arrives SPLIT across shards (g/axis_size each); psum restores the true
    # scalar cotangent.  d_logits itself is purely local after that —
    # (softmax - onehot) * w * g / w_sum_global, w_sum already global.
    g = jax.lax.psum(g, axis)
    d_logits, _, _ = _bwd(ignore_index, interpret, res, g)
    return d_logits, None, None


_sharded_local_ce.defvjp(_sharded_local_fwd, _sharded_local_bwd)


def make_sharded_fused_ce(mesh, axis: str = "data", ignore_index: int = 255,
                          interpret: bool = False):
    """Multi-chip fused CE: the Pallas kernel runs on each chip's local
    batch shard (no GSPMD all-gather of the full-resolution logits) and the
    (ce_sum, w_sum) pair is psum-reduced over the mesh's data axis.

    Returns ``loss_fn(logits, labels, class_weights)`` usable inside a
    sharded jit; differentiable end-to-end.
    """
    from jax.sharding import PartitionSpec as P

    def loss_fn(logits, labels, class_weights):
        cw = jnp.asarray(class_weights, jnp.float32)
        fn = jax.shard_map(
            lambda lg, lb, w: _sharded_local_ce(
                lg, lb, w, ignore_index, interpret, axis
            ),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(logits, labels, cw)

    return loss_fn
