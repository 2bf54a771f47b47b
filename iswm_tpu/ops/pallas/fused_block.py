"""Fused BatchNorm-training residual-block kernels (Pallas TPU).

Why: training-mode BatchNorm forces XLA into a stats-then-normalize double
pass per conv that it cannot fuse into either the producing or the
consuming conv.  On the 512x512 train step this pins layer1 of the ResNet
backbone at ~33 TFLOP/s / ~750 GB/s — pure HBM roofline
(logs/profile/attribution.txt; ROADMAP "Performance").  The reference
never had this problem statement (torch eager + cuDNN BN kernels,
reference network/backbone/resnet.py:78-120); the TPU-native fix is to
restructure the block so every tensor crosses HBM once per direction:

  - ``matmul_bn_stats``: 1x1 conv as a flattened matmul that also emits
    the per-channel sum / sum-of-squares of its OUTPUT in the same pass,
    with an optional fused normalize+ReLU PROLOGUE on its input (the
    previous conv's BN applied on the fly, so the normalized tensor is
    never materialized in HBM).
  - ``conv3x3_bn_stats``: same contract for the 3x3 (stride 1) conv,
    computed as a row-halo im2col matmul (3 taps of K=3*C depth).

Both carry custom VJPs whose backward kernels fuse the BN backward
reductions (d-sum, d-sumsq contributions), the ReLU mask, the dgrad
matmul and the wgrad accumulation into one pass over each tensor.

Statistics semantics match ``flax.linen.BatchNorm`` exactly: stats are
computed in f32 over the bf16-rounded conv output, fast variance
``max(0, E[y^2] - E[y]^2)``, normalize math in f32 cast back to the
compute dtype (see flax.linen.normalization._compute_stats/_normalize).
Reduction/summation order differs from XLA's, so results agree to bf16
rounding, not bitwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def _pick_tile_m(m: int, target: int = 2048) -> int:
    """Largest divisor of ``m`` that is <= target and a multiple of 16
    (the bf16 sublane tile); 0 if none exists."""
    best = 0
    for t in range(16, target + 1, 16):
        if m % t == 0:
            best = t
    return best


# ---------------------------------------------------------------------------
# matmul + stats (1x1 conv), optional normalize+ReLU prologue
# ---------------------------------------------------------------------------


def _mm_fwd_kernel(x_ref, w_ref, a_ref, b_ref, y_ref, s_ref, q_ref, *, prologue):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    x = x_ref[:]
    if prologue:
        zf = x.astype(f32) * a_ref[:] + b_ref[:]
        z = jnp.maximum(zf, 0.0).astype(x.dtype)
    else:
        z = x
    y = jnp.dot(z, w_ref[:], preferred_element_type=f32)
    yb = y.astype(y_ref.dtype)
    y_ref[:] = yb
    yf = yb.astype(f32)
    s_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
    q_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _mm_bwd_kernel(
    x_ref, w_ref, a_ref, b_ref, y_ref, dy_ref, ds_ref, dq_ref,
    dx_ref, dw_ref, da_ref, db_ref, *, prologue,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    # Total cotangent of the conv output y: direct dy plus the stats paths
    # (s = sum y, q = sum y^2  =>  dy_total = dy + ds + 2 y dq).
    dyt = dy_ref[:].astype(f32) + ds_ref[:] + 2.0 * y_ref[:].astype(f32) * dq_ref[:]
    dytb = dyt.astype(x.dtype)
    # dgrad: [M,N] x [K,N]^T -> [M,K]
    dz = jax.lax.dot_general(
        dytb, w_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    if prologue:
        xf = x.astype(f32)
        zf = xf * a_ref[:] + b_ref[:]
        z = jnp.maximum(zf, 0.0).astype(x.dtype)
        dzm = jnp.where(zf > 0.0, dz, 0.0)
        dx_ref[:] = (dzm * a_ref[:]).astype(dx_ref.dtype)
        da_ref[:] += jnp.sum(dzm * xf, axis=0, keepdims=True)
        db_ref[:] += jnp.sum(dzm, axis=0, keepdims=True)
        zin = z
    else:
        dx_ref[:] = dz.astype(dx_ref.dtype)
        zin = x
    # wgrad: [M,K]^T x [M,N] -> [K,N], accumulated across the grid
    dw_ref[:] += jax.lax.dot_general(
        zin, dytb, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )


def _mm_fwd(x, w, a, b, prologue, interpret):
    m, k = x.shape
    n = w.shape[1]
    tm = _pick_tile_m(m)
    if tm == 0:
        raise ValueError(f"M={m} has no tile divisor; pad the batch")
    grid = (m // tm,)
    a2 = (a if a is not None else jnp.zeros((k,), f32)).reshape(1, k)
    b2 = (b if b is not None else jnp.zeros((k,), f32)).reshape(1, k)
    y, s, q = pl.pallas_call(
        functools.partial(_mm_fwd_kernel, prologue=prologue),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), x.dtype),
            jax.ShapeDtypeStruct((1, n), f32),
            jax.ShapeDtypeStruct((1, n), f32),
        ],
        interpret=interpret,
    )(x, w, a2, b2)
    return y, s[0], q[0]


def _mm_bwd_call(x, w, a, b, y, dy, ds, dq, prologue, interpret):
    m, k = x.shape
    n = w.shape[1]
    tm = _pick_tile_m(m)
    grid = (m // tm,)
    a2 = (a if a is not None else jnp.zeros((k,), f32)).reshape(1, k)
    b2 = (b if b is not None else jnp.zeros((k,), f32)).reshape(1, k)
    dx, dw, da, db = pl.pallas_call(
        functools.partial(_mm_bwd_kernel, prologue=prologue),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
            pl.BlockSpec((tm, n), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype),
            jax.ShapeDtypeStruct((k, n), f32),
            jax.ShapeDtypeStruct((1, k), f32),
            jax.ShapeDtypeStruct((1, k), f32),
        ],
        interpret=interpret,
    )(x, w, a2, b2, y, dy, ds.reshape(1, n), dq.reshape(1, n))
    return dx, dw, da[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def matmul_bn_stats(x, w, a, b, prologue: bool = False, interpret: bool = False):
    """``y = (relu(a*x+b) if prologue else x) @ w`` plus output stats.

    x: [M, K] compute-dtype; w: [K, N]; a, b: [K] f32 arrays (pass zeros
    when ``prologue`` is False — they are ignored but must be arrays so
    the VJP structure is static).  Returns (y [M,N], s [N] f32, q [N]
    f32) with s = sum_M y, q = sum_M y^2 in f32 over the rounded output.
    """
    return _mm_fwd(x, w, a, b, prologue, interpret)


def _mm_vjp_fwd(x, w, a, b, prologue, interpret):
    y, s, q = _mm_fwd(x, w, a, b, prologue, interpret)
    return (y, s, q), (x, w, a, b, y)


def _mm_vjp_bwd(prologue, interpret, res, g):
    x, w, a, b, y = res
    dy, ds, dq = g
    dx, dw, da, db = _mm_bwd_call(x, w, a, b, y, dy, ds, dq, prologue, interpret)
    # da/db are structurally zero when prologue=False (never accumulated).
    return dx, dw.astype(w.dtype), da, db


matmul_bn_stats.defvjp(_mm_vjp_fwd, _mm_vjp_bwd)


# ---------------------------------------------------------------------------
# 3x3 conv (stride 1, dilation 1) + stats, normalize+ReLU prologue
# ---------------------------------------------------------------------------


def _c3_fwd_kernel(
    ym_ref, yt_ref, yb_ref, a_ref, b_ref, w_ref, y2_ref, s_ref, q_ref,
    zbuf, *, th, width, cin, cout,
):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, pl.program_id(0) == 0))
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    a = a_ref[0].reshape(1, 1, cin)
    b = b_ref[0].reshape(1, 1, cin)

    def prologue(rows):  # [R, W, C] -> normalized+ReLU, compute dtype
        zf = rows.astype(f32) * a + b
        return jnp.maximum(zf, 0.0).astype(zbuf.dtype)

    zbuf[1 : th + 1, 1 : width + 1, :] = prologue(ym_ref[0])
    zero_row = jnp.zeros((1, width, cin), zbuf.dtype)

    @pl.when(i > 0)
    def _():
        zbuf[0:1, 1 : width + 1, :] = prologue(yt_ref[0])

    @pl.when(i == 0)
    def _():
        zbuf[0:1, 1 : width + 1, :] = zero_row

    @pl.when(i < ni - 1)
    def _():
        zbuf[th + 1 : th + 2, 1 : width + 1, :] = prologue(yb_ref[0])

    @pl.when(i == ni - 1)
    def _():
        zbuf[th + 1 : th + 2, 1 : width + 1, :] = zero_row

    zbuf[:, 0:1, :] = jnp.zeros((th + 2, 1, cin), zbuf.dtype)
    zbuf[:, width + 1 : width + 2, :] = jnp.zeros((th + 2, 1, cin), zbuf.dtype)

    acc = jnp.zeros((th * width, cout), f32)
    for ky in range(3):
        for kx in range(3):
            ztap = zbuf[ky : ky + th, kx : kx + width, :].reshape(th * width, cin)
            acc += jnp.dot(ztap, w_ref[ky * 3 + kx], preferred_element_type=f32)
    yb = acc.astype(y2_ref.dtype)
    y2_ref[0] = yb.reshape(th, width, cout)
    yf = yb.astype(f32)
    s_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
    q_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _c3_bwd_kernel(
    ym_ref, yt_ref, yb_ref,
    y2m_ref, y2t_ref, y2b_ref,
    gm_ref, gt_ref, gb_ref,
    a_ref, b_ref, wt_ref, ds_ref, dq_ref,
    dy1_ref, dw_ref, da_ref, db_ref,
    zbuf, gbuf, *, th, width, cin, cout,
):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(jnp.logical_and(i == 0, pl.program_id(0) == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        da_ref[:] = jnp.zeros_like(da_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    a = a_ref[0].reshape(1, 1, cin)
    b = b_ref[0].reshape(1, 1, cin)
    ds = ds_ref[0].reshape(1, 1, cout)
    dq = dq_ref[0].reshape(1, 1, cout)

    def prologue(rows):
        zf = rows.astype(f32) * a + b
        return jnp.maximum(zf, 0.0).astype(zbuf.dtype)

    def dytot(g_rows, y2_rows):  # dy2 + ds + 2*y2*dq, compute dtype
        return (
            g_rows.astype(f32) + ds + 2.0 * y2_rows.astype(f32) * dq
        ).astype(gbuf.dtype)

    zbuf[1 : th + 1, 1 : width + 1, :] = prologue(ym_ref[0])
    gbuf[1 : th + 1, 1 : width + 1, :] = dytot(gm_ref[0], y2m_ref[0])
    zzero = jnp.zeros((1, width, cin), zbuf.dtype)
    gzero = jnp.zeros((1, width, cout), gbuf.dtype)

    @pl.when(i > 0)
    def _():
        zbuf[0:1, 1 : width + 1, :] = prologue(yt_ref[0])
        gbuf[0:1, 1 : width + 1, :] = dytot(gt_ref[0], y2t_ref[0])

    @pl.when(i == 0)
    def _():
        zbuf[0:1, 1 : width + 1, :] = zzero
        gbuf[0:1, 1 : width + 1, :] = gzero

    @pl.when(i < ni - 1)
    def _():
        zbuf[th + 1 : th + 2, 1 : width + 1, :] = prologue(yb_ref[0])
        gbuf[th + 1 : th + 2, 1 : width + 1, :] = dytot(gb_ref[0], y2b_ref[0])

    @pl.when(i == ni - 1)
    def _():
        zbuf[th + 1 : th + 2, 1 : width + 1, :] = zzero
        gbuf[th + 1 : th + 2, 1 : width + 1, :] = gzero

    zbuf[:, 0:1, :] = jnp.zeros((th + 2, 1, cin), zbuf.dtype)
    zbuf[:, width + 1 : width + 2, :] = jnp.zeros((th + 2, 1, cin), zbuf.dtype)
    gbuf[:, 0:1, :] = jnp.zeros((th + 2, 1, cout), gbuf.dtype)
    gbuf[:, width + 1 : width + 2, :] = jnp.zeros((th + 2, 1, cout), gbuf.dtype)

    # dgrad: conv of dy_total with the flipped, transposed kernel.
    acc = jnp.zeros((th * width, cin), f32)
    for ky in range(3):
        for kx in range(3):
            gtap = gbuf[ky : ky + th, kx : kx + width, :].reshape(th * width, cout)
            acc += jnp.dot(gtap, wt_ref[ky * 3 + kx], preferred_element_type=f32)

    # prologue backward
    zmid = zbuf[1 : th + 1, 1 : width + 1, :].reshape(th * width, cin)
    y1f = ym_ref[0].reshape(th * width, cin).astype(f32)
    # compare in f32: Mosaic rejects cmpf on packed bf16 vregs
    dzm = jnp.where(zmid.astype(f32) > 0.0, acc, 0.0)
    dy1_ref[0] = (
        (dzm * a.reshape(1, cin)).astype(dy1_ref.dtype).reshape(th, width, cin)
    )
    da_ref[:] += jnp.sum(dzm * y1f, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dzm, axis=0, keepdims=True)

    # wgrad: 9 taps, each z-window^T @ dy_total over this tile's outputs.
    gmid = gbuf[1 : th + 1, 1 : width + 1, :].reshape(th * width, cout)
    for ky in range(3):
        for kx in range(3):
            ztap = zbuf[ky : ky + th, kx : kx + width, :].reshape(th * width, cin)
            tap = ky * 3 + kx
            dw_ref[tap * cin : (tap + 1) * cin, :] += jax.lax.dot_general(
                ztap, gmid, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )


def _c3_specs(bsz, h, w_, c, th):
    """main/top/bottom row-halo BlockSpecs for a [B,H,W,C] tensor."""
    return [
        pl.BlockSpec((1, th, w_, c), lambda bi, i: (bi, i, 0, 0)),
        pl.BlockSpec(
            (1, 1, w_, c), lambda bi, i: (bi, jnp.maximum(i * th - 1, 0), 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, w_, c), lambda bi, i: (bi, jnp.minimum(i * th + th, h - 1), 0, 0)
        ),
    ]


def _pick_th(h: int, target: int = 16) -> int:
    best = 1
    for t in range(1, min(h, 64) + 1):
        if h % t == 0 and t <= target:
            best = t
    return best


def _c3_fwd(y1, a, b, w, interpret):
    bsz, h, width, cin = y1.shape
    cout = w.shape[-1]
    th = _pick_th(h)
    wr = w.astype(y1.dtype).reshape(9, cin, cout)
    kern = functools.partial(
        _c3_fwd_kernel, th=th, width=width, cin=cin, cout=cout
    )
    y2, s, q = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=_c3_specs(bsz, h, width, cin, th)
        + [
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, width, cout), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, width, cout), y1.dtype),
            jax.ShapeDtypeStruct((1, cout), f32),
            jax.ShapeDtypeStruct((1, cout), f32),
        ],
        scratch_shapes=[pltpu.VMEM((th + 2, width + 2, cin), y1.dtype)],
        interpret=interpret,
    )(y1, y1, y1, a.reshape(1, cin), b.reshape(1, cin), wr)
    return y2, s[0], q[0]


def _c3_bwd_call(y1, a, b, w, y2, dy2, ds, dq, interpret):
    bsz, h, width, cin = y1.shape
    cout = w.shape[-1]
    th = _pick_th(h)
    # flipped + transposed kernel for dgrad, laid out like the fwd kernel
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # [3,3,N,C]
    wtr = wt.astype(y1.dtype).reshape(9, cout, cin)
    kern = functools.partial(
        _c3_bwd_kernel, th=th, width=width, cin=cin, cout=cout
    )
    dy1, dw, da, db = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=_c3_specs(bsz, h, width, cin, th)
        + _c3_specs(bsz, h, width, cout, th)
        + _c3_specs(bsz, h, width, cout, th)
        + [
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
            pl.BlockSpec((9, cout, cin), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, width, cin), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((9 * cin, cout), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cin), lambda bi, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, width, cin), y1.dtype),
            jax.ShapeDtypeStruct((9 * cin, cout), f32),
            jax.ShapeDtypeStruct((1, cin), f32),
            jax.ShapeDtypeStruct((1, cin), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2, width + 2, cin), y1.dtype),
            pltpu.VMEM((th + 2, width + 2, cout), y1.dtype),
        ],
        interpret=interpret,
    )(
        y1, y1, y1, y2, y2, y2, dy2, dy2, dy2,
        a.reshape(1, cin), b.reshape(1, cin), wtr,
        ds.reshape(1, cout), dq.reshape(1, cout),
    )
    return dy1, dw.reshape(3, 3, cin, cout), da[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv3x3_bn_stats(y1, a, b, w, interpret: bool = False):
    """3x3/s1/d1 conv of relu(a*y1+b), plus output stats.

    y1: [B,H,W,C] compute dtype; a, b: [C] f32; w: [3,3,C,N] (cast to the
    compute dtype inside).  Returns (y2 [B,H,W,N], s [N] f32, q [N] f32).
    """
    return _c3_fwd(y1, a, b, w, interpret)


def _c3_vjp_fwd(y1, a, b, w, interpret):
    out = _c3_fwd(y1, a, b, w, interpret)
    return out, (y1, a, b, w, out[0])


def _c3_vjp_bwd(interpret, res, g):
    y1, a, b, w, y2 = res
    dy2, ds, dq = g
    dy1, dw, da, db = _c3_bwd_call(y1, a, b, w, y2, dy2, ds, dq, interpret)
    return dy1, da, db, dw.astype(w.dtype)


conv3x3_bn_stats.defvjp(_c3_vjp_fwd, _c3_vjp_bwd)


# ---------------------------------------------------------------------------
# Pure-jnp reference implementations (for tests)
# ---------------------------------------------------------------------------


def ref_matmul_bn_stats(x, w, a=None, b=None, prologue=False):
    z = x
    if prologue:
        z = jnp.maximum(x.astype(f32) * a + b, 0.0).astype(x.dtype)
    y = jnp.dot(z, w, preferred_element_type=f32).astype(x.dtype)
    yf = y.astype(f32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def ref_conv3x3_bn_stats(y1, a, b, w):
    # f32 conv so the transpose rule is well-typed under jax.grad; the
    # input is pre-rounded to the compute dtype to mirror the kernel.
    z = jnp.maximum(y1.astype(f32) * a + b, 0.0).astype(y1.dtype).astype(f32)
    y2 = jax.lax.conv_general_dilated(
        z, w.astype(y1.dtype).astype(f32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(y1.dtype)
    yf = y2.astype(f32)
    return y2, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))
