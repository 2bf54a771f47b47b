"""Fused stem tail: BatchNorm(train) + ReLU + 3x3/s2 maxpool, custom VJP.

Why: XLA runs the ResNet stem's post-conv chain as five separate HBM
passes over the 67 MB conv-output tensor (batch 8 @ 512^2, v5e profile
logs/profile/attribution.txt): stats reduction, normalize+relu write,
pool read, and in the backward a select-and-scatter (0.54 ms at 0.1
TFLOP/s), a BN reduction pass (0.36 ms) and a 19-TFLOP/s conv wgrad
(0.70 ms).  The reference never sees this problem (torch eager + cuDNN
pooling kernels; reference network/backbone/resnet.py:131-137,205).

TPU-native fix: leave the conv itself to XLA (it runs fine) and fuse
everything after it.  Forward = one stats kernel + one
normalize/relu/pool kernel.  Backward = two kernels: phase 1 recomputes
the pool argmax in-VMEM and accumulates the two BN reductions; phase 2
recomputes again, forms dz per row in VMEM and immediately contracts it
against the packed-input window into the conv weight gradient — dz
NEVER materializes in HBM, and d(image) is never computed (the stem is
the first layer).

Semantics:
  - BN statistics match flax.linen.BatchNorm: f32 stats over the
    bf16-rounded conv output, fast variance max(0, E[z^2]-E[z]^2).
  - Max-pool gradient uses EQUAL-SPLIT tie handling: every window
    position equal to the window max receives dp/count.  XLA's
    select-and-scatter routes everything to the first maximum; the two
    differ only on exact float ties (a subgradient choice, not an
    approximation — total gradient mass per window is identical).
    All-zero windows (relu floor) are harmless: their gradient dies at
    the relu mask.
  - Geometry is fixed to the stem: pool window 3, stride 2, padding 1
    (torch MaxPool2d(3,2,1)); the packed conv has pads (2,1)/(2,1) and
    4x4 taps over 12 packed channels (models/layers.py:PackedStrided2Conv).

All kernels use natural NHWC layouts (j on sublanes, channels on lanes):
only sublane rolls, masked selects, and one-hot selection matmuls — no
transposes, no lane relayouts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

def _pick_pm(sp: int, target: int = 8) -> int:
    """Pooled rows per grid step: largest divisor of sp <= target."""
    best = 0
    for t in range(1, min(target, sp) + 1):
        if sp % t == 0:
            best = t
    return best


def _sel_mat(sp: int, s: int, dtype=jnp.float32) -> jax.Array:
    """S[n, j] = 1 iff j == 2n — stride-2 sublane extraction as a one-hot
    matmul (S @ t picks t[2n]); S^T scatters pooled rows back (zeros at
    odd j)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, s), 1)
    return (col == 2 * row).astype(dtype)


def _roll0(x: jax.Array, shift: int) -> jax.Array:
    """Sublane roll with zero fill (non-circular) — pool edge padding.
    y >= 0 everywhere this is used, so 0 acts as -inf."""
    s = x.shape[0]
    rolled = jnp.roll(x, shift, axis=0)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if shift > 0:
        return jnp.where(idx < shift, 0.0, rolled)
    if shift < 0:
        return jnp.where(idx >= s + shift, 0.0, rolled)
    return x


# ---------------------------------------------------------------- stats


def _stats_kernel(z_ref, s_ref, q_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    zf = z_ref[:].astype(f32)
    s_ref[:] += jnp.sum(zf, axis=0, keepdims=True)
    q_ref[:] += jnp.sum(zf * zf, axis=0, keepdims=True)


def stem_stats(z: jax.Array, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (sum, sum-of-squares) of z [B,H,W,F] in one pass."""
    b, h, w, f = z.shape
    z2 = z.reshape(b * h * w, f)
    m = z2.shape[0]
    tm = 8192
    while m % tm:
        tm //= 2
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, f), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, f), f32),
            jax.ShapeDtypeStruct((1, f), f32),
        ],
        interpret=interpret,
    )(z2)
    return s[0], q[0]


# ------------------------------------------------- forward: norm+relu+pool


def _pool_fwd_kernel(zp_ref, zm_ref, sc_ref, bi_ref, p_ref, ys_scr, *, pm):
    """All loops are lax.fori_loop over VMEM scratch — unrolled Python
    loops at pm=8 sent Mosaic compile time past 7 minutes per kernel."""
    m = pl.program_id(1)
    s = zm_ref.shape[2]
    sp = s // 2
    sel = _sel_mat(sp, s)
    sc = sc_ref[:]
    bi = bi_ref[:]

    # ys_scr rows 0..bm hold y for local conv rows -1..bm-1
    ys_scr[0:1] = jnp.where(
        m == 0, 0.0, jnp.maximum(zp_ref[0, 0].astype(f32) * sc + bi, 0.0)
    )[None]
    ys_scr[1:] = jnp.maximum(zm_ref[0].astype(f32) * sc[None] + bi[None], 0.0)

    def body(n, _):
        win = ys_scr[pl.ds(2 * n, 3)]  # conv rows 2n-1..2n+1
        m3 = jnp.max(win, axis=0)
        t = jnp.maximum(jnp.maximum(m3, _roll0(m3, 1)), _roll0(m3, -1))
        p_ref[0, pl.ds(n, 1)] = jax.lax.dot(
            sel, t, preferred_element_type=f32
        ).astype(p_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, pm, body, 0)


def stem_norm_relu_pool(
    z: jax.Array, scale: jax.Array, bias: jax.Array, interpret: bool = False
) -> jax.Array:
    """max_pool_3x3s2p1(relu(z*scale + bias)); z [B,S,S,F] -> [B,S/2,S/2,F].

    scale/bias are the folded BN affine ([F] f32): scale = gamma/sigma,
    bias = beta - mean*gamma/sigma.
    """
    b, s, s2, f = z.shape
    assert s == s2 and s % 2 == 0, (s, s2)
    sp = s // 2
    pm = _pick_pm(sp)
    bm = 2 * pm
    grid = (b, sp // pm)
    return pl.pallas_call(
        functools.partial(_pool_fwd_kernel, pm=pm),
        grid=grid,
        in_specs=[
            # row 2*pm*m - 1 (the one-row halo above the block; masked at m=0)
            pl.BlockSpec(
                (1, 1, s, f), lambda ib, m: (ib, jnp.maximum(bm * m - 1, 0), 0, 0)
            ),
            pl.BlockSpec((1, bm, s, f), lambda ib, m: (ib, m, 0, 0)),
            pl.BlockSpec((1, f), lambda ib, m: (0, 0)),
            pl.BlockSpec((1, f), lambda ib, m: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pm, sp, f), lambda ib, m: (ib, m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, sp, f), z.dtype),
        scratch_shapes=[pltpu.VMEM((bm + 1, s, f), f32)],
        interpret=interpret,
    )(z, z, scale.reshape(1, f).astype(f32), bias.reshape(1, f).astype(f32))


# ----------------------------------------------------------- backward


def _bwd_prepare(
    zp_ref, zm_ref, zn_ref, dpm_ref, dpe_ref, sc, bi, m, nblocks, pm,
    ys_scr, pu_scr, gu_scr, dp_scr,
):
    """Shared backward recomputation into VMEM scratch (fori-looped so the
    Mosaic program stays small — unrolled variants took 10+ min to compile).

    ys_scr rows 0..bm+2 hold y for local conv rows -1..bm+1; parent k of
    this block (local pooled rows 0..pm, global PM*m+k) gets its upsampled
    window max (pu_scr[k]) and equal-split per-position gradient
    (gu_scr[k]).  Pooled row n covers conv rows {2n-1, 2n, 2n+1}.
    """
    s = zm_ref.shape[2]
    sp = s // 2
    sel = _sel_mat(sp, s)
    selT = sel.T
    bm = 2 * pm
    last = m == nblocks - 1

    ys_scr[0:1] = jnp.where(
        m == 0, 0.0, jnp.maximum(zp_ref[0, 0].astype(f32) * sc + bi, 0.0)
    )[None]
    ys_scr[1:bm + 1] = jnp.maximum(zm_ref[0].astype(f32) * sc[None] + bi[None], 0.0)
    ys_scr[bm + 1:] = jnp.where(
        last, 0.0, jnp.maximum(zn_ref[0].astype(f32) * sc[None] + bi[None], 0.0)
    )
    # unified dp rows for parents 0..pm (the k == pm halo parent belongs to
    # the next block's dp rows; on the last block it is the nonexistent
    # pooled row SP, masked to zero)
    dp_scr[0:pm] = dpm_ref[0].astype(f32)
    dp_scr[pm:] = jnp.where(last, 0.0, dpe_ref[0, 0].astype(f32))[None]

    def parent_body(k, _):
        win = ys_scr[pl.ds(2 * k, 3)]  # conv rows 2k-1..2k+1
        m3 = jnp.max(win, axis=0)
        t = jnp.maximum(jnp.maximum(m3, _roll0(m3, 1)), _roll0(m3, -1))
        p_k = jax.lax.dot(sel, t, preferred_element_type=f32)  # [SP,F]
        pk_up = jax.lax.dot(selT, p_k, preferred_element_type=f32)  # [S,F]
        # tie count over the 3x3 window (equal-split denominator)
        cnt_up = jnp.zeros_like(m3)
        for d in range(3):
            for delta in (-1, 0, 1):
                eq = (win[d] == _roll0(pk_up, delta)).astype(f32)
                cnt_up = cnt_up + _roll0(eq, -delta)
        cnt = jax.lax.dot(sel, cnt_up, preferred_element_type=f32)
        g_k = dp_scr[k] / jnp.maximum(cnt, 1.0)
        pu_scr[pl.ds(k, 1)] = pk_up[None]
        gu_scr[pl.ds(k, 1)] = jax.lax.dot(
            selT, g_k, preferred_element_type=f32
        )[None]
        return 0

    jax.lax.fori_loop(0, pm + 1, parent_body, 0)


def _dbn_rows(a, ys_scr, pu_scr, gu_scr, zm_ref, sc, bi, mu, si):
    """For loop index a: the relu-masked pool gradient (d_bn) and yhat of
    local conv rows r0 = 2a (parent a) and r1 = 2a+1 (parents a, a+1)."""

    def dy_from(parent_k, y_r):
        pu_k = pu_scr[pl.ds(parent_k, 1)][0]
        gu_k = gu_scr[pl.ds(parent_k, 1)][0]
        dy = jnp.zeros_like(y_r)
        for delta in (-1, 0, 1):
            dy = dy + jnp.where(
                y_r == _roll0(pu_k, delta), _roll0(gu_k, delta), 0.0
            )
        return dy

    out = []
    for i, r in enumerate((2 * a, 2 * a + 1)):
        y_r = ys_scr[pl.ds(r + 1, 1)][0]
        dy = dy_from(a, y_r)
        if i == 1:
            dy = dy + dy_from(a + 1, y_r)
        zf = zm_ref[0, pl.ds(r, 1)][0].astype(f32)
        d_bn = jnp.where(y_r > 0.0, dy, 0.0)  # y>0 <=> pre-relu bn out > 0
        yhat = (zf - mu) * si
        out.append((d_bn, yhat))
    return out


def _bwd_sums_kernel(
    zp_ref, zm_ref, zn_ref, dpm_ref, dpe_ref, sc_ref, bi_ref, mu_ref, si_ref,
    s1_ref, s2_ref, ys_scr, pu_scr, gu_scr, dp_scr, *, pm,
):
    ib, m = pl.program_id(0), pl.program_id(1)

    @pl.when((ib == 0) & (m == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    sc, bi = sc_ref[:], bi_ref[:]
    mu, si = mu_ref[:], si_ref[:]
    _bwd_prepare(
        zp_ref, zm_ref, zn_ref, dpm_ref, dpe_ref, sc, bi, m,
        pl.num_programs(1), pm, ys_scr, pu_scr, gu_scr, dp_scr,
    )

    def row_body(a, carry):
        s1, s2 = carry
        for d_bn, yhat in _dbn_rows(a, ys_scr, pu_scr, gu_scr, zm_ref, sc, bi, mu, si):
            s1 = s1 + jnp.sum(d_bn, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(d_bn * yhat, axis=0, keepdims=True)
        return s1, s2

    zero = jnp.zeros_like(s1_ref[:])
    s1, s2 = jax.lax.fori_loop(0, pm, row_body, (zero, zero))
    s1_ref[:] += s1
    s2_ref[:] += s2


def _bwd_wgrad_kernel(
    zp_ref, zm_ref, zn_ref, dpm_ref, dpe_ref,
    xm2_ref, xm1_ref, xmain_ref, xnext_ref,
    sc_ref, bi_ref, mu_ref, si_ref, gs_ref, ms1_ref, ms2_ref,
    dw_ref, ys_scr, pu_scr, gu_scr, dp_scr, xp_scr, a_scr, *, pm,
):
    ib, m = pl.program_id(0), pl.program_id(1)

    @pl.when((ib == 0) & (m == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    sc, bi = sc_ref[:], bi_ref[:]
    mu, si = mu_ref[:], si_ref[:]
    gs = gs_ref[:]          # gamma/sigma
    ms1, ms2 = ms1_ref[:], ms2_ref[:]  # s1/N, s2/N
    nblocks = pl.num_programs(1)
    bm = 2 * pm
    _bwd_prepare(
        zp_ref, zm_ref, zn_ref, dpm_ref, dpe_ref, sc, bi, m,
        nblocks, pm, ys_scr, pu_scr, gu_scr, dp_scr,
    )

    s = zm_ref.shape[2]
    c = xmain_ref.shape[-1]
    cdtype = xmain_ref.dtype

    # xp_scr rows 0..bm+2 hold packed-input rows -2..bm (conv row r taps
    # xp rows r-2..r+1 = scratch rows r..r+3); masked edges are exactly
    # the packed conv's zero row padding (2,1).
    zrow = jnp.zeros_like(xm2_ref[0])
    xp_scr[0:1] = jnp.where(m == 0, zrow, xm2_ref[0])
    xp_scr[1:2] = jnp.where(m == 0, zrow, xm1_ref[0])
    xp_scr[2:bm + 2] = xmain_ref[0]
    xp_scr[bm + 2:] = jnp.where(m == nblocks - 1, zrow, xnext_ref[0])

    def row_body(a, _):
        rows = _dbn_rows(a, ys_scr, pu_scr, gu_scr, zm_ref, sc, bi, mu, si)
        for i, (d_bn, yhat) in enumerate(rows):
            r = 2 * a + i
            dz = (gs * (d_bn - ms1 - yhat * ms2)).astype(cdtype)  # [S, F]
            # A_w [S, 4*4*C]: taps (u major, v, c minor); contract over j.
            # Assembled through a VMEM scratch: Mosaic refuses a direct
            # lane concatenate of sublane-shifted slices (offset
            # mismatch), but sub-tile stores relayout on the way in.
            win = xp_scr[pl.ds(r, 4)]  # xp rows r-2..r+1, [4, S+3, C]
            for u in range(4):
                for v in range(4):
                    i0 = (u * 4 + v) * c
                    a_scr[:, i0:i0 + c] = jax.lax.slice_in_dim(
                        win[u], v, v + s, axis=0
                    )
            dw_ref[:] += jax.lax.dot_general(
                a_scr[:], dz, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return 0

    jax.lax.fori_loop(0, pm, row_body, 0)


def _row1_spec(s, f, idx_fn):
    return pl.BlockSpec((1, 1, s, f), idx_fn)


def stem_tail_bwd(
    z: jax.Array,
    xp_pad: jax.Array,
    dp: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mu: jax.Array,
    sigma_inv: jax.Array,
    interpret: bool = False,
):
    """Fused backward of pool(relu(bn(conv(xp)))) given d(pooled).

    Args:
      z: conv output [B,S,S,F] (residual, bf16).
      xp_pad: packed conv input, j-padded by (2,1): [B,S,S+3,C].
      dp: pooled-output cotangent [B,S/2,S/2,F].
      gamma/beta: BN affine [F]; mu/sigma_inv: batch stats [F] (f32).
    Returns (dw [4,4,C,F] f32, dgamma [F], dbeta [F]).
    """
    b, s, s2, f = z.shape
    sp = s // 2
    pm = _pick_pm(sp)
    bm = 2 * pm
    c = xp_pad.shape[-1]
    nblocks = sp // pm
    grid = (b, nblocks)

    sc = (gamma * sigma_inv).reshape(1, f).astype(f32)
    bi = (beta - mu * gamma * sigma_inv).reshape(1, f).astype(f32)
    mu2 = mu.reshape(1, f).astype(f32)
    si2 = sigma_inv.reshape(1, f).astype(f32)

    z_specs = [
        _row1_spec(s, f, lambda ib, m: (ib, jnp.maximum(bm * m - 1, 0), 0, 0)),
        pl.BlockSpec((1, bm, s, f), lambda ib, m: (ib, m, 0, 0)),
        pl.BlockSpec(
            (1, 2, s, f),
            lambda ib, m: (ib, jnp.minimum(pm * (m + 1), pm * nblocks - 1), 0, 0),
        ),
    ]
    dp_specs = [
        pl.BlockSpec((1, pm, sp, f), lambda ib, m: (ib, m, 0, 0)),
        _row1_spec(sp, f, lambda ib, m: (ib, jnp.minimum(pm * (m + 1), sp - 1), 0, 0)),
    ]
    vec = pl.BlockSpec((1, f), lambda ib, m: (0, 0))

    bwd_scratch = [
        pltpu.VMEM((bm + 3, s, f), f32),      # ys: conv rows -1..bm+1
        pltpu.VMEM((pm + 1, s, f), f32),      # pu: per-parent upsampled max
        pltpu.VMEM((pm + 1, s, f), f32),      # gu: per-parent split gradient
        pltpu.VMEM((pm + 1, sp, f), f32),     # dp rows incl. halo parent
    ]
    s1, s2_ = pl.pallas_call(
        functools.partial(_bwd_sums_kernel, pm=pm),
        grid=grid,
        in_specs=z_specs + dp_specs + [vec] * 4,
        out_specs=[
            pl.BlockSpec((1, f), lambda ib, m: (0, 0)),
            pl.BlockSpec((1, f), lambda ib, m: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, f), f32),
            jax.ShapeDtypeStruct((1, f), f32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=interpret,
    )(z, z, z, dp, dp, sc, bi, mu2, si2)

    n = b * s * s
    gs = sc  # gamma/sigma
    ms1 = (s1 / n).astype(f32)
    ms2 = (s2_ / n).astype(f32)

    sj = s  # xp rows are [S+3] wide (j pad 2 left, 1 right)
    xp_specs = [
        _row1_spec(sj + 3, c, lambda ib, m: (ib, jnp.maximum(bm * m - 2, 0), 0, 0)),
        _row1_spec(sj + 3, c, lambda ib, m: (ib, jnp.maximum(bm * m - 1, 0), 0, 0)),
        pl.BlockSpec((1, bm, sj + 3, c), lambda ib, m: (ib, m, 0, 0)),
        _row1_spec(
            sj + 3, c, lambda ib, m: (ib, jnp.minimum(bm * (m + 1), s - 1), 0, 0)
        ),
    ]
    dw = pl.pallas_call(
        functools.partial(_bwd_wgrad_kernel, pm=pm),
        grid=grid,
        in_specs=z_specs + dp_specs + xp_specs + [vec] * 7,
        out_specs=pl.BlockSpec((16 * c, f), lambda ib, m: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((16 * c, f), f32),
        scratch_shapes=bwd_scratch + [
            pltpu.VMEM((bm + 3, s + 3, c), xp_pad.dtype),  # xp rows -2..bm
            pltpu.VMEM((s, 16 * c), z.dtype),              # A_w assembly
        ],
        interpret=interpret,
    )(z, z, z, dp, dp, xp_pad, xp_pad, xp_pad, xp_pad,
      sc, bi, mu2, si2, gs, ms1, ms2)

    dgamma = s2_[0]
    dbeta = s1[0]
    return dw.reshape(4, 4, c, f), dgamma, dbeta


# ------------------------------------------------- custom-VJP entry points


def _stem_conv(xp_pad: jax.Array, kk: jax.Array) -> jax.Array:
    """The packed stem conv (XLA — it runs fine there); row pads (2,1),
    column pads baked into xp_pad."""
    return jax.lax.conv_general_dilated(
        xp_pad, kk, (1, 1), [(2, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def stem_fused_train(xp_pad, kk, gamma, beta, eps, interpret):
    """pool3x3s2p1(relu(bn_train(conv_packed(xp_pad, kk)))) fused.

    Returns (pooled [B,S/2,S/2,F], batch_mean [F], batch_var [F]); the
    stats feed the caller's EMA update (no gradient flows through them).
    """
    p, mean, var, _ = _stem_fused_fwd_impl(xp_pad, kk, gamma, beta, eps, interpret)
    return p, mean, var


def _stem_fused_fwd_impl(xp_pad, kk, gamma, beta, eps, interpret):
    z = _stem_conv(xp_pad, kk)
    b, s, _, f = z.shape
    n = b * s * s
    ssum, sq = stem_stats(z, interpret=interpret)
    mean = ssum / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    sigma_inv = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(f32) * sigma_inv
    bias = beta.astype(f32) - mean * scale
    p = stem_norm_relu_pool(z, scale, bias, interpret=interpret)
    return p, mean, var, (z, sigma_inv)


def _stem_fused_fwd(xp_pad, kk, gamma, beta, eps, interpret):
    p, mean, var, (z, sigma_inv) = _stem_fused_fwd_impl(
        xp_pad, kk, gamma, beta, eps, interpret
    )
    return (p, mean, var), (z, xp_pad, gamma, beta, mean, sigma_inv)


def _stem_fused_bwd(eps, interpret, res, cots):
    dp, _dmean, _dvar = cots  # stats feed the no-grad EMA path only
    z, xp_pad, gamma, beta, mean, sigma_inv = res
    kdtype = z.dtype  # conv result type == packed-kernel compute dtype
    dw, dgamma, dbeta = stem_tail_bwd(
        z, xp_pad, dp, gamma, beta, mean, sigma_inv, interpret=interpret
    )
    # d(image) is deliberately NOT computed — the stem is the network's
    # first layer, so nothing consumes it in training and XLA DCEs this
    # constant.  It is NaN-filled (not zero) so that any caller that DOES
    # request input gradients (saliency maps, adversarial examples) fails
    # loudly instead of silently receiving zeros; use the unfused stem
    # (ModelConfig.fused_stem="never") for input-gradient work.
    return (
        jnp.full_like(xp_pad, jnp.nan),
        dw.astype(kdtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
    )


stem_fused_train.defvjp(_stem_fused_fwd, _stem_fused_bwd)


def stem_fused_eval(xp_pad, kk, scale, bias, interpret=False):
    """Inference stem tail: affine (folded running stats) + relu + pool."""
    z = _stem_conv(xp_pad, kk)
    return stem_norm_relu_pool(z, scale, bias, interpret=interpret)
