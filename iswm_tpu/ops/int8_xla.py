"""XLA-lowered int8 compute path (no Pallas).

The Mosaic/Pallas int8 matmul plateaus at ≈ the bf16 rate on v5e (BASELINE.md
"int8 serving": prequant 24.0 vs bf16-XLA 25.2 TOP/s), leaving open whether
XLA's own lowering of ``lax.dot_general``/``lax.conv_general_dilated`` with
int8 operands and ``preferred_element_type=int32`` engages the 2× int8 MXU
rate.  These are the XLA-side equivalents of ``ops.pallas.int8_matmul`` —
same calibrated-scale contract, lowered entirely by XLA — measured against
the Pallas and bf16 rows by scripts/int8_xla_bench.py; `make_int8_exec_fn`
(infer/quantization.py) can route through either backend.

Quantization contract (matches ops/pallas/int8_matmul.py): symmetric
per-tensor activation scale (clip to ±127), per-output-channel weight scale
in the layout ``quantize_params_int8`` produces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_activations(x: jax.Array, x_scale) -> jax.Array:
    """float [..] -> int8 with symmetric per-tensor scale."""
    x_scale = jnp.asarray(x_scale, jnp.float32)
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
    ).astype(jnp.int8)


def int8_matmul_xla(
    x: jax.Array,  # [M, K] float
    w_q: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [N]
    x_scale,
) -> jax.Array:
    """[M, K] float @ [K, N] int8 -> [M, N] f32, int8 MXU contraction."""
    x_q = quantize_activations(x, x_scale)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32)
    )


def int8_matmul_prequant_xla(
    x_q: jax.Array,  # [M, K] int8
    w_q: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [N]
    x_scale,
) -> jax.Array:
    """Pre-quantized variant (isolates the MXU path from the VPU quantize)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32)
    )


def quantized_conv_xla(
    x: jax.Array,  # [B, H, W, Cin] float
    w_q: jax.Array,  # [kh, kw, Cin, Cout] int8 (HWIO)
    w_scale: jax.Array,  # [1, 1, 1, Cout]
    x_scale,
    *,
    strides=(1, 1),
    padding="VALID",
    dilation=(1, 1),
    feature_group_count: int = 1,
) -> jax.Array:
    """General conv with int8 operands, geometry passed through from
    the source ``nn.Conv`` (zero padding is exact under symmetric
    quantization: 0 maps to 0).  XLA lowers this at the 2× int8 MXU rate
    (BASELINE.md "int8 via XLA").

    Grouped/depthwise convs (``feature_group_count > 1``) are exact under
    the same contract: each output channel contracts only its group's
    inputs, and the per-tensor x scale × per-O w scale factors out of the
    group contraction identically to the dense case.  The payoff there is
    bandwidth (int8 halves the traffic of HBM-bound depthwise convs), not
    the MXU rate."""
    x_q = quantize_activations(x, x_scale)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, tuple(strides), padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32).reshape(-1)
    )


def int8_packed_stem_conv(
    x: jax.Array,  # [B, H, W, C] float (the network input)
    w_q: jax.Array,  # [k, k, C, F] int8 — canonical stride-2 stem kernel
    w_scale: jax.Array,  # [1, 1, 1, F]
    x_scale,
    k: int,
) -> jax.Array:
    """int8 execution of the space-to-depth packed stride-2 stem conv
    (models/layers.PackedStrided2Conv — the reference's ResNet stem
    Conv2d(3,64,7,stride=2,padding=3), network/backbone/resnet.py).

    Quantize-FIRST: the input is quantized at full resolution, so the
    parity-take pack and its concatenate move int8 bytes (half the bf16
    packing traffic), then the stride-1 packed conv contracts
    ku·ku·4C taps int8×int8→int32.  The kernel packs exactly in int8
    (pack_stem_kernel pads with zeros, and 0 is exact under symmetric
    quantization), and the per-O weight scales are unchanged by packing
    (packing permutes only the k/k/C axes).  Zero padding on the packed
    input is exact for the same reason.  Odd spatial extents fall back to
    the plain strided int8 conv, mirroring the module's own fallback.
    """
    from ..models.layers import (
        pack_stem_input,
        pack_stem_kernel,
        torch_conv_padding,
    )

    b, h, w, c = x.shape
    x_q = quantize_activations(x, x_scale)
    if k % 2 == 1 and h % 2 == 0 and w % 2 == 0:
        ku = (k + 2) // 2
        pad_l = (k // 2 + 1) // 2
        pad_r = ku - 1 - pad_l
        x_q = pack_stem_input(x_q)
        w_q = pack_stem_kernel(w_q, k)
        strides, pads = (1, 1), [(pad_l, pad_r), (pad_l, pad_r)]
    else:
        pad = torch_conv_padding(k)
        strides, pads = (2, 2), [pad, pad]
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, strides, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32).reshape(-1)
    )


def int8_shifted_dilated_conv(
    x: jax.Array,  # [B, H, W, C] float
    kernel_q: jax.Array,  # [3, 3, C, F] int8
    w_scale: jax.Array,  # [1, 1, 1, F]
    x_scale,
    d: int,
) -> jax.Array:
    """int8 version of the valid-tap shifted-matmul atrous conv
    (models/layers.ShiftedDilatedConv): each tap's dot_general runs
    int8×int8→int32 on the MXU at the 2× rate, keeping the valid-window
    FLOP savings that motivated the tap decomposition (the skipped padding
    FLOPs at d≈map-extent).  Math matches Conv2d(3,3,dilation=d,padding=d)
    under the symmetric-quantization contract (zeros map to zeros)."""
    b, h, w, c = x.shape
    x_q = quantize_activations(x, x_scale)
    acc = None
    for i, dy in enumerate((-d, 0, d)):
        for j, dx in enumerate((-d, 0, d)):
            ys, ye = max(0, -dy), h - max(0, dy)
            xs, xe = max(0, -dx), w - max(0, dx)
            if ye <= ys or xe <= xs:
                continue  # tap entirely in padding
            src = jax.lax.slice(
                x_q, (0, ys + dy, xs + dx, 0), (b, ye + dy, xe + dx, c)
            )
            t = jax.lax.dot_general(
                src, kernel_q[i, j], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            t = jax.lax.pad(
                t, jnp.zeros((), jnp.int32),
                ((0, 0, 0), (ys, h - ye, 0), (xs, w - xe, 0), (0, 0, 0)),
            )
            acc = t if acc is None else acc + t
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32).reshape(-1)
    )


def quantized_conv1x1_xla(
    x: jax.Array,  # [B, H, W, Cin] float
    w_q: jax.Array,  # [1, 1, Cin, Cout] int8 (HWIO)
    w_scale: jax.Array,  # [1, 1, 1, Cout]
    x_scale,
) -> jax.Array:
    """1x1 conv with the contraction expressed as an int8 conv XLA lowers
    itself (same contract as ops.pallas.int8_matmul.quantized_conv1x1)."""
    x_q = quantize_activations(x, x_scale)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (
        acc.astype(jnp.float32)
        * jnp.asarray(x_scale, jnp.float32)
        * jnp.asarray(w_scale, jnp.float32).reshape(-1)
    )
