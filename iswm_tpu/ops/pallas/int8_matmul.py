"""Pallas TPU kernel: int8 x int8 -> int32 matmul with fused (de)quant.

Groundwork for true int8 serving throughput (ROADMAP): the v5e MXU runs
int8 at 2x the bf16 rate, and the DeepLab head's hottest contractions are
1x1 convs that are plain matmuls over the pixel dimension (ASPP concat
projection 1280->256, decoder entry 304->256; reference
_deeplab.py:161-165, 44-47).

``int8_matmul(x, w_q, w_scale, x_scale)``:
  - x: [M, K] float (bf16/f32), quantized in-kernel with the calibrated
    per-tensor ``x_scale`` (symmetric, 127);
  - w_q: [K, N] int8 with per-column ``w_scale`` [N] (the layout
    ``quantize_params_int8`` produces for 1x1 kernels);
  - out: [M, N] f32 = (x_q @ w_q) * x_scale * w_scale.

Grid walks M in 256-row tiles with K and N resident; accumulation in
int32 on the MXU (preferred_element_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256


def _kernel(x_ref, w_ref, wscale_ref, xscale_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    x_scale = xscale_ref[0]
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * x_scale * wscale_ref[:]


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: float | jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """[M, K] float @ [K, N] int8 -> [M, N] f32 (see module docstring)."""
    m, k = x.shape
    k2, n = w_q.shape
    if k != k2:
        raise ValueError(f"K mismatch: {k} vs {k2}")
    if k % 128 or n % 128:
        raise ValueError(f"K ({k}) and N ({n}) must be multiples of 128")
    pad_m = (-m) % _TILE_M
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    rows = x.shape[0]

    out = pl.pallas_call(
        _kernel,
        grid=(rows // _TILE_M,),
        in_specs=[
            pl.BlockSpec((_TILE_M, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_M, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        interpret=interpret,
    )(
        x,
        w_q,
        jnp.asarray(w_scale, jnp.float32).reshape(1, n),
        jnp.asarray([x_scale], jnp.float32),
    )
    return out[:m]


def _kernel_prequant(x_ref, w_ref, wscale_ref, xscale_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * xscale_ref[0] * wscale_ref[:]


def int8_matmul_prequant(
    x_q: jax.Array,  # [M, K] int8 (pre-quantized activations)
    w_q: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [N]
    x_scale,
    *,
    interpret: bool = False,
) -> jax.Array:
    """int8 matmul with activations already quantized — isolates the MXU
    int8 path from the VPU quantize cost (see ROADMAP perf note)."""
    m, k = x_q.shape
    _, n = w_q.shape
    pad_m = (-m) % _TILE_M
    if pad_m:
        x_q = jnp.pad(x_q, ((0, pad_m), (0, 0)))
    rows = x_q.shape[0]
    out = pl.pallas_call(
        _kernel_prequant,
        grid=(rows // _TILE_M,),
        in_specs=[
            pl.BlockSpec((_TILE_M, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_M, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        interpret=interpret,
    )(
        x_q,
        w_q,
        jnp.asarray(w_scale, jnp.float32).reshape(1, n),
        jnp.asarray([x_scale], jnp.float32),
    )
    return out[:m]


def quantized_conv1x1(
    x: jax.Array,  # [B, H, W, Cin] float
    w_q: jax.Array,  # [1, 1, Cin, Cout] int8 (HWIO from quantize_params_int8)
    w_scale: jax.Array,  # [1, 1, 1, Cout]
    x_scale,
    *,
    interpret: bool = False,
) -> jax.Array:
    """1x1 conv as an int8 matmul over flattened pixels."""
    b, h, w, cin = x.shape
    cout = w_q.shape[-1]
    out = int8_matmul(
        x.reshape(-1, cin),
        w_q.reshape(cin, cout),
        jnp.asarray(w_scale).reshape(cout),
        x_scale,
        interpret=interpret,
    )
    return out.reshape(b, h, w, cout)
