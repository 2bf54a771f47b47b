"""AOT inference engines — the TPU analogue of TensorRT engine building.

The reference's deploy chain exports ONNX and builds a serialized TensorRT
engine per shape (reference tensorrt_tools/export_onnx.py:29-88,
build_engine.py:27-114).  The XLA-native equivalent:

  - ``build_engine``: ``jit(fn).lower(shapes).compile()`` ahead of time for
    a fixed input signature — the compile IS the engine build;
  - ``serialize`` / ``deserialize``: portable engine artifacts via
    ``jax.export`` (StableHLO bytes), the analogue of the .trt file;
  - the persistent XLA compilation cache (``enable_persistent_cache``)
    plays the role of the TRT timing cache: second builds are instant.

Engines are shape-specialized like TRT profiles with min=opt=max
(build_engine.py:58-66); ask for each (batch, size) you serve.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def enable_persistent_cache(cache_dir: str = "~/.cache/iswm_xla") -> None:
    """Turn on XLA's on-disk compilation cache (idempotent)."""
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class Engine:
    """A compiled, shape-specialized inference executable."""

    def __init__(self, compiled, input_shape: Tuple[int, ...], dtype):
        self.compiled = compiled
        self.input_shape = tuple(input_shape)
        self.dtype = dtype

    def __call__(self, x: jax.Array) -> jax.Array:
        if tuple(x.shape) != self.input_shape:
            raise ValueError(
                f"engine built for {self.input_shape}, got {tuple(x.shape)} — "
                "build a separate engine per served shape (TRT-profile semantics)"
            )
        return self.compiled(x.astype(self.dtype))

    @property
    def flops(self) -> Optional[float]:
        try:
            return self.compiled.cost_analysis()["flops"]
        except Exception:
            return None

    @property
    def memory_analysis(self):
        try:
            return self.compiled.memory_analysis()
        except Exception:
            return None


def build_engine(
    model_fn: Callable,
    input_shape: Tuple[int, ...],
    dtype=jnp.bfloat16,
) -> Engine:
    """AOT-compile ``model_fn`` for a fixed input signature."""
    lowered = jax.jit(model_fn).lower(
        jax.ShapeDtypeStruct(input_shape, dtype)
    )
    return Engine(lowered.compile(), input_shape, dtype)


def serialize(model_fn: Callable, input_shape: Tuple[int, ...], dtype=jnp.bfloat16) -> bytes:
    """Portable engine artifact (StableHLO) — the .trt-file analogue.

    Deliberately SELF-CONTAINED: ``model_fn``'s closed-over weights are
    baked into the artifact as constants (TRT-engine semantics — the blob
    alone serves).  This is the opposite trade from the serving fns'
    weights-as-arguments protocol (infer/quantization.py), so artifacts
    for very large models are weight-sized; that is the point."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(model_fn))(
        jax.ShapeDtypeStruct(input_shape, dtype)
    )
    return bytes(exported.serialize())


def deserialize(blob: bytes) -> Callable:
    """Load a serialized engine; returns a callable (recompiles on first use
    for the current topology — StableHLO is device-portable, unlike .trt)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return exported.call
