"""Small utilities (reference utils/utils.py + metrics/utils/decorators.py).

BN control notes: the reference mutates module state (`set_bn_momentum`,
`fix_bn`, utils/utils.py:26-34); in flax the equivalents are declarative —
momentum is `ModelConfig.bn_momentum` (flax momentum = 1 - torch momentum)
and "frozen BN" is simply applying with ``train=False`` (running averages
used, no stat updates), so no mutation helpers are needed.
"""

from __future__ import annotations

import functools
import os
import time
import traceback
from typing import Sequence

import numpy as np


class Denormalize:
    """Invert (x - mean)/std; accepts HWC or CHW numpy arrays
    (reference utils/utils.py:14-24)."""

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, tensor: np.ndarray) -> np.ndarray:
        arr = np.asarray(tensor, dtype=np.float32)
        if arr.ndim == 3 and arr.shape[0] == len(self.mean):  # CHW
            return arr * self.std.reshape(-1, 1, 1) + self.mean.reshape(-1, 1, 1)
        return arr * self.std + self.mean  # HWC / NHWC


def denormalize(tensor: np.ndarray, mean, std) -> np.ndarray:
    return Denormalize(mean, std)(tensor)


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def safe_process(error_value=None):
    """try/except decorator returning a typed sentinel on failure
    (reference metrics/utils/decorators.py:4-16)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            try:
                return func(*args, **kwargs)
            except Exception as e:
                print(f"Error in {func.__name__}: {e}")
                print(f"Traceback: {traceback.format_exc()}")
                return error_value

        return wrapper

    return decorator


def timing_debug(func):
    """Wall-clock print decorator (reference metrics/utils/decorators.py:18-27)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        print(f"{func.__name__} took {time.time() - start:.4f} seconds to execute")
        return result

    return wrapper


def enable_compilation_cache(path: str = "") -> None:
    """Enable JAX's persistent compilation cache for this process.

    The flagship train-step compile costs minutes on TPU (and tens of
    minutes with opt-in Pallas kernels); the persistent cache makes every
    later process with the same program near-instant.  Verified to work
    through the tunneled axon backend.  Honors JAX_COMPILATION_CACHE_DIR
    if set; defaults to ~/.cache/iswm_tpu/xla.  Never raises — callers
    are CLIs where a cache failure must not block the run.
    """
    try:
        import jax

        cache_dir = (
            path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(
                os.path.expanduser("~"), ".cache", "iswm_tpu", "xla"
            )
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
