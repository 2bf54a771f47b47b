"""Class-weight computation ("IW" inverse weights).

On-device replacement for the reference's full-epoch host loop (reference
train.py:388-410): one pass over the training labels accumulating
{0,1} pixel counts with a jitted bincount; weights = [1.0, sqrt(n0/n1)].
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _count_binary(labels: jax.Array) -> jax.Array:
    flat = labels.reshape(-1)
    zeros = jnp.sum(flat == 0)
    ones = jnp.sum(flat == 1)
    return jnp.stack([zeros, ones])


def calculate_class_weights(label_batches: Iterable[np.ndarray]) -> np.ndarray:
    """[w_black=1.0, w_white=sqrt(black/white)] (reference train.py:404-410)."""
    counts = np.zeros(2, dtype=np.int64)
    for labels in label_batches:
        counts += np.asarray(_count_binary(jnp.asarray(labels)))
    black, white = int(counts[0]), int(counts[1])
    if white == 0:
        return np.array([1.0, 1.0], dtype=np.float32)
    return np.array([1.0, float(np.sqrt(black / white))], dtype=np.float32)
