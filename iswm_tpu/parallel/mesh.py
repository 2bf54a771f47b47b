"""Device mesh + sharding helpers.

TPU-native replacement for the reference's single-process
``nn.DataParallel`` (reference train.py:970): a (data, model) Mesh with
the batch sharded over the ``data`` axis.  Under ``jit``, XLA emits the
gradient all-reduce (psum over ICI) and the cross-replica BatchNorm
reduction automatically — there is no NCCL analogue to manage.

The ``model`` axis is available for spatial sharding of large scenes
(whole-scene inference) and channel sharding; at reference scale a 1-D
data mesh is sufficient (SURVEY §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data_axis=-1`` means all remaining
    devices go on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis < 1 or n % model_axis != 0:
        raise ValueError(f"model_axis {model_axis} must divide device count {n}")
    if data_axis == -1:
        data_axis = n // model_axis
    if data_axis * model_axis != n:
        raise ValueError(
            f"data_axis*model_axis ({data_axis}*{model_axis}) != devices ({n})"
        )
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] with H sharded over the model axis — used by the
    whole-scene tile engine for very large scenes."""
    return NamedSharding(mesh, P(mesh.axis_names[0], mesh.axis_names[1]))


def shard_batch(mesh: Mesh, *arrays):
    """Device_put host arrays with batch sharding."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
