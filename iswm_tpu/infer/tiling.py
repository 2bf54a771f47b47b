"""Batched sliding-window whole-scene inference (the tile engine).

The reference feeds whole images one at a time at native resolution
(reference predict.py:292-368 — no batching, no tiling); its TensorRT
deploy path is locked to single 200x200 tiles (tensorrt_tools/
predict_trt.py:168-169).  This engine replaces both: a scene of any size
is covered by overlapping fixed-size tiles, tiles are batched through the
jitted model, and per-tile logits are blended back into a full-resolution
logit canvas on device.

Design (all static shapes under jit for a given scene size):
  - tile origins form a grid with stride = tile - overlap; the last
    row/column is clamped flush to the border (every pixel covered);
  - extraction: vmap'd dynamic_slice -> [N, T, T, C] tile batch;
  - the model runs over tile chunks via lax.map (bounded memory);
  - stitching: logits are weighted by a separable Hann-like ramp that
    downweights tile borders (seam-free blending) and scatter-added into
    the canvas; a matching weight canvas normalizes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tile_origins(size: int, tile: int, stride: int) -> np.ndarray:
    """1-D tile start offsets covering [0, size) with last tile flush."""
    if size <= tile:
        return np.array([0], dtype=np.int32)
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return np.asarray(starts, dtype=np.int32)


def _blend_window(tile: int, overlap: int) -> np.ndarray:
    """Separable border ramp: 1 in the interior, cosine-tapered over the
    overlap margin.  Guarantees strictly positive weights everywhere."""
    if overlap <= 0:
        return np.ones((tile, tile), dtype=np.float32)
    ramp = np.ones(tile, dtype=np.float32)
    m = min(overlap, tile // 2)
    t = (np.arange(m) + 0.5) / m
    taper = 0.5 - 0.5 * np.cos(np.pi * t)  # 0..1
    ramp[:m] = taper
    ramp[tile - m :] = taper[::-1]
    w = np.outer(ramp, ramp)
    return np.maximum(w, 1e-3).astype(np.float32)


class TileEngine:
    """Whole-scene tiled inference over a jitted per-batch model fn.

    ``model_fn(images[N,T,T,C]) -> logits[N,T,T,num_classes]`` must accept
    normalized float input.  ``infer_scene`` takes an unnormalized float
    [H,W,C] scene (0..1) plus a normalize fn and returns full-res logits.
    """

    def __init__(
        self,
        model_fn: Callable,
        tile: int = 512,
        overlap: int = 64,
        batch: int = 8,
        num_classes: int = 2,
        mesh=None,
        data_axis: str | None = None,
    ):
        if overlap >= tile:
            raise ValueError("overlap must be < tile")
        self.model_fn = model_fn
        self.tile = tile
        self.overlap = overlap
        self.batch = batch
        self.num_classes = num_classes
        # Multi-chip scene parallelism: tiles are data over the mesh's
        # ``data_axis`` — each chip runs its tile shard of every chunk,
        # XLA gathers logits for the (replicated) blend.  ``batch`` is the
        # per-chip batch; chunk size becomes batch * n_devices.
        self.mesh = mesh
        self.data_axis = data_axis or (mesh.axis_names[0] if mesh else None)
        self._jit_cache = {}

    def _build(self, h: int, w: int):
        tile, overlap, batch = self.tile, self.overlap, self.batch
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dev = self.mesh.shape[self.data_axis]
            batch = batch * n_dev
            tile_sharding = NamedSharding(
                self.mesh, PartitionSpec(self.data_axis)
            )
        else:
            tile_sharding = None
        stride = tile - overlap
        ys = tile_origins(h, tile, stride)
        xs = tile_origins(w, tile, stride)
        origins = np.stack(
            [np.repeat(ys, len(xs)), np.tile(xs, len(ys))], axis=1
        )  # [N, 2]
        n = len(origins)
        pad_n = (-n) % batch  # pad tile list to a batch multiple
        if pad_n:
            origins = np.concatenate([origins, np.tile(origins[-1:], (pad_n, 1))])
        window = jnp.asarray(_blend_window(tile, overlap))
        origins_j = jnp.asarray(origins)
        model_fn = self.model_fn
        num_classes = self.num_classes
        # Weights-as-arguments protocol (infer/quantization.py): a model_fn
        # exposing ``inner``/``bound_args`` has its variable trees threaded
        # through this jit as arguments instead of being re-embedded as
        # program constants (closure constants blow the remote-compile
        # request-body limit on wide models and duplicate weights in HBM).
        inner = getattr(model_fn, "inner", None)
        bound = tuple(getattr(model_fn, "bound_args", ()))

        @jax.jit
        def run(scene: jax.Array, *bound_args) -> jax.Array:  # [H, W, C]
            def extract(origin):
                return jax.lax.dynamic_slice(
                    scene, (origin[0], origin[1], 0), (tile, tile, scene.shape[2])
                )

            tiles = jax.vmap(extract)(origins_j)  # [N', T, T, C]
            tiles = tiles.reshape(-1, batch, tile, tile, scene.shape[2])
            if inner is not None:
                def base(chunk):
                    return inner(chunk, *bound_args)
            else:
                base = model_fn
            fn = base
            if tile_sharding is not None:
                def fn(chunk):  # noqa: E306 — shard each chunk's batch
                    chunk = jax.lax.with_sharding_constraint(
                        chunk, tile_sharding
                    )
                    return base(chunk)
            logits = jax.lax.map(fn, tiles)  # [chunks, B, T, T, K]
            logits = logits.reshape(-1, tile, tile, num_classes)

            canvas = jnp.zeros((h, w, num_classes), jnp.float32)
            weights = jnp.zeros((h, w, 1), jnp.float32)

            def accumulate(i, carry):
                canvas, weights = carry
                oy, ox = origins_j[i, 0], origins_j[i, 1]
                contrib = logits[i].astype(jnp.float32) * window[..., None]
                patch = jax.lax.dynamic_slice(
                    canvas, (oy, ox, 0), (tile, tile, num_classes)
                )
                canvas = jax.lax.dynamic_update_slice(
                    canvas, patch + contrib, (oy, ox, 0)
                )
                wpatch = jax.lax.dynamic_slice(weights, (oy, ox, 0), (tile, tile, 1))
                weights = jax.lax.dynamic_update_slice(
                    weights, wpatch + window[..., None], (oy, ox, 0)
                )
                return canvas, weights

            canvas, weights = jax.lax.fori_loop(
                0, n, accumulate, (canvas, weights)
            )
            return canvas / weights

        if not bound:
            return run

        def call(scene):
            return run(scene, *bound)

        return call

    def infer_scene(self, scene: jax.Array) -> jax.Array:
        """[H,W,C] normalized scene -> [H,W,num_classes] blended logits."""
        h, w = int(scene.shape[0]), int(scene.shape[1])
        if h < self.tile or w < self.tile:
            # Small scene: reflect-pad up to one tile, run, crop back.
            ph, pw = max(0, self.tile - h), max(0, self.tile - w)
            padded = jnp.pad(scene, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            key = (int(padded.shape[0]), int(padded.shape[1]))
            if key not in self._jit_cache:
                self._jit_cache[key] = self._build(*key)
            return self._jit_cache[key](padded)[:h, :w]
        key = (h, w)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(h, w)
        return self._jit_cache[key](scene)
