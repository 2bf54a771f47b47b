"""Segmentation losses, TPU-friendly.

Re-specifies the reference's loss zoo (reference train.py:454-459,
utils/loss.py:14-39) as pure jnp functions over NHWC logits:

  - ``cross_entropy_loss``           — CE, ignore_index=255, mean reduction
  - ``weighted_cross_entropy_loss``  — CE with per-class weights ("IWce_loss");
    matches torch's weighted-CE mean semantics (sum(w_i * ce_i) / sum(w_i))
  - ``focal_loss``                   — alpha*(1-pt)^gamma*CE (utils/loss.py:23-35)

All are fused by XLA into the tail of the network (log-softmax + gather +
masked mean is a single fusion); no host round-trip.  Logits are NHWC
``[B, H, W, C]``; labels ``[B, H, W]`` int with 255 = ignore.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _per_pixel_ce(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array],
    ignore_index: int,
):
    """Returns (ce, pixel_weight) per pixel; ignored pixels get weight 0.

    ``pixel_weight`` is the per-class weight gathered at the label (1.0 when
    no class_weights), matching torch's F.cross_entropy(weight=...) which
    normalizes the mean by the summed gathered weights.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)

    logits = logits.astype(jnp.float32)  # loss math in f32 even for bf16 nets
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1
    ).squeeze(-1)
    ce = logz - label_logit

    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=jnp.float32)[safe_labels]
    else:
        w = jnp.ones_like(ce)
    w = jnp.where(valid, w, 0.0)
    return ce, w


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
) -> jax.Array:
    """Mean CE over non-ignored pixels ("ce_loss", reference train.py:456-457)."""
    ce, w = _per_pixel_ce(logits, labels, None, ignore_index)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def weighted_cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array,
    *,
    ignore_index: int = 255,
) -> jax.Array:
    """Class-weighted CE ("IWce_loss", reference train.py:458-459).

    The weights come from ``data.class_weights.calculate_class_weights``
    ([1.0, sqrt(n_bg/n_fg)], reference train.py:388-410).  Torch semantics:
    mean = sum(w[y_i] * ce_i) / sum(w[y_i]).
    """
    ce, w = _per_pixel_ce(logits, labels, class_weights, ignore_index)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    alpha: float = 1.0,
    gamma: float = 0.0,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = 255,
    size_average: bool = True,
) -> jax.Array:
    """Focal loss (reference utils/loss.py:14-35).

    The reference computes per-pixel weighted CE, then pt = exp(-ce) and
    alpha*(1-pt)^gamma*ce, then a plain mean over ALL non-ignored pixels
    (reduction='none' CE zeroes ignored entries; .mean() divides by the
    full element count including ignored ones — we reproduce that exactly).
    """
    ce, w = _per_pixel_ce(logits, labels, class_weights, ignore_index)
    ce = ce * w  # weighted, ignored -> 0 (torch reduction='none' behavior)
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce
    if size_average:
        return jnp.mean(fl)
    return jnp.sum(fl)


def make_loss_fn(
    loss_type: str,
    *,
    class_weights: Optional[jax.Array] = None,
    ignore_index: int = 255,
    focal_alpha: float = 1.0,
    focal_gamma: float = 0.0,
    fused: str = "auto",
    num_classes: int = 2,
    mesh=None,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Loss factory mirroring setup_criterion (reference train.py:454-459)
    plus the focal variant the reference defined but never wired
    (utils/loss.py:37-39 — wired here on purpose).

    ``fused``: 'auto' uses the Pallas fused softmax-CE kernel for binary
    CE/IWce on TPU backends, 'always' forces it, 'never' keeps the jnp
    path (which XLA fuses into the network tail anyway), 'interpret' runs
    the kernel through the Pallas interpreter (CPU golden/parity tests).
    On a multi-device
    mesh the kernel runs per-shard under shard_map with a psum of the
    (ce_sum, w_sum) pair over the data axis (pass ``mesh``).
    """
    on_tpu = jax.default_backend() not in ("cpu",)
    interpret = fused == "interpret"  # Pallas interpreter (CPU test suite)
    want_fused = (
        loss_type in ("ce_loss", "IWce_loss")
        and num_classes == 2
        and (fused in ("always", "interpret") or (fused == "auto" and on_tpu))
    )
    if want_fused:
        cw = (
            jnp.asarray(class_weights, jnp.float32)
            if class_weights is not None
            else jnp.ones(2, jnp.float32)
        )
        if jax.device_count() > 1:
            if mesh is None:
                # no mesh to shard over — an opaque pallas_call would force
                # GSPMD to all-gather the logits; keep the jnp path
                want_fused = False
            else:
                from .pallas.fused_ce import make_sharded_fused_ce

                sharded = make_sharded_fused_ce(
                    mesh, axis=mesh.axis_names[0], ignore_index=ignore_index,
                    interpret=interpret,
                )

                def fused_loss(logits, labels):
                    return sharded(logits, labels, cw)

                return fused_loss
        if want_fused:
            from .pallas.fused_ce import fused_binary_ce

            def fused_loss(logits, labels):
                return fused_binary_ce(logits, labels, cw, ignore_index, interpret)

            return fused_loss

    if loss_type == "ce_loss":
        return partial(cross_entropy_loss, ignore_index=ignore_index)
    if loss_type == "IWce_loss":
        if class_weights is None:
            raise ValueError("IWce_loss requires class_weights")
        cw = jnp.asarray(class_weights, jnp.float32)
        return partial(
            weighted_cross_entropy_loss, class_weights=cw, ignore_index=ignore_index
        )
    if loss_type == "focal_loss":
        return partial(
            focal_loss,
            alpha=focal_alpha,
            gamma=focal_gamma,
            class_weights=class_weights,
            ignore_index=ignore_index,
        )
    raise ValueError(f"unknown loss_type {loss_type!r}")
