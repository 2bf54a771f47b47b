"""Optimizers + per-iteration LR schedules via optax.

Mirrors the reference's setup (reference train.py:421-452):
  - sgd: momentum 0.9 nesterov, coupled weight decay (torch adds wd*p to the
    gradient) — reproduced with add_decayed_weights BEFORE the momentum
    transform;
  - adam: torch Adam's coupled weight decay likewise;
  - adamw: decoupled (optax.adamw);
  - cosine: stepped per iteration, eta_min = lr * 0.01 (train.py:449-451) —
    the reference ALWAYS uses this regardless of its dead OPTIMIZER_CONFIGS
    dict (train.py:26-50);
  - poly: (1 - it/T)^0.9 with floor (reference utils/scheduler.py:3-12),
    exported-but-unused there, first-class here.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import optax

from ..config import OptimConfig


def make_schedule(cfg: OptimConfig, total_itrs: int) -> Callable:
    if cfg.schedule == "cosine":
        return optax.cosine_decay_schedule(
            init_value=cfg.lr, decay_steps=total_itrs, alpha=cfg.cosine_min_factor
        )
    if cfg.schedule == "poly":

        def poly(step):
            frac = jnp.clip(1.0 - step / total_itrs, 0.0, 1.0)
            return jnp.maximum(cfg.lr * frac**cfg.poly_power, cfg.poly_min_lr)

        return poly
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(
    cfg: OptimConfig, total_itrs: int
) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (optimizer, schedule_fn).  schedule_fn(step) -> lr for logging."""
    schedule = make_schedule(cfg, total_itrs)

    if cfg.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(
                learning_rate=schedule,
                momentum=cfg.momentum,
                nesterov=cfg.nesterov,
            ),
        )
    elif cfg.optimizer == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(learning_rate=schedule),
        )
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(learning_rate=schedule, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return tx, schedule
