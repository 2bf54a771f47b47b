"""Best-checkpoint persistence (Orbax) with the reference's policy.

Policy parity (reference train.py:525-609):
  - best-only: previous ``best_*`` checkpoints are deleted before saving
    (:543-550);
  - name embeds the weighted score:
    ``best_{model}_{dataset}_os{OS}_weighted{score:.3f}`` (:554-555);
  - atomic publish: orbax commits per-array atomically; the checkpoint
    directory itself is staged under a tmp name and ``os.replace``d
    (:584-587's tmp + replace);
  - disk-space warning below 1 GB (:560-564);
  - payload: model/optimizer state, cur_itrs, best_score, weighted_score,
    val_score, save_time, model_config (:567-582).

Resume parity (reference train.py:972-1016): ``restore`` returns the state
plus metadata; callers may restore params only (fresh optimizer) or the
full training state (``--continue_training``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState

MIN_FREE_BYTES = 1 << 30  # 1 GB warning threshold (reference train.py:560-564)


def _check_disk_space(directory: str) -> None:
    try:
        usage = shutil.disk_usage(directory)
        if usage.free < MIN_FREE_BYTES:
            print(
                f"WARNING: low disk space ({usage.free / 1e9:.2f} GB free) "
                f"in {directory}"
            )
    except OSError:
        pass


def _save_state_tree(tmp_path: str, state: TrainState) -> None:
    """Write the state tree (and, when present, the "quant" sidecar) under
    ``tmp_path``.

    The quant sidecar holds the delayed-int8 running activation amaxes
    (models/layers.ConvBN, ModelConfig.int8_scale_mode="delayed") — a few
    scalars per routed conv.  It is stored as its own pytree so restore
    stays backward/forward-compatible: plain checkpoints have no ``quant/``
    dir, and a serving-side template built from a plain (non-QAT) model can
    still pick the amaxes up (infer/predictor.py reuses them as int8
    serving calibration, conv_scales_from_quant)."""
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(tmp_path, "state")),
        {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
    )
    if jax.tree_util.tree_leaves(state.quant):
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(os.path.join(tmp_path, "quant")), state.quant
        )


def _restore_quant_sidecar(path: str, default):
    """Raw-restore ``path/quant`` if this checkpoint carries one (small
    scalar tree — no template needed), else ``default``."""
    qpath = os.path.join(path, "quant")
    if not os.path.isdir(qpath):
        return default
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(qpath))


def best_checkpoint_name(
    model_name: str, dataset: str, output_stride: int, weighted: float
) -> str:
    return f"best_{model_name}_{dataset}_os{output_stride}_weighted{weighted:.3f}"


def save_best(
    checkpoints_dir: str,
    state: TrainState,
    *,
    model_name: str,
    dataset: str,
    output_stride: int,
    num_classes: int,
    weighted: float,
    val_score: Optional[dict] = None,
    best_score: Optional[dict] = None,
) -> str:
    """Save ``state`` as the new best checkpoint; returns its path."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    _check_disk_space(checkpoints_dir)

    # best-only policy: drop previous bests
    for old in glob.glob(os.path.join(checkpoints_dir, "best_*")):
        shutil.rmtree(old, ignore_errors=True)

    name = best_checkpoint_name(model_name, dataset, output_stride, weighted)
    final_path = os.path.join(checkpoints_dir, name)
    tmp_path = os.path.join(checkpoints_dir, f".tmp_{name}_{os.getpid()}")
    shutil.rmtree(tmp_path, ignore_errors=True)

    state = jax.device_get(state)
    _save_state_tree(tmp_path, state)
    meta = {
        "cur_itrs": int(state.step),
        "weighted_score": float(weighted),
        "val_score": _plain(val_score or {}),
        "best_score": _plain(best_score or {}),
        "save_time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "model_config": {
            "model_name": model_name,
            "dataset": dataset,
            "output_stride": output_stride,
            "num_classes": num_classes,
        },
    }
    with open(os.path.join(tmp_path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)

    shutil.rmtree(final_path, ignore_errors=True)
    os.replace(tmp_path, final_path)  # atomic publish
    return final_path


def find_best(checkpoints_dir: str) -> Optional[str]:
    cands = sorted(glob.glob(os.path.join(checkpoints_dir, "best_*")))
    return cands[-1] if cands else None


def save_latest(checkpoints_dir: str, state: TrainState, **meta_extra) -> str:
    """Rolling fault-tolerance checkpoint (``latest/``), independent of the
    best-only policy.  The reference has no elasticity story (SURVEY §5.3);
    this plus ``find_latest`` gives crash-resume."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    _check_disk_space(checkpoints_dir)
    final_path = os.path.join(checkpoints_dir, "latest")
    tmp_path = os.path.join(checkpoints_dir, f".tmp_latest_{os.getpid()}")
    shutil.rmtree(tmp_path, ignore_errors=True)

    state = jax.device_get(state)
    _save_state_tree(tmp_path, state)
    meta = {
        "cur_itrs": int(state.step),
        "save_time": time.strftime("%Y-%m-%d %H:%M:%S"),
        **_plain(meta_extra),
    }
    with open(os.path.join(tmp_path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    shutil.rmtree(final_path, ignore_errors=True)
    os.replace(tmp_path, final_path)
    return final_path


def find_latest(checkpoints_dir: str) -> Optional[str]:
    p = os.path.join(checkpoints_dir, "latest")
    return p if os.path.isdir(p) else None


def restore(
    path: str, template_state: TrainState
) -> Tuple[TrainState, dict]:
    """Restore a checkpoint into the shape/dtype structure of ``template_state``.

    Returns (state, meta).  Mirrors the reference's strict=False model
    restore + separate optimizer/scheduler restore (train.py:975-1016):
    callers that don't want the optimizer state can keep the template's.
    """
    ckptr = ocp.PyTreeCheckpointer()
    target = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
    }
    restored = ckptr.restore(
        os.path.abspath(os.path.join(path, "state")), item=target
    )
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    state = TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        # delayed-int8 amaxes ride a small "quant" sidecar tree when the
        # saved run used QAT; a plain template still receives them (the
        # serving path reuses them as int8 calibration).  Resume without
        # the sidecar re-warms in one step (running max folds the current
        # batch in immediately).
        quant=_restore_quant_sidecar(path, template_state.quant),
    )
    return state, meta


def _plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, float) and (obj != obj or obj in (float("inf"), float("-inf"))):
        return str(obj)
    return obj
