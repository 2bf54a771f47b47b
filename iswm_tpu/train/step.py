"""Jitted train/eval steps.

The whole reference inner loop (forward -> CE -> backward -> SGD step ->
scheduler.step; reference train.py:1037-1049,1103) is ONE compiled XLA
program here, optionally with the device-side augmentation fused in front
so a raw uint8 host batch goes in and updated state comes out — no
intermediate host round-trips.  Under a sharded jit the batch dimension
carries a NamedSharding over the mesh's data axis; XLA inserts the
gradient/BN all-reduces (the DataParallel replacement, SURVEY §2.8).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.transforms import AugmentConfig, augment_sample, val_transform_batch


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # "quant" collection: running activation amaxes for int8_training with
    # int8_scale_mode="delayed" (ops/int8_train.int8_conv_static_amax).
    # Empty dict for every other configuration — an empty pytree, invisible
    # to checkpoints and shardings.
    quant: Any = flax.struct.field(default_factory=dict)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jax.Array,
) -> TrainState:
    # jit the init: eager op-by-op init is pathologically slow on remote
    # backends (hundreds of dispatches), and jit compiles it into one program.
    # A fresh closure (NOT functools.partial(model.init)) on purpose: jit
    # unwraps partials and caches on the bound method, and flax modules
    # compare equal by field values.  (The QuantSpec module field is part
    # of those values, so differently-quantized models hash apart — the
    # round-3 process-global int8 gates made same-config models silently
    # share one stale trace; the fresh closure remains cheap insurance.)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        {"params": rng}, sample_input
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        quant=variables.get("quant", {}),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    augment: Optional[AugmentConfig] = None,
    donate: bool = True,
    remat: bool = False,
) -> Callable:
    """Build the fused train step.

    If ``augment`` is given, the step takes raw uint8 images [B,H,W,C] +
    int labels and runs scale/crop/flip/normalize on device first.
    ``remat`` rematerializes the forward during the backward pass
    (jax.checkpoint) — trades ~1/3 more FLOPs for activation memory,
    enabling larger tiles/batches per chip.
    Returns ``train_step(state, images, labels, rng) -> (state, metrics)``.
    """

    def step_fn(
        state: TrainState, images: jax.Array, labels: jax.Array, rng: jax.Array
    ) -> Tuple[TrainState, dict]:
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        if augment is not None:
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            keys = jax.random.split(aug_rng, images.shape[0])
            images, labels = jax.vmap(
                lambda k, i, l: augment_sample(k, i, l, augment)
            )(keys, images, labels)

        # delayed int8 scaling state rides in a "quant" collection; the
        # trace-time emptiness check keeps every other config's program
        # byte-identical to before
        has_quant = bool(jax.tree_util.tree_leaves(state.quant))
        variables = {"batch_stats": state.batch_stats}
        mutable = ["batch_stats"] + (["quant"] if has_quant else [])
        if has_quant:
            variables["quant"] = state.quant

        def forward(params, images):
            return model.apply(
                {**variables, "params": params},
                images,
                train=True,
                mutable=mutable,
                rngs={"dropout": dropout_rng},
            )

        if remat:
            forward = jax.checkpoint(
                forward,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )

        def compute_loss(params):
            logits, mutated = forward(params, images)
            loss = loss_fn(logits, labels.astype(jnp.int32))
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=mutated["batch_stats"],
            opt_state=new_opt_state,
            quant=mutated.get("quant", state.quant),
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    normalize_input: bool = True,
    want: Tuple[str, ...] = ("logits", "probs", "preds"),
) -> Callable:
    """Eval step: argmax preds (validation semantics, reference
    train.py:644) and/or fg softmax probability (predict semantics,
    reference predict.py:275) in one dispatch.

    ``want`` selects the materialized outputs — at 512x512 each full-res
    tensor is pure HBM traffic, so validation passes ("preds",).
    """

    def eval_fn(params, batch_stats, images):
        if normalize_input and images.dtype == jnp.uint8:
            images = val_transform_batch(images)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        out = {}
        if "logits" in want:
            out["logits"] = logits
        if "probs" in want:
            out["probs"] = jax.nn.softmax(logits, axis=-1)
        if "preds" in want:
            out["preds"] = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return out

    return jax.jit(eval_fn)
