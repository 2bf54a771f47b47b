"""Experimental int8-forward training convs (ops/int8_train.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_int8_conv_st_forward_close_and_grads_dense():
    from iswm_tpu.ops.int8_train import int8_conv_st, _dense_conv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.05, jnp.float32)
    pad = ((1, 1), (1, 1))

    out = int8_conv_st(x, w, (1, 1), pad, (1, 1))
    dense = _dense_conv(x, w, (1, 1), pad, (1, 1))
    rel = float(jnp.max(jnp.abs(out - dense)) / jnp.max(jnp.abs(dense)))
    assert rel < 0.06, rel  # 8-bit forward noise bound

    # straight-through: gradients are EXACTLY the dense conv's
    def loss_q(x, w):
        return jnp.sum(int8_conv_st(x, w, (1, 1), pad, (1, 1)) ** 2) / 2

    def loss_d(x, w):
        return jnp.sum(_dense_conv(x, w, (1, 1), pad, (1, 1)) ** 2) / 2

    gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
    # STE cotangent g = out_q (not dense out), so compare against the dense
    # transpose applied to the SAME cotangent
    gx_d = jax.linear_transpose(lambda xx: _dense_conv(xx, w, (1, 1), pad, (1, 1)), x)(out)[0]
    gw_d = jax.linear_transpose(lambda ww: _dense_conv(x, ww, (1, 1), pad, (1, 1)), w)(out)[0]
    np.testing.assert_allclose(np.asarray(gx_q), np.asarray(gx_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_q), np.asarray(gw_d), rtol=1e-5)


def test_int8_conv_st_strided_dilated_shapes():
    from iswm_tpu.ops.int8_train import int8_conv_st, _dense_conv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32)
    for strides, pad, dil in (
        ((2, 2), ((1, 1), (1, 1)), (1, 1)),
        ((1, 1), ((2, 2), (2, 2)), (2, 2)),
    ):
        out = int8_conv_st(x, w, strides, pad, dil)
        dense = _dense_conv(x, w, strides, pad, dil)
        assert out.shape == dense.shape
        rel = float(jnp.max(jnp.abs(out - dense)) / jnp.max(jnp.abs(dense)))
        assert rel < 0.08, (strides, pad, dil, rel)


def test_int8_training_smoke():
    """10 fused train steps with ModelConfig.int8_training: loss finite and
    decreasing; the variable tree matches the bf16 model's exactly."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=10)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])

    # tree parity with the bf16 model (same checkpoints load); QuantSpec
    # is per-model, so the plain build needs no global gymnastics
    ref_model = build_model(
        type(cfg.model)(backbone="resnet18", compute_dtype="float32")
    )
    ref_state = create_train_state(ref_model, tx, jax.random.key(0), x[:1])
    assert jax.tree_util.tree_structure(state.params) == \
        jax.tree_util.tree_structure(ref_state.params)

    losses = []
    for i in range(10):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_int8_conv_static_amax_matches_dynamic_when_warm():
    """With the running amax equal to the tensor's true absmax, the delayed
    path reproduces the dynamic path exactly; grads are straight-through
    (dense transpose) with no gradient to the amax."""
    from iswm_tpu.ops.int8_train import (
        _dense_conv,
        int8_conv_st,
        int8_conv_static_amax,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.05, jnp.float32)
    pad = ((1, 1), (1, 1))
    amax = jnp.max(jnp.abs(x))

    out, new_amax = int8_conv_static_amax(x, w, amax, (1, 1), pad, (1, 1))
    out_dyn = int8_conv_st(x, w, (1, 1), pad, (1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_dyn), rtol=1e-6)
    # running-max update: max(cur, decay*old) == cur here
    np.testing.assert_allclose(float(new_amax), float(amax), rtol=1e-6)

    # a STALE (smaller) amax clips but still yields a usable forward
    out_stale, new2 = int8_conv_static_amax(x, w, amax * 0.5, (1, 1), pad, (1, 1))
    assert np.isfinite(np.asarray(out_stale)).all()
    np.testing.assert_allclose(float(new2), float(amax), rtol=1e-6)  # re-adapts

    def loss_q(x, w, a):
        out, _ = int8_conv_static_amax(x, w, a, (1, 1), pad, (1, 1))
        return jnp.sum(out ** 2) / 2

    gx, gw, ga = jax.grad(loss_q, argnums=(0, 1, 2))(x, w, amax)
    gx_d = jax.linear_transpose(
        lambda xx: _dense_conv(xx, w, (1, 1), pad, (1, 1)), x
    )(out)[0]
    gw_d = jax.linear_transpose(
        lambda ww: _dense_conv(x, ww, (1, 1), pad, (1, 1)), w
    )(out)[0]
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_d), rtol=1e-5)
    assert float(ga) == 0.0


def test_int8_training_delayed_smoke():
    """Delayed scaling: the model carries a 'quant' collection of running
    amaxes threaded through TrainState.quant; amaxes turn positive after
    one step, loss decreases, and the params tree still matches bf16."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_scale_mode = "delayed"
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=10)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])

    amaxes = jax.tree_util.tree_leaves(state.quant)
    assert amaxes, "delayed mode must create the quant collection"
    # init already warms the amaxes from the sample input (the quant
    # collection is mutable during model.init)
    assert all(float(a) >= 0.0 for a in amaxes)

    losses = []
    for i in range(10):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    warm = jax.tree_util.tree_leaves(state.quant)
    assert all(float(a) > 0.0 for a in warm), "amaxes warmed after steps"


def test_conv_scales_from_quant_serves_int8_exec():
    """QAT->serving loop: the 'quant' collection's learned amaxes convert to
    the conv-site scale dict the int8_exec interceptors key on; the derived
    keys are a subset of what wide calibration finds on the SAME (plain)
    model build, and the executed-int8 fn runs with the merged scales."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        conv_scales_from_quant,
        make_int8_exec_fn,
    )
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 3)), jnp.float32)

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_scale_mode = "delayed"
    qat_model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=1)
    state = create_train_state(qat_model, tx, jax.random.key(0), x)
    qat_scales = conv_scales_from_quant(state.quant)
    assert qat_scales, "QAT build must yield per-conv scales"
    import re

    assert all(
        k.endswith("/conv") or re.search(r"#p\d+$", k) for k in qat_scales
    )
    # ConcatConvBN (decoder cls0) part amaxes must map to the serving
    # interceptor's "<site>#p{i}" keys, not be dropped
    assert any(re.search(r"#p\d+$", k) for k in qat_scales), (
        "ConcatConvBN x_amax_p{i} entries missing from the serving map"
    )
    assert all(s > 0 for s in qat_scales.values())

    # plain build (serving-side model): same variable tree, no quant coll.
    plain_model = build_model(
        type(cfg.model)(backbone="resnet18", compute_dtype="float32")
    )
    calibrated = calibrate_conv_inputs(
        plain_model, state.params, state.batch_stats, [x], wide=True
    )
    # Every QAT-routed conv is an eligible serving site under wide mode
    missing = set(qat_scales) - set(calibrated)
    assert not missing, f"QAT sites unknown to serving: {sorted(missing)[:5]}"

    merged = dict(calibrated)
    merged.update(qat_scales)
    fn = make_int8_exec_fn(
        plain_model, state.batch_stats, state.params, merged, backend="xla"
    )
    logits = np.asarray(fn(x))
    assert np.isfinite(logits).all()
    assert fn.routed_sites, "int8 path must actually route convs"


def test_quant_sidecar_checkpoint_roundtrip(tmp_path):
    """QAT amaxes survive checkpointing: save_latest writes the "quant"
    sidecar, restore returns it into a QAT template, AND a plain (non-QAT)
    template still receives it — the predictor's QAT->int8-serving reuse
    depends on that (infer/predictor.py)."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.train import checkpoint as ckpt_lib
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 3)), jnp.float32)

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_scale_mode = "delayed"
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=1)
    state = create_train_state(model, tx, jax.random.key(0), x)
    assert jax.tree_util.tree_leaves(state.quant)
    # make the amaxes distinguishable from a fresh init
    marked = jax.tree.map(lambda a: a + 3.25, state.quant)
    state = state.replace(quant=marked)
    path = ckpt_lib.save_latest(str(tmp_path), state)

    # QAT template: amaxes come back exactly
    fresh = create_train_state(model, tx, jax.random.key(1), x)
    restored, _ = ckpt_lib.restore(path, fresh)
    got = jax.tree.leaves(restored.quant)
    want = jax.tree.leaves(marked)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))

    # plain template (serving side): sidecar still restores
    plain_cfg = type(cfg.model)(backbone="resnet18", compute_dtype="float32")
    plain_model = build_model(plain_cfg)
    tx, _ = make_optimizer(cfg.optim, total_itrs=1)
    plain_state = create_train_state(plain_model, tx, jax.random.key(2), x)
    assert not jax.tree_util.tree_leaves(plain_state.quant)
    restored2, _ = ckpt_lib.restore(path, plain_state)
    assert jax.tree_util.tree_leaves(restored2.quant)

    # and a non-QAT checkpoint restores with no sidecar (back-compat)
    path2 = ckpt_lib.save_latest(str(tmp_path / "plain"), plain_state)
    restored3, _ = ckpt_lib.restore(path2, plain_state)
    assert not jax.tree_util.tree_leaves(restored3.quant)


def test_int8_conv_fullq_exact_vs_dense_on_grid():
    """With inputs planted so every symmetric scale is exactly 1 (amax ==
    127), quantization is lossless and int8_conv_fullq must reproduce the
    dense conv's output AND both gradients bit-exactly — this pins the
    transpose padding/dimension-number math of the int8 dgrad/wgrad across
    the conv-config grid the zoo uses."""
    import itertools

    from iswm_tpu.ops.int8_train import int8_conv_fullq

    rng = np.random.default_rng(7)

    def mk(shape):
        a = rng.integers(-126, 127, shape).astype(np.float32)
        a.flat[0] = 127.0  # plant amax=127 -> scale 1, exact quantize
        return jnp.asarray(a)

    for k, s, d in itertools.product((1, 3), (1, 2), (1, 2, 3)):
        if k == 1 and d > 1:
            continue
        pad = ((k // 2) * d, (k // 2) * d)
        x, w = mk((2, 10, 9, 4)), mk((k, k, 4, 6))
        wnp = np.array(w)
        wnp[0, 0, 0, :] = 127.0  # per-O scales exactly 1 too
        w = jnp.asarray(wnp)
        geo = ((s, s), (pad, pad), (d, d))

        def dense(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), [pad, pad], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out_ref, vjp = jax.vjp(dense, x, w)
        out = int8_conv_fullq(x, w, *geo)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))

        g = mk(out_ref.shape)
        dx_ref, dw_ref = vjp(g)
        dx, dw = jax.vjp(
            lambda x, w: int8_conv_fullq(x, w, *geo), x, w
        )[1](g)
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref)), (k, s, d)
        np.testing.assert_array_equal(np.asarray(dw), np.asarray(dw_ref)), (k, s, d)


def test_int8_bwd_training_smoke():
    """10 train steps with int8_training_bwd: loss finite and decreasing,
    variable tree unchanged (checkpoints interchange with bf16)."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_training_bwd = True
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=10)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])

    ref_model = build_model(
        type(cfg.model)(backbone="resnet18", compute_dtype="float32")
    )
    ref_state = create_train_state(ref_model, tx, jax.random.key(0), x[:1])
    assert jax.tree_util.tree_structure(state.params) == \
        jax.tree_util.tree_structure(ref_state.params)

    losses = []
    for i in range(10):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_int8_conv_fullq_static_matches_fullq_when_warm():
    """With the running amax equal to the true absmax, the delayed+bwd
    variant reproduces int8_conv_fullq exactly — output AND both int8
    gradients — and carries no gradient to the amax."""
    from iswm_tpu.ops.int8_train import int8_conv_fullq, int8_conv_fullq_static

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 10, 9, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 10, 9, 16)), jnp.float32)
    geo = ((1, 1), ((1, 1), (1, 1)), (1, 1))
    amax = jnp.max(jnp.abs(x))

    out_ref, vjp_ref = jax.vjp(lambda x, w: int8_conv_fullq(x, w, *geo), x, w)

    def f(x, w, a):
        out, _ = int8_conv_fullq_static(x, w, a, *geo)
        return out

    out, vjp = jax.vjp(f, x, w, amax)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    dx_ref, dw_ref = vjp_ref(g)
    dx, dw, da = vjp(g)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref))
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dw_ref))
    assert float(da) == 0.0

    # the amax side-output still re-adapts from a stale value
    _, new_amax = int8_conv_fullq_static(x, w, amax * 0.25, *geo)
    np.testing.assert_allclose(float(new_amax), float(amax), rtol=1e-6)


def test_int8_bwd_delayed_training_smoke():
    """Delayed scale mode + int8 bwd: the quant collection is created and
    updated, loss decreases over 10 steps."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_scale_mode = "delayed"
    cfg.model.int8_training_bwd = True
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=10)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])
    amaxes = jax.tree_util.tree_leaves(state.quant)
    assert amaxes, "delayed mode must create the quant collection"
    flat = jax.tree_util.tree_flatten_with_path(state.quant)[0]
    assert any(
        "x_amax_p" in jax.tree_util.keystr(path) for path, _ in flat
    ), "ConcatConvBN (decoder cls0) parts must be QAT-routed too"

    losses = []
    for i in range(10):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    warm = jax.tree_util.tree_leaves(state.quant)
    assert all(float(a) > 0 for a in warm), "amaxes must have warmed up"


def test_int8_dilated_conv3x3_exact_on_grid():
    """Planted amax=127 inputs make every scale exactly 1: the int8
    valid-tap atrous conv must reproduce the dense dilated conv's output
    and (int8_bwd=True) both gradients bit-exactly, across the ASPP
    dilation range; int8_bwd=False must reproduce the dense tap-form
    backward exactly (straight-through)."""
    from iswm_tpu.models.layers import dilated_conv3x3
    from iswm_tpu.ops.int8_train import int8_dilated_conv3x3

    rng = np.random.default_rng(13)

    def mk(shape):
        a = rng.integers(-126, 127, shape).astype(np.float32)
        a.flat[0] = 127.0
        return jnp.asarray(a)

    for d in (1, 2, 3, 6):  # 6 > map extent/2 on a 10x9 map: taps clipped
        x, w = mk((2, 10, 9, 4)), mk((3, 3, 4, 6))
        wnp = np.array(w)
        wnp[0, 0, 0, :] = 127.0  # per-O scales exactly 1
        w = jnp.asarray(wnp)

        def dense(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out_ref, vjp_ref = jax.vjp(dense, x, w)
        out = int8_dilated_conv3x3(x, w, d, True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))

        g = mk(out_ref.shape)
        dx_ref, dw_ref = vjp_ref(g)
        dx, dw = jax.vjp(
            lambda x, w: int8_dilated_conv3x3(x, w, d, True), x, w
        )[1](g)
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref)), d
        np.testing.assert_array_equal(np.asarray(dw), np.asarray(dw_ref)), d

        # straight-through mode: grads equal the dense TAP backward
        dx_st, dw_st = jax.vjp(
            lambda x, w: int8_dilated_conv3x3(x, w, d, False), x, w
        )[1](g)
        dx_tap, dw_tap = jax.vjp(
            lambda x, w: dilated_conv3x3(x, w, d), x, w
        )[1](g)
        np.testing.assert_array_equal(np.asarray(dx_st), np.asarray(dx_tap))
        np.testing.assert_array_equal(np.asarray(dw_st), np.asarray(dw_tap))


def test_int8_training_xception_pointwise_smoke():
    """QAT routes the separable pointwise convs (xception zoo): params tree
    matches the dense model's, 3 train steps stay finite and decrease."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "xception"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_training_bwd = True
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=3)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    y = jnp.asarray((rng.random((1, 64, 64)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x)

    ref_model = build_model(
        type(cfg.model)(backbone="xception", compute_dtype="float32")
    )
    ref_state = create_train_state(ref_model, tx, jax.random.key(0), x)
    assert jax.tree_util.tree_structure(state.params) == \
        jax.tree_util.tree_structure(ref_state.params)

    losses = []
    for i in range(8):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # int8-gradient steps on a 1-sample batch aren't monotonic;
    # descend-on-average is the invariant
    assert min(losses[4:]) < losses[0]


def test_int8_bwd_training_on_mesh():
    """QAT (delayed scales + int8 bwd) composes with the multi-chip
    program: the train step jits over a 4x2 data-x-model mesh (batch over
    'data', image H over 'model' — GSPMD inserts the global amax
    all-reduces and conv halo exchanges), loss is finite over 2 steps and
    the replicated quant amaxes warm up to globally-consistent values."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.parallel.mesh import make_mesh
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = True
    cfg.model.int8_scale_mode = "delayed"
    cfg.model.int8_training_bwd = True
    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=2)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((4, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])

    mesh = make_mesh(data_axis=4, model_axis=2)
    batch_sh = NamedSharding(mesh, P("data", "model"))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    x = jax.device_put(x, batch_sh)
    y = jax.device_put(y, batch_sh)

    losses = []
    for i in range(2):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    warm = jax.tree_util.tree_leaves(state.quant)
    assert warm and all(float(a) > 0 for a in warm)
    # amax state must stay fully replicated (every shard identical)
    for leaf in warm:
        vals = {float(np.asarray(s.data)) for s in leaf.addressable_shards}
        assert len(vals) == 1

def test_int8_cost_route_geometry():
    """The per-site roofline model (VERDICT r3 ask #2) expresses what the
    scalar channel gate cannot: at the same input width, a wide 3x3 routes
    (k^2*cout MACs/value dwarf the quantize pass) while a narrow 1x1
    reducer does not (its small matmul saves less MXU time than the
    absmax+quantize HBM passes cost)."""
    from iswm_tpu.ops.int8_train import int8_cost_route

    # resnext/resnet layer2+ 3x3: k=3, cout=256 -> MACs/value 2304, routes
    fwd, bwd = int8_cost_route(256, 256, 3, 1, want_bwd=True)
    assert fwd and bwd
    # narrow 1x1 reducer: k=1, cout=64 -> MACs/value 64, loses
    fwd, bwd = int8_cost_route(256, 64, 1, 1, want_bwd=True)
    assert not fwd and not bwd
    # stride divides output pixels: a /2 strided 1x1 must be at least as
    # hard to justify as its unstrided sibling
    assert (
        int8_cost_route(256, 512, 1, 2)[0]
        <= int8_cost_route(256, 512, 1, 1)[0]
    )
    # delayed scaling (one fused pass) lowers the routing threshold:
    # anything the dynamic mode routes, delayed routes too
    for cout, k in ((64, 3), (256, 1), (512, 1), (256, 3)):
        dyn = int8_cost_route(256, cout, k, 1)[0]
        dly = int8_cost_route(256, cout, k, 1, delayed=True)[0]
        assert dly >= dyn
    # bwd never routes without fwd (it reuses the fwd's int8 residuals)
    assert int8_cost_route(256, 64, 1, 1, want_bwd=True) == (False, False)


def test_int8_route_cost_in_model():
    """int8_route='cost' in a real model: QuantSpec.conv_routing applies
    the roofline model above the channel floor, so the routed-site SET is
    a strict subset of gate mode's at the same threshold; training still
    steps to a finite, decreasing loss."""
    from iswm_tpu.config import Config
    from iswm_tpu.models import build_model, quant_spec
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = 8
    spec_gate = quant_spec(cfg.model)
    cfg.model.int8_route = "cost"
    spec_cost = quant_spec(cfg.model)

    # every conv geometry of resnet18 @48px: (cin, cout, k, stride)
    sites = [(64, 64, 3, 1), (64, 128, 3, 2), (128, 128, 3, 1),
             (64, 128, 1, 2), (128, 256, 3, 2), (256, 256, 3, 1),
             (128, 256, 1, 2), (256, 512, 3, 1), (512, 512, 3, 1),
             (256, 512, 1, 1), (256, 48, 1, 1), (304, 256, 3, 1)]
    gate_routed = {s for s in sites if spec_gate.conv_routing(*s[:4])[0]}
    cost_routed = {s for s in sites if spec_cost.conv_routing(*s[:4])[0]}
    assert cost_routed < gate_routed, (cost_routed, gate_routed)
    # the narrow 1x1 head reducer is exactly what cost mode must drop
    assert (256, 48, 1, 1) in gate_routed - cost_routed

    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, total_itrs=6)
    step = make_train_step(model, tx, make_loss_fn("ce_loss"), donate=False)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 48, 48, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 48, 48)) > 0.8), jnp.int32)
    state = create_train_state(model, tx, jax.random.key(0), x[:1])
    losses = []
    for i in range(6):
        state, metrics = step(state, x, y, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_int8_switch_iter_hybrid_schedule(tmp_path):
    """TrainConfig.int8_switch_iter: a 6-iter trainer run with the switch
    at 3 starts on the int8 (QAT, delayed scales) step and finishes on the
    plain bf16 step — params/optimizer/BN stats carry over, the delayed
    "quant" collection is dropped at the switch, and the run completes
    with finite losses."""
    import os

    from iswm_tpu.config import Config
    from iswm_tpu.train import Trainer

    root = str(tmp_path)
    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.int8_training = 8
    cfg.model.int8_scale_mode = "delayed"  # exercises the quant-drop path
    cfg.model.int8_training_bwd = True
    cfg.data.synthetic = True
    cfg.data.data_root = os.path.join(root, "data")
    cfg.data.synthetic_train_size = 8
    cfg.data.synthetic_val_size = 4
    cfg.data.synthetic_image_size = 40
    cfg.data.crop_size = 32
    cfg.data.batch_size = 8
    cfg.data.val_batch_size = 4
    cfg.train.total_itrs = 6
    cfg.train.val_interval = 6
    cfg.train.print_interval = 3
    cfg.train.int8_switch_iter = 3
    cfg.train.checkpoints_dir = os.path.join(root, "ckpt")
    cfg.train.val_results_dir = os.path.join(root, "val")
    cfg.train.metrics_plots_dir = os.path.join(root, "plots")
    cfg.train.log_dir = os.path.join(root, "logs")
    cfg.metrics.sequence_length = 3

    trainer = Trainer(cfg)
    assert trainer.model.backbone.quant.int8  # starts quantized
    assert jax.tree_util.tree_leaves(trainer.state.quant)  # delayed amaxes
    trainer.fit()
    assert int(trainer.state.step) == 6
    assert trainer._switch_iter == 0  # switch happened
    assert not trainer.model.backbone.quant.int8  # finished on bf16 model
    assert not jax.tree_util.tree_leaves(trainer.state.quant)  # dropped
    losses = trainer.logger.history["train_loss"]
    assert len(losses) >= 2 and np.isfinite(losses).all()
