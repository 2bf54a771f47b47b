"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iswm_tpu.ops.losses import cross_entropy_loss, weighted_cross_entropy_loss
from iswm_tpu.ops.pallas.confusion import binary_confusion_matrix
from iswm_tpu.ops.pallas.fused_ce import fused_binary_ce
from iswm_tpu.metrics import fast_hist


def _random_case(seed, shape=(2, 33, 47)):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(*shape, 2)).astype(np.float32) * 3
    labels = rng.integers(0, 2, shape).astype(np.int32)
    labels[0, :2, :3] = 255  # ignore pixels
    return jnp.asarray(logits), jnp.asarray(labels)


def test_fused_ce_matches_reference_unweighted():
    logits, labels = _random_case(0)
    ref = cross_entropy_loss(logits, labels)
    got = fused_binary_ce(logits, labels, jnp.ones(2), 255, True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_fused_ce_matches_reference_weighted():
    logits, labels = _random_case(1)
    cw = jnp.asarray([1.0, 5.3])
    ref = weighted_cross_entropy_loss(logits, labels, cw)
    got = fused_binary_ce(logits, labels, cw, 255, True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_fused_ce_gradients_match():
    logits, labels = _random_case(2, shape=(1, 17, 21))
    cw = jnp.asarray([1.0, 2.0])

    ref_g = jax.grad(lambda l: weighted_cross_entropy_loss(l, labels, cw))(logits)
    got_g = jax.grad(lambda l: fused_binary_ce(l, labels, cw, 255, True))(logits)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=1e-6)


def test_fused_ce_all_ignored():
    logits = jnp.zeros((1, 8, 8, 2))
    labels = jnp.full((1, 8, 8), 255, jnp.int32)
    got = fused_binary_ce(logits, labels, jnp.ones(2), 255, True)
    assert float(got) == 0.0  # guarded denominator


def test_fused_ce_bf16_logits():
    logits, labels = _random_case(3)
    got = fused_binary_ce(logits.astype(jnp.bfloat16), labels, jnp.ones(2), 255, True)
    ref = cross_entropy_loss(logits.astype(jnp.bfloat16), labels)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)


def test_confusion_matrix_kernel():
    rng = np.random.default_rng(4)
    gts = rng.integers(0, 2, (3, 50, 61)).astype(np.int32)
    preds = rng.integers(0, 2, (3, 50, 61)).astype(np.int32)
    gts[0, 0, :10] = 255
    cm = binary_confusion_matrix(jnp.asarray(gts), jnp.asarray(preds), interpret=True)
    ref = fast_hist(gts.ravel(), preds.ravel(), 2)
    np.testing.assert_array_equal(np.asarray(cm), ref.astype(np.float32))


def test_confusion_matrix_kernel_empty():
    cm = binary_confusion_matrix(
        jnp.full((4, 4), 255, jnp.int32), jnp.zeros((4, 4), jnp.int32), interpret=True
    )
    assert float(cm.sum()) == 0.0


def test_sharded_fused_ce_matches_reference():
    """shard_map fused CE (interpret kernels) == jnp loss on an 8-device mesh."""
    from iswm_tpu.ops.pallas.fused_ce import make_sharded_fused_ce
    from iswm_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    logits, labels = _random_case(7, shape=(8, 17, 21))
    cw = jnp.asarray([1.0, 4.0])

    loss_fn = make_sharded_fused_ce(mesh, ignore_index=255, interpret=True)
    s_logits, s_labels = shard_batch(mesh, np.asarray(logits), np.asarray(labels))
    got = jax.jit(lambda lg, lb: loss_fn(lg, lb, cw))(s_logits, s_labels)
    ref = weighted_cross_entropy_loss(logits, labels, cw)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    # gradients through shard_map
    g_got = jax.jit(jax.grad(lambda lg: loss_fn(lg, s_labels, cw)))(s_logits)
    g_ref = jax.grad(lambda lg: weighted_cross_entropy_loss(lg, labels, cw))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_int8_matmul_matches_reference():
    from iswm_tpu.ops.pallas.int8_matmul import int8_matmul

    rng = np.random.default_rng(9)
    m, k, n = 100, 256, 128  # m deliberately unaligned
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    w_amax = np.abs(w).max(axis=0)
    w_scale = np.where(w_amax > 0, w_amax / 127.0, 1.0)
    w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
    x_scale = float(np.abs(np.asarray(x)).max() / 127.0)

    got = int8_matmul(x, jnp.asarray(w_q), jnp.asarray(w_scale), x_scale,
                      interpret=True)
    # reference: quantize x the same way, exact integer matmul, dequant
    x_q = np.clip(np.round(np.asarray(x) / x_scale), -127, 127)
    ref = (x_q @ w_q.astype(np.int64)) * x_scale * w_scale
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)
    # and close to the unquantized matmul (8-bit noise bound)
    dense = np.asarray(x) @ w
    err = np.abs(np.asarray(got) - dense).max() / np.abs(dense).max()
    assert err < 0.05


def test_quantized_conv1x1_matches_lax_conv():
    from iswm_tpu.ops.pallas.int8_matmul import quantized_conv1x1
    from iswm_tpu.infer.quantization import quantize_params_int8

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 256)), jnp.float32)
    params = {"proj": {"kernel": jnp.asarray(rng.normal(size=(1, 1, 256, 128)),
                                             jnp.float32)}}
    q, s = quantize_params_int8(params)
    x_scale = float(jnp.max(jnp.abs(x))) / 127.0
    got = quantized_conv1x1(x, q["proj"]["kernel"], s["proj"]["kernel"],
                            x_scale, interpret=True)
    dense = jax.lax.conv_general_dilated(
        x, params["proj"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    rel = float(jnp.max(jnp.abs(got - dense)) / jnp.max(jnp.abs(dense)))
    assert got.shape == (2, 8, 16, 128)
    assert rel < 0.05


def test_int8_matmul_prequant_matches():
    from iswm_tpu.ops.pallas.int8_matmul import int8_matmul_prequant

    rng = np.random.default_rng(12)
    m, k, n = 96, 128, 128
    x_q = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w_q = rng.integers(-127, 128, (k, n)).astype(np.int8)
    w_scale = rng.random(n).astype(np.float32) * 0.01 + 0.001
    x_scale = 0.02
    got = int8_matmul_prequant(
        jnp.asarray(x_q), jnp.asarray(w_q), jnp.asarray(w_scale), x_scale,
        interpret=True,
    )
    ref = (x_q.astype(np.int64) @ w_q.astype(np.int64)) * x_scale * w_scale
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)
