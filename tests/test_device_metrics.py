"""On-device metric reductions vs the host oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from iswm_tpu.metrics import fast_hist, foreground_metrics
from iswm_tpu.metrics.device import (
    DeviceEvalAccumulator,
    confusion_matrix,
    foreground_metrics_from_cm,
    front_positions_batch,
    symmetric_front_error,
    wave_presence,
)


def test_confusion_matrix_matches_fast_hist():
    rng = np.random.default_rng(0)
    gts = rng.integers(0, 2, (4, 30, 40))
    preds = rng.integers(0, 2, (4, 30, 40))
    gts[0, 0] = 255
    cm = np.asarray(confusion_matrix(jnp.asarray(gts), jnp.asarray(preds), 2))
    ref = fast_hist(gts.ravel(), preds.ravel(), 2)
    np.testing.assert_array_equal(cm, ref.astype(np.float32))


def test_foreground_metrics_match_host():
    rng = np.random.default_rng(1)
    gts = rng.integers(0, 2, (2000,))
    preds = rng.integers(0, 2, (2000,))
    cm = fast_hist(gts, preds, 2)
    host = foreground_metrics(cm)
    dev = foreground_metrics_from_cm(jnp.asarray(cm, jnp.float32))
    assert float(dev["miou"]) == pytest.approx(host[0], abs=1e-6)
    assert float(dev["fiou"]) == pytest.approx(host[1], abs=1e-6)
    assert float(dev["f1"]) == pytest.approx(host[4], abs=1e-6)


def test_wave_presence_batch():
    masks = np.zeros((2, 100, 100), np.int32)
    masks[1, :5, :11] = 1  # 0.55% > 0.5%
    out = np.asarray(wave_presence(jnp.asarray(masks), 0.005))
    assert out.tolist() == [False, True]


def test_front_positions_batch():
    m = np.zeros((1, 6, 8), np.int32)
    m[0, 2, 3] = 1
    m[0, 4, 0] = 1
    cols, has = front_positions_batch(jnp.asarray(m))
    assert has[0].tolist() == [False, False, True, False, True, False]
    assert int(cols[0, 2]) == 3 and int(cols[0, 4]) == 0


def test_symmetric_front_error_cases():
    empty = jnp.zeros((50, 100), jnp.int32)
    wave = jnp.zeros((50, 100), jnp.int32).at[10:40, 30:60].set(1)
    tau = 10.0
    assert float(symmetric_front_error(empty, wave)) == pytest.approx(2 * tau)
    assert float(symmetric_front_error(wave, empty)) == pytest.approx(1.5 * tau)
    assert float(symmetric_front_error(empty, empty)) == 0.0
    assert float(symmetric_front_error(wave, wave)) == pytest.approx(0.0, abs=1e-5)
    shifted = jnp.zeros((50, 100), jnp.int32).at[10:40, 35:65].set(1)
    err = float(symmetric_front_error(shifted, wave))
    assert err == pytest.approx(5.0, abs=0.6)


def test_accumulator_stream():
    acc = DeviceEvalAccumulator(2)
    rng = np.random.default_rng(2)
    total = np.zeros((2, 2))
    for _ in range(3):
        g = rng.integers(0, 2, (10, 10))
        p = rng.integers(0, 2, (10, 10))
        acc.update(jnp.asarray(g), jnp.asarray(p))
        total += fast_hist(g.ravel(), p.ravel(), 2)
    np.testing.assert_array_equal(np.asarray(acc.cm), total.astype(np.float32))
    res = acc.results()
    assert 0 <= res["miou"] <= 1
    acc.reset()
    assert float(acc.cm.sum()) == 0
