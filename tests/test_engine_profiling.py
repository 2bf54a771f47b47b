"""AOT engine, profiling, visualizer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iswm_tpu.infer.engine import Engine, build_engine, deserialize, serialize
from iswm_tpu.train.profiling import StepTimer, trace
from iswm_tpu.utils.visualizer import Visualizer


def _model_fn(x):
    return jnp.stack([x[..., 0], -x[..., 0]], axis=-1)


def test_build_engine_shape_specialized():
    eng = build_engine(_model_fn, (2, 16, 16, 3), jnp.float32)
    x = jnp.ones((2, 16, 16, 3))
    out = eng(x)
    assert out.shape == (2, 16, 16, 2)
    with pytest.raises(ValueError, match="engine built for"):
        eng(jnp.ones((1, 16, 16, 3)))


def test_engine_serialize_roundtrip():
    blob = serialize(_model_fn, (1, 8, 8, 3), jnp.float32)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = deserialize(blob)
    out = fn(jnp.ones((1, 8, 8, 3)))
    np.testing.assert_allclose(np.asarray(out)[..., 0], 1.0)


def test_step_timer_excludes_warmup():
    t = StepTimer(skip=1)
    import time

    for i in range(3):
        with t:
            time.sleep(0.01)
    assert 0.005 < t.mean_seconds < 0.1
    assert t.throughput(8) > 0


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path), enabled=True):
        jnp.zeros((4,)).block_until_ready()
    import os

    assert any(os.scandir(tmp_path)), "no trace output written"


def test_visualizer_panels(tmp_path):
    vis = Visualizer(str(tmp_path))
    img = np.zeros((16, 16, 3), np.uint8)
    p1 = vis.vis_scalar("loss curve", [3, 2, 1])
    p2 = vis.vis_image("scene", img)
    p3 = vis.vis_segmentation_panel(
        "panel", img, gt=img[..., 0], pred=img[..., 0], confidence=img[..., 0]
    )
    import os

    assert all(os.path.exists(p) for p in (p1, p2, p3))
