"""Golden parity: our metrics engine vs the reference implementation.

Runs the reference's own evaluators (imported from /root/reference, which
needs cv2/scipy/torch) side by side with ours on randomized and structured
masks and asserts numeric agreement.  Skipped when the reference tree or
its dependencies are unavailable.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


def _load_reference_metrics():
    if not REF.exists():
        pytest.skip("reference tree not available")
    pytest.importorskip("cv2")
    pytest.importorskip("torch")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import metrics as ref_metrics  # noqa: F401

    return ref_metrics


@pytest.fixture(scope="module")
def refm():
    return _load_reference_metrics()


def _random_masks(rng, n=6, shape=(64, 80)):
    """Mix of empty / blobby / speckled masks."""
    out = []
    for i in range(n):
        m = np.zeros(shape, dtype=np.uint8)
        kind = i % 3
        if kind == 0:
            r, c = rng.integers(5, 30), rng.integers(5, 40)
            m[r : r + rng.integers(10, 30), c : c + rng.integers(8, 30)] = 1
        elif kind == 1:
            m[(rng.random(shape) > 0.93)] = 1
        # kind == 2: empty
        out.append(m)
    return out


def test_preprocess_mask_parity(refm, rng):
    from metrics.utils.mask_utils import MaskUtils as RefMaskUtils

    from iswm_tpu.metrics import preprocess_mask

    for m in _random_masks(rng, n=12):
        ours = preprocess_mask(m)
        theirs = RefMaskUtils.preprocess_mask(m.copy())
        np.testing.assert_allclose(
            np.asarray(ours, dtype=np.float64),
            np.asarray(theirs, dtype=np.float64),
            atol=1e-9,
            err_msg="preprocess_mask mismatch",
        )


def test_front_positions_parity(refm, rng):
    from metrics.utils.mask_utils import MaskUtils as RefMaskUtils

    from iswm_tpu.metrics import find_front_positions

    for m in _random_masks(rng, n=12):
        assert find_front_positions(m) == RefMaskUtils.find_front_positions(m.copy())


def test_stability_motion_parity(refm, rng):
    from metrics.utils.mask_utils import MaskUtils as RefMaskUtils

    from iswm_tpu.metrics import calculate_motion, calculate_stability

    masks = _random_masks(rng, n=8)
    for a, b in zip(masks, masks[1:]):
        assert calculate_stability(a, b) == pytest.approx(
            RefMaskUtils.calculate_stability(a.copy(), b.copy()), abs=1e-9
        )
        assert calculate_motion(a, b) == pytest.approx(
            RefMaskUtils.calculate_motion(a.copy(), b.copy()), abs=1e-9
        )


def test_front_tracking_parity(refm, rng):
    from metrics.front_tracking_metrics import (
        FrontTrackingMetrics as RefFrontTracking,
    )

    from iswm_tpu.metrics import FrontTrackingMetrics

    ours, theirs = FrontTrackingMetrics(), RefFrontTracking()
    masks = _random_masks(rng, n=10)
    for pred, gt in zip(masks, masks[1:]):
        e_ours = ours.update(pred, gt)
        e_theirs = theirs.update(pred.copy(), gt.copy())
        assert e_ours == pytest.approx(e_theirs, rel=1e-9, abs=1e-9)
    assert ours.get_mean_error() == pytest.approx(theirs.get_mean_error(), rel=1e-9)


def test_region_parity(refm, rng):
    from metrics.region_metrics import RegionMetrics as RefRegion

    from iswm_tpu.metrics import RegionMetrics

    ours, theirs = RegionMetrics(), RefRegion()
    masks = _random_masks(rng, n=10)
    for pred, gt in zip(masks, masks[1:]):
        m_ours = ours.update(pred, gt)
        m_theirs = theirs.update(pred.copy(), gt.copy())
        assert (m_ours is None) == (m_theirs is None)
        if m_ours is not None:
            assert m_ours["final_score"] == pytest.approx(
                m_theirs["final_score"], abs=1e-9
            )
            assert m_ours["num_regions"] == m_theirs["num_regions"]
    assert ours.get_mean_score() == pytest.approx(theirs.get_mean_score(), abs=1e-9)


def test_temporal_parity(refm, rng):
    from metrics.temporal_metrics import TemporalMetrics as RefTemporal

    from iswm_tpu.metrics import TemporalMetrics

    ours, theirs = TemporalMetrics(sequence_length=4), RefTemporal(sequence_length=4)
    masks = _random_masks(rng, n=12)
    for pred, gt in zip(masks, masks[1:]):
        ours.update(pred, gt)
        theirs.update(pred.copy(), gt.copy())
    assert ours.get_mean_score() == pytest.approx(theirs.get_mean_score(), abs=1e-9)
    d_ours = ours.get_detailed_statistics()
    d_theirs = theirs.get_detailed_statistics()
    for k in ("mean_transition", "mean_stability", "mean_motion", "mean_wave_segment"):
        assert d_ours[k] == pytest.approx(d_theirs[k], abs=1e-9), k


def test_stream_metrics_parity(refm, rng):
    from metrics.stream_metrics import StreamMetrics as RefStream

    from iswm_tpu.metrics import StreamMetrics

    ours = StreamMetrics(2, sequence_length=3)
    theirs = RefStream(2, sequence_length=3)
    masks = _random_masks(rng, n=9)
    for i in range(len(masks) - 3):
        window_p = np.stack(masks[i : i + 3])
        window_g = np.stack(masks[i + 1 : i + 4])
        ours.update(window_g, window_p, sequence_data=True)
        theirs.update(window_g.copy(), window_p.copy(), sequence_data=True)
    r_ours = ours.get_results()
    r_theirs = theirs.get_results()
    for k in (
        "MIoU",
        "Foreground IoU",
        "Foreground F1",
        "Temporal Consistency",
        "Front Tracking Error",
        "Region Continuity",
        "Precision",
        "Recall",
        "Best Score",
    ):
        assert r_ours[k] == pytest.approx(r_theirs[k], abs=1e-9), k
