"""Hand-computed unit tests for the metrics engine.

Every constant of the reference evaluators (SURVEY §2.4) is pinned here by
a tiny constructed case: presence threshold 0.005, multi-region weights
1-0.2(n-1) floor 0.4, FTE penalties {2tau miss, 1.5tau FA, 0 both-empty},
region min_area 50, fragmentation/similarity 0.7/0.3, temporal routing.
"""

import numpy as np
import pytest

from iswm_tpu.metrics import (
    FrontTrackingMetrics,
    RegionMetrics,
    StreamMetrics,
    TemporalMetrics,
    check_wave_presence,
    fast_hist,
    find_front_positions,
    foreground_metrics,
    preprocess_mask,
    weighted_score,
)
from iswm_tpu.metrics._morphology import (
    connected_components,
    dilate3x3,
    erode3x3,
    repair_small_gaps,
)


def _blob(h, w, r0, c0, r1, c1):
    m = np.zeros((h, w), dtype=np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


# ------------------------------------------------------------- morphology
def test_dilate_erode_roundtrip_on_big_block():
    m = _blob(32, 32, 8, 8, 24, 24)
    assert np.array_equal(erode3x3(dilate3x3(m)), m)  # closing is identity here


def test_erode_border_semantics_cv2():
    # cv2.erode pads with +inf: a foreground block touching the border keeps
    # its border pixels.
    m = np.ones((8, 8), dtype=np.uint8)
    assert np.array_equal(erode3x3(m), m)


def test_connected_components_8conn():
    m = np.zeros((10, 10), dtype=np.uint8)
    m[0, 0] = 1
    m[1, 1] = 1  # diagonal -> same component under 8-connectivity
    m[5:7, 5:7] = 1
    n, labels, areas = connected_components(m)
    assert n == 3  # background + 2 components
    assert sorted(areas.tolist()) == [2, 4]


def test_repair_small_gaps_bridges_gap():
    m = np.zeros((20, 20), dtype=np.uint8)
    m[10, 2:9] = 1
    m[10, 11:18] = 1  # 2px gap; dilate x3 bridges up to ~6px
    repaired = repair_small_gaps(m)
    assert repaired[10, 9] == 1 and repaired[10, 10] == 1


# ---------------------------------------------------------- preprocess_mask
def test_preprocess_removes_specks_keeps_largest():
    m = _blob(50, 50, 10, 10, 30, 30)
    m[40, 40] = 1  # single-pixel speck -> removed by OPEN
    out = preprocess_mask(m)
    assert out.dtype == np.uint8
    assert out[40, 40] == 0
    assert out[15, 15] == 1


def test_preprocess_multi_region_weighting():
    # Two valid regions (each >= 0.1% of 100x100 = 10px) -> largest kept,
    # scaled by 1 - 0.2*(2-1) = 0.8.
    m = np.zeros((100, 100), dtype=np.uint8)
    m[10:20, 10:20] = 1  # 100 px
    m[60:68, 60:68] = 1  # 64 px
    out = preprocess_mask(m)
    assert out.max() == pytest.approx(0.8)
    assert out[62, 62] == 0  # smaller region dropped
    assert out[15, 15] == pytest.approx(0.8)


def test_preprocess_weight_floor():
    # 5 valid regions -> weight max(0.4, 1-0.2*4) = 0.4
    m = np.zeros((200, 200), dtype=np.uint8)
    for i in range(5):
        m[10 + 30 * i : 20 + 30 * i, 10 : 10 + 20 - i] = 1
    out = preprocess_mask(m)
    assert out.max() == pytest.approx(0.4)


def test_preprocess_3d_takes_last_frame():
    stack = np.zeros((3, 30, 30), dtype=np.uint8)
    stack[-1, 5:15, 5:15] = 1
    out = preprocess_mask(stack)
    assert out.shape == (30, 30)
    assert out[10, 10] == 1


# ------------------------------------------------------------------ fronts
def test_front_positions_leftmost_per_row():
    m = _blob(20, 20, 5, 8, 15, 18)
    fronts = find_front_positions(m)
    assert fronts == [(r, 8) for r in range(5, 15)]


def test_front_positions_empty_for_weighted_mask():
    # Multi-region weighted mask has no pixels == 1 -> no fronts (reference
    # quirk, mask_utils.py:41-42 + 70).
    m = np.zeros((100, 100), dtype=np.uint8)
    m[10:20, 10:20] = 1
    m[60:70, 60:70] = 1
    assert find_front_positions(m) == []


# ---------------------------------------------------------------- presence
def test_wave_presence_threshold():
    m = np.zeros((100, 100), dtype=np.uint8)
    m[0:5, 0:11] = 1  # 55 px -> ratio 0.0055 > 0.005
    assert check_wave_presence(m, 0.005)
    m2 = np.zeros((100, 100), dtype=np.uint8)
    m2[0:4, 0:10] = 1  # 40 px -> 0.004 < 0.005
    assert not check_wave_presence(m2, 0.005)


# --------------------------------------------------------------------- FTE
def test_fte_special_cases():
    ft = FrontTrackingMetrics()
    empty = np.zeros((50, 100), dtype=np.uint8)
    wave = _blob(50, 100, 10, 30, 40, 60)
    tau = 100 * 0.1

    assert ft.calculate_error(empty, wave) == pytest.approx(2.0 * tau)  # miss
    assert ft.calculate_error(wave, empty) == pytest.approx(1.5 * tau)  # FA
    assert ft.calculate_error(empty, empty) == pytest.approx(0.0)


def test_fte_perfect_prediction_zero_error():
    ft = FrontTrackingMetrics()
    wave = _blob(50, 100, 10, 30, 40, 60)
    assert ft.calculate_error(wave, wave) == pytest.approx(0.0, abs=1e-6)


def test_fte_offset_prediction():
    ft = FrontTrackingMetrics()
    gt = _blob(64, 200, 10, 50, 50, 90)
    pred = _blob(64, 200, 10, 55, 50, 95)  # front shifted +5 px horizontally
    err = ft.calculate_error(pred, gt)
    # Every pred front point is 5px from its gt row-mate; full coverage.
    assert err == pytest.approx(5.0, abs=0.5)


def test_fte_mean_error_fallback():
    ft = FrontTrackingMetrics()
    ft.set_max_distance_threshold(100)
    assert ft.get_mean_error() == pytest.approx(20.0)  # 2*tau fallback


# ------------------------------------------------------------------ region
def test_region_skips_empty_frames():
    rm = RegionMetrics()
    empty = np.zeros((50, 50), dtype=np.uint8)
    wave = _blob(50, 50, 10, 10, 30, 30)
    assert rm.update(empty, wave) is None
    assert rm.update(wave, empty) is None
    assert rm.update(empty, empty) is None
    assert rm.get_mean_score() == 0.0
    stats = rm.get_statistics()
    assert stats["invalid_cases"] == 3 and stats["valid_ratio"] == 0.0


def test_region_perfect_single_region():
    rm = RegionMetrics()
    wave = _blob(64, 64, 10, 10, 40, 40)
    m = rm.update(wave, wave)
    # repair dilates/erodes -> net +1px border ring; similarity slightly < 1
    assert m["num_regions"] == 1
    assert m["fragmentation_score"] == pytest.approx(1.0)
    assert m["final_score"] > 0.9


def test_region_min_area_filter():
    rm = RegionMetrics()
    pred = np.zeros((100, 100), dtype=np.uint8)
    pred[10:12, 10:12] = 1  # 4 px -> below 50 even after repair (6x6=36)
    gt = _blob(100, 100, 10, 10, 30, 30)
    m = rm.update(pred, gt)
    assert m["num_regions"] == 0
    assert m["fragmentation_score"] == 0.0


def test_region_fragmentation_two_regions():
    # areas 300 and 100 -> ratios .75/.25, penalty = .25*2/2*0.5 = .125
    areas = np.array([300, 100])
    from iswm_tpu.metrics.region import _fragmentation_score

    assert _fragmentation_score(areas) == pytest.approx(0.75 - 0.125)


# ---------------------------------------------------------------- temporal
def _wave_frame(h=64, w=64, col=20):
    m = np.zeros((h, w), dtype=np.uint8)
    m[8:56, col : col + 12] = 1
    return m


def test_temporal_no_wave_window():
    tm = TemporalMetrics(sequence_length=3)
    empty = np.zeros((64, 64), dtype=np.uint8)
    for _ in range(3):
        score = tm.update(empty, empty)
    assert score == pytest.approx(1.0)  # no waves predicted, none real


def test_temporal_no_wave_gt_with_false_alarms():
    tm = TemporalMetrics(sequence_length=4)
    empty = np.zeros((64, 64), dtype=np.uint8)
    wave = _wave_frame()
    scores = []
    for i in range(4):
        pred = wave if i < 2 else empty  # 2/4 false alarms
        scores.append(tm.update(pred, empty))
    assert scores[-1] == pytest.approx(0.5)


def test_temporal_all_wave_identical_frames():
    tm = TemporalMetrics(sequence_length=3)
    wave = _wave_frame()
    for _ in range(3):
        score = tm.update(wave, wave)
    # stability = 1 (identical), motion = 1/(1+0) = 1 -> 0.5*1+0.5*1 = 1
    assert score == pytest.approx(1.0)


def test_temporal_transition_exact_match():
    tm = TemporalMetrics(sequence_length=4)
    empty = np.zeros((64, 64), dtype=np.uint8)
    wave = _wave_frame()
    seq = [empty, empty, wave, wave]  # one transition at index 1
    for f in seq:
        score = tm.update(f, f)
    # transition acc 1.0; wave segments: t=2 gives 0.5*(stab(wave,empty)=0 +
    # match(wave,wave)=1) = 0.5, t=3 gives 1.0 -> mean 0.75
    # total = 0.6*1.0 + 0.4*0.75 = 0.9
    assert score == pytest.approx(0.9)


def test_temporal_ring_buffer_slides():
    tm = TemporalMetrics(sequence_length=3)
    wave = _wave_frame()
    for i in range(5):
        tm.update(wave, wave)
    assert len(tm.temporal_scores) == 3  # windows end at frames 3,4,5


# ---------------------------------------------------- CM/foreground metrics
def test_fast_hist_and_foreground_metrics():
    gt = np.array([0, 0, 1, 1, 255])
    pred = np.array([0, 1, 1, 0, 1])
    hist = fast_hist(gt, pred, 2)
    # 255 rows are masked out (label >= n_classes)
    assert hist.tolist() == [[1, 1], [1, 1]]
    miou, fiou, p, r, f1 = foreground_metrics(hist)
    assert fiou == pytest.approx(1 / 3, abs=1e-5)
    assert p == pytest.approx(0.5, abs=1e-5)
    assert r == pytest.approx(0.5, abs=1e-5)
    assert miou == pytest.approx((1 / 3 + 1 / 3) / 2, abs=1e-5)


# ------------------------------------------------------------ weighted score
def test_weighted_score_formula():
    results = {
        "MIoU": 1.0,
        "Foreground IoU": 1.0,
        "Foreground F1": 1.0,
        "Front Tracking Error": 0.0,
        "Temporal Consistency": 1.0,
        "Region Continuity": 1.0,
    }
    assert weighted_score(results) == pytest.approx(1.0)
    results["Front Tracking Error"] = 5.0  # norm -> 0.5
    assert weighted_score(results) == pytest.approx(1.0 - 0.25 * 0.5)
    results["Front Tracking Error"] = 50.0  # clamps to 0
    assert weighted_score(results) == pytest.approx(0.75)


# ------------------------------------------------------------ StreamMetrics
def test_stream_metrics_sequence_update():
    sm = StreamMetrics(2, sequence_length=3)
    wave = _wave_frame()
    window_p = np.stack([wave] * 3)
    window_g = np.stack([wave] * 3)
    for _ in range(4):
        sm.update(window_g, window_p, sequence_data=True)
    res = sm.get_results()
    assert res["Foreground IoU"] == pytest.approx(1.0, abs=1e-4)
    assert res["Front Tracking Error"] == pytest.approx(0.0, abs=1e-4)
    assert res["Region Continuity"] > 0.9
    assert res["Temporal Consistency"] > 0.9  # windows complete after 3 updates
    assert res["Best Score"] > 0.9
    sm.reset()
    assert sm.confusion_matrix.sum() == 0
