"""Metric-formula tests with hand-computed goldens (the run_test.sh parity
surface: cam_mean / PCK / AUC / bucket elimination / OKS)."""

import numpy as np
import pytest

from pose_tpu import metrics


def test_statistics_bucket_elimination():
    """Progressive elimination (utils.py:197-224): each bucket counts only
    joints not captured by earlier buckets, normalized by the ORIGINAL
    count."""
    thresh = dict(solid=50.0, close=100.0, rough=150.0)
    basic = np.array([10.0, 60.0, 120.0, 200.0, 200.0])
    # tangential distance decides 'depth' among the close-misses
    tangent = np.array([999.0, 999.0, 90.0, 999.0, 999.0])
    # flipped distance decides 'switch' among the remaining
    flip = np.array([999.0, 999.0, 999.0, 100.0, 999.0])

    stats = metrics.statistics(basic.copy(), flip.copy(), tangent.copy(),
                               thresh)
    assert stats['solid'] == pytest.approx(1 / 5)   # 10 <= 50
    assert stats['close'] == pytest.approx(1 / 5)   # 60 <= 100
    assert stats['depth'] == pytest.approx(1 / 5)   # tangent 90 <= 100
    assert stats['jitter'] == pytest.approx(0.0)    # nothing left <= 150
    assert stats['switch'] == pytest.approx(1 / 5)  # flip 100 <= 150
    assert stats['fail'] == pytest.approx(1 / 5)    # the last one


def test_analyze_known_distances():
    thresh = dict(solid=50.0, close=100.0, rough=150.0)
    true = np.zeros((1, 4, 3))
    spec = np.zeros((1, 4, 3))
    spec[0, :, 0] = [30.0, 120.0, 160.0, 400.0]
    valid = np.ones((1, 4), bool)
    mirror = np.arange(4)

    stats = metrics.analyze(spec, true, valid, mirror, thresh)
    assert stats['cam_mean'] == pytest.approx(177.5)
    assert stats['score_pck'] == pytest.approx(2 / 4)   # <= 150
    expected_auc = np.mean(np.maximum(0, 1 - spec[0, :, 0] / 150.0))
    assert stats['score_auc'] == pytest.approx(expected_auc)
    assert stats['batch_size'] == 4


def test_analyze_respects_valid_mask():
    thresh = dict(solid=50.0, close=100.0, rough=150.0)
    true = np.zeros((1, 3, 3))
    spec = np.zeros((1, 3, 3))
    spec[0, :, 0] = [10.0, 1000.0, 20.0]
    valid = np.array([[True, False, True]])
    stats = metrics.analyze(spec, true, valid, np.arange(3), thresh)
    assert stats['cam_mean'] == pytest.approx(15.0)
    assert stats['batch_size'] == 2


def test_parse_epoch_batch_weighting():
    a = dict(solid=1.0, close=0.0, jitter=0.0, depth=0.0, switch=0.0,
             fail=0.0, score_pck=1.0, score_auc=1.0, cam_mean=10.0,
             batch_size=10)
    b = dict(solid=0.0, close=0.0, jitter=0.0, depth=0.0, switch=0.0,
             fail=1.0, score_pck=0.0, score_auc=0.0, cam_mean=40.0,
             batch_size=30)
    out = metrics.parse_epoch([a, b])
    assert out['cam_mean'] == pytest.approx(32.5)       # (10*10+40*30)/40
    assert out['score_pck'] == pytest.approx(0.25)
    assert out['solid'] == pytest.approx(0.25)


def test_oks_reference_formula():
    """The reference's OKS uses the *distance* (not squared) in the exponent
    (mat_utils.py:100) — replicated for parity."""
    side_in = 100.0
    true = np.zeros((1, 2, 2))
    true[0, 1] = [50.0, 0.0]                 # scale = 50
    spec = true.copy()
    spec[0, 0, 0] += 3.0                     # 3 px error on joint 0
    valid = np.ones((1, 2), bool)
    stats = metrics.analyze_mat(spec, true, valid, side_in)

    scale = 50.0
    denom = 2 * (scale / side_in) ** 2
    expected = (np.exp(-3.0 / denom) + 1.0) / 2
    assert stats['score_oks'] == pytest.approx(expected, rel=1e-6)
    assert stats['mat_mean'] == pytest.approx(1.5)


def test_analyze_mat_all_invalid_row_is_excluded():
    """A fully-occluded instance (valid_mask row all False) must not poison
    score_oks with NaN (0/0 + all-NaN nanmax in coord_to_scale): the row is
    excluded; an all-invalid batch returns zeros instead of NaN."""
    side_in = 100.0
    true = np.zeros((2, 2, 2))
    true[:, 1] = [50.0, 0.0]
    spec = true.copy()
    valid = np.ones((2, 2), bool)
    valid[1] = False                          # row 1 fully invalid
    stats = metrics.analyze_mat(spec, true, valid, side_in)
    assert np.isfinite(stats['score_oks'])
    # exact-match on the surviving row -> oks 1.0
    assert stats['score_oks'] == pytest.approx(1.0)
    assert stats['mat_mean'] == pytest.approx(0.0)
    assert stats['batch_size'] == 2

    none = metrics.analyze_mat(spec, true, np.zeros((2, 2), bool), side_in)
    assert none['score_oks'] == 0.0 and none['mat_mean'] == 0.0
