"""Pose metrics, matching the reference's evaluation output exactly.

3D: utils.analyze/statistics/parse_epoch (utils.py:197-276) — MPJPE
(`cam_mean`), PCK/AUC at thresh['rough'], and the bucketed
solid/close/depth/jitter/switch/fail progressive-elimination rates.

2D: mat_utils.analyze/coord_to_scale/parse_epoch (mat_utils.py:58-117) —
mean pixel error and the OKS score. Note: the reference's OKS uses the
*distance* (not squared distance) in the exponent (mat_utils.py:100); we
replicate that formula for metric parity.

These run on host numpy over per-batch predictions (small arrays, off the
step critical path).
"""

import numpy as np


def statistics(basic, flip, tangent, thresh):
    dist = dict(basic=basic, flip=flip, tangent=tangent)

    def count_and_eliminate(condition):
        remains = np.nonzero(np.logical_not(condition))
        dist['basic'] = dist['basic'][remains]
        dist['flip'] = dist['flip'][remains]
        dist['tangent'] = dist['tangent'][remains]
        return np.count_nonzero(condition)

    count = float(dist['basic'].size)
    keys = ('solid', 'close', 'depth', 'jitter', 'switch', 'fail')

    solid = count_and_eliminate(dist['basic'] <= thresh['solid']) / count
    close = count_and_eliminate(dist['basic'] <= thresh['close']) / count
    depth = count_and_eliminate(dist['tangent'] <= thresh['close']) / count
    jitter = count_and_eliminate(dist['basic'] <= thresh['rough']) / count
    switch = count_and_eliminate(dist['flip'] <= thresh['rough']) / count

    return dict(zip(keys, (solid, close, depth, jitter, switch,
                           dist['basic'].size / count)))


def analyze(spec_cam, true_cam, valid_mask, mirror, thresh):
    """Per-batch 3D statistics (utils.py:237-276).

    Args:
        spec_cam, true_cam: (B, J, 3); valid_mask: (B, J) bool;
        mirror: (J,) mirror-joint index array; thresh: dict solid/close/rough.
    """
    valid = valid_mask.flatten()

    dist = np.linalg.norm(spec_cam - true_cam, axis=-1).flatten()[valid]
    dist_flip = np.linalg.norm(
        spec_cam - true_cam[:, mirror], axis=-1).flatten()[valid]
    dist_tangent = np.linalg.norm(
        spec_cam[:, :, :2] - true_cam[:, :, :2], axis=-1).flatten()[valid]

    cam_mean = np.mean(dist)
    score_pck = np.mean(dist / thresh['rough'] <= 1.0)
    score_auc = np.mean(np.maximum(0, 1 - dist / thresh['rough']))

    stats = statistics(dist, dist_flip, dist_tangent, thresh)
    stats.update(dict(batch_size=dist.shape[0], score_pck=score_pck,
                      score_auc=score_auc, cam_mean=cam_mean))
    return stats


def parse_epoch(stats):
    """Batch-size-weighted averaging of per-batch stats (utils.py:227-234)."""
    keys = ('solid', 'close', 'jitter', 'depth', 'switch', 'fail')
    keys += ('score_pck', 'score_auc', 'cam_mean', 'batch_size')
    values = np.array([[patch[key] for patch in stats] for key in keys])
    return dict(zip(keys[:-1],
                    np.sum(values[-1] * values[:-1], axis=1) / np.sum(values[-1])))


def coord_to_scale(true_mat, valid):
    """Per-instance scale from the GT 2D extent (mat_utils.py:58-79)."""
    scales = []
    for _true_mat, _valid in zip(true_mat, valid):
        _true_mat = _true_mat[_valid]
        x_min = np.amin(_true_mat[:, 0])
        x_max = np.amax(_true_mat[:, 0])
        y_min = np.amin(_true_mat[:, 1])
        y_max = np.amax(_true_mat[:, 1])
        scales.append(np.maximum(x_max - x_min, y_max - y_min))
    return np.array(scales)


def analyze_mat(spec_mat, true_mat, valid_mask, side_in):
    """Per-batch 2D statistics (mat_utils.py:82-108)."""
    dist = np.linalg.norm(spec_mat - true_mat, axis=-1)
    mat_mean = np.mean(dist[valid_mask])
    scales = coord_to_scale(true_mat, valid_mask)
    oks = np.exp(-dist / np.expand_dims(2 * (scales / side_in) ** 2, axis=-1))
    oks = np.sum(oks * valid_mask, axis=-1) / np.sum(valid_mask, axis=-1)
    return dict(mat_mean=mat_mean, score_oks=np.mean(oks),
                batch_size=spec_mat.shape[0])


def parse_epoch_mat(scores):
    """(mat_utils.py:111-117)"""
    keys = ('score_oks', 'mat_mean', 'batch_size')
    values = np.array([[patch[key] for patch in scores] for key in keys])
    return dict(zip(keys[:-1],
                    np.sum(values[-1] * values[:-1], axis=1) / np.sum(values[-1])))
