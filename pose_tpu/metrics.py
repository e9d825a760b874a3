"""Pose metrics, matching the reference's evaluation output exactly.

3D: MPJPE (`cam_mean`), PCK/AUC at thresh['rough'], and the bucketed
solid/close/depth/jitter/switch/fail rates (reference analogue:
utils.py:197-276). The reference assigns buckets by *progressively
eliminating* joints; here the same assignment is computed in one vectorized
pass — each joint lands in the first bucket whose condition it satisfies, in
priority order — which is equivalent and loop-free.

2D: mean pixel error and the OKS score (mat_utils.py:58-117). The reference's
OKS uses the *distance* (not squared distance) in the exponent
(mat_utils.py:100); that formula is kept for metric parity.

These run on host numpy over per-batch predictions (small arrays, off the
step critical path).
"""

import numpy as np

BUCKET_KEYS = ('solid', 'close', 'depth', 'jitter', 'switch', 'fail')


def statistics(basic, flip, tangent, thresh):
    """Fraction of joints per error bucket.

    Bucket priority (first match wins): solid (basic err <= thresh.solid),
    close (<= thresh.close), depth (tangential err <= thresh.close),
    jitter (basic <= thresh.rough), switch (mirrored err <= thresh.rough),
    fail (rest).
    """
    conditions = np.stack([
        basic <= thresh['solid'],
        basic <= thresh['close'],
        tangent <= thresh['close'],
        basic <= thresh['rough'],
        flip <= thresh['rough'],
        np.ones_like(basic, dtype=bool),
    ])
    bucket = np.argmax(conditions, axis=0)
    counts = np.bincount(bucket, minlength=len(BUCKET_KEYS))
    return {key: counts[i] / basic.size for i, key in enumerate(BUCKET_KEYS)}


def analyze(spec_cam, true_cam, valid_mask, mirror, thresh):
    """Per-batch 3D statistics.

    Args:
        spec_cam, true_cam: (B, J, 3); valid_mask: (B, J) bool;
        mirror: (J,) mirror-joint index array; thresh: dict solid/close/rough.
    """
    err = np.linalg.norm(spec_cam - true_cam, axis=-1)[valid_mask]
    err_mirrored = np.linalg.norm(
        spec_cam - true_cam[:, mirror], axis=-1)[valid_mask]
    err_tangential = np.linalg.norm(
        (spec_cam - true_cam)[..., :2], axis=-1)[valid_mask]

    normalized = err / thresh['rough']
    stats = statistics(err, err_mirrored, err_tangential, thresh)
    stats.update(batch_size=err.size,
                 cam_mean=np.mean(err),
                 score_pck=np.mean(normalized <= 1.0),
                 score_auc=np.mean(np.clip(1.0 - normalized, 0.0, None)))
    return stats


def _weighted_epoch_mean(batches, keys):
    """Batch-size-weighted average of per-batch stat dicts."""
    sizes = np.array([b['batch_size'] for b in batches], np.float64)
    total = sizes.sum()
    return {key: float(np.dot(sizes, [b[key] for b in batches]) / total)
            for key in keys}


def parse_epoch(stats):
    keys = BUCKET_KEYS + ('score_pck', 'score_auc', 'cam_mean')
    return _weighted_epoch_mean(stats, keys)


def coord_to_scale(true_mat, valid):
    """Per-instance scale: the larger of the GT 2D x/y extents over the valid
    joints (mat_utils.py:58-79)."""
    masked = np.where(valid[..., None], true_mat, np.nan)
    extent = np.nanmax(masked, axis=-2) - np.nanmin(masked, axis=-2)
    return np.max(extent, axis=-1)


def analyze_mat(spec_mat, true_mat, valid_mask, side_in):
    """Per-batch 2D statistics (mat_utils.py:82-108).

    Protective divergence: an instance whose valid_mask row is all-False
    (fully occluded/truncated) is EXCLUDED from score_oks instead of
    poisoning the epoch metric — the straight formula gives NaN (0/0 + an
    all-NaN nanmax in coord_to_scale; the reference crashes on np.amin of
    an empty slice there). Same spirit as the masked_mean_loss guard."""
    dist = np.linalg.norm(spec_mat - true_mat, axis=-1)
    has_valid = valid_mask.any(axis=-1)
    if not has_valid.any():
        return dict(mat_mean=0.0, score_oks=0.0,
                    batch_size=spec_mat.shape[0])
    scales = coord_to_scale(true_mat[has_valid], valid_mask[has_valid])
    oks = np.exp(-dist[has_valid]
                 / (2 * (scales / side_in) ** 2)[..., None])
    oks = ((oks * valid_mask[has_valid]).sum(axis=-1)
           / valid_mask[has_valid].sum(axis=-1))
    return dict(mat_mean=np.mean(dist[valid_mask]),
                score_oks=np.mean(oks),
                batch_size=spec_mat.shape[0])


def parse_epoch_mat(scores):
    return _weighted_epoch_mean(scores, ('score_oks', 'mat_mean'))
