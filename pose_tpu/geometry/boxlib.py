"""Bounding-box math on [x, y, width, height] arrays.

Covers the reference's boxlib.py operations, re-built batched: every function
broadcasts over leading dimensions (a box is the trailing axis of length 4),
so the loader can process whole batches of boxes in one call. Scalar usage
(`expand([1, 2, 3, 4], 1.5)`) behaves exactly like the reference.
"""

import numpy as np


def _f(box):
    return np.asarray(box, np.float64)


def center(box):
    box = _f(box)
    return box[..., :2] + box[..., 2:4] / 2


def _from_center(center_xy, size_wh):
    return np.concatenate([center_xy - size_wh / 2, size_wh], axis=-1)


def expand(bbox, expansion_factor=1, expansion_abs=0):
    """Grow about the center by the larger of a relative factor and an
    absolute margin."""
    bbox = _f(bbox)
    grown = np.maximum(bbox[..., 2:4] * expansion_factor,
                       bbox[..., 2:4] + expansion_abs)
    return _from_center(center(bbox), grown)


def expand_to_square(box):
    box = _f(box)
    side = np.max(box[..., 2:4], axis=-1, keepdims=True)
    return _from_center(center(box), np.broadcast_to(side, box[..., 2:4].shape))


def crop_to_square(box):
    box = _f(box)
    side = np.min(box[..., 2:4], axis=-1, keepdims=True)
    return _from_center(center(box), np.broadcast_to(side, box[..., 2:4].shape))


def is_within_box(box, point):
    box = _f(box)
    point = np.asarray(point, np.float64)
    below = np.all(box[..., :2] <= point, axis=-1)
    above = np.all(point < box[..., :2] + box[..., 2:4], axis=-1)
    return below & above


def corners(box):
    """(..., 4, 2) corner coordinates, clockwise from the top-left."""
    box = _f(box)
    x1y1 = box[..., :2]
    x2y2 = box[..., :2] + box[..., 2:4]
    x2y1 = np.stack([x2y2[..., 0], x1y1[..., 1]], axis=-1)
    x1y2 = np.stack([x1y1[..., 0], x2y2[..., 1]], axis=-1)
    return np.stack([x1y1, x2y1, x2y2, x1y2], axis=-2)


def intersect(box, other_box):
    box, other_box = _f(box), _f(other_box)
    lo = np.maximum(box[..., :2], other_box[..., :2])
    hi = np.minimum(box[..., :2] + box[..., 2:4],
                    other_box[..., :2] + other_box[..., 2:4])
    return np.concatenate([lo, np.maximum(hi - lo, 0)], axis=-1)


def intersect_vertical(box, other_box):
    box, other_box = _f(box), _f(other_box)
    top = np.maximum(box[..., 1], other_box[..., 1])
    bottom = np.minimum(box[..., 1] + box[..., 3],
                        other_box[..., 1] + other_box[..., 3])
    return np.stack([box[..., 0], top, box[..., 2], bottom - top], axis=-1)


def union(box, other_box):
    box, other_box = _f(box), _f(other_box)
    lo = np.minimum(box[..., :2], other_box[..., :2])
    hi = np.maximum(box[..., :2] + box[..., 2:4],
                    other_box[..., :2] + other_box[..., 2:4])
    return np.concatenate([lo, hi - lo], axis=-1)


def area(box):
    box = _f(box)
    return box[..., 2] * box[..., 3]


def iou(box1, box2):
    inter = area(intersect(box1, box2))
    return inter / (area(box1) + area(box2) - inter)


def giou(box1, box2):
    """Generalized IoU: IoU plus the union/enclosing-box ratio minus one."""
    inter = area(intersect(box1, box2))
    uni = area(box1) + area(box2) - inter
    return inter / uni + uni / area(union(box1, box2)) - 1


def shift(box, delta):
    box = _f(box)
    return np.concatenate([box[..., :2] + delta, box[..., 2:4]], axis=-1)


def bb_of_points(points):
    """Tight box around (..., N, 2) points, NaNs ignored."""
    points = np.asarray(points, np.float64)
    lo = np.nanmin(points, axis=-2)
    hi = np.nanmax(points, axis=-2)
    return np.concatenate([lo, hi - lo], axis=-1)


def full_box(imshape=None, imsize=None):
    assert imshape is not None or imsize is not None
    if imshape is None:
        imshape = (imsize[1], imsize[0])
    return np.asarray([0, 0, imshape[1], imshape[0]])


def bb_of_mask(mask):
    """Tight box around the nonzero region of a 2D mask; zeros -> zero box."""
    cols = np.flatnonzero(np.any(mask, axis=0))
    rows = np.flatnonzero(np.any(mask, axis=1))
    if cols.size == 0 or rows.size == 0:
        return np.array([0, 0, 0, 0])
    return np.array([cols[0], rows[0], cols[-1] - cols[0] + 1,
                     rows[-1] - rows[0] + 1])
