"""Multi-person track-ID assignment over ordered frame records.

Beyond-reference serving capability (the reference's only person
association is the offline Hungarian assignment of its dataset builders,
filter_ntu_samples.py:34-88 / depth_groups.py YOLO matching): `predict.py
-track_ids` threads stable identities through a multi-person video/image
stream so downstream consumers get per-person trajectories instead of
per-frame box indices.

Association is frame-to-frame minimum-cost matching (Hungarian when scipy
is available, greedy otherwise) with gating:

  * 3D centroid distance (mm) between `absolute_cam` skeletons when both
    sides carry them (joint_space models), gated at `gate_mm`;
  * otherwise bbox-center distance in pixels, gated at `gate_px` times
    the larger box side.

Unmatched detections open new tracks; unmatched tracks stay matchable for
`ttl` further frames (short occlusions / missed boxes), then retire.
"""

import numpy as np

_BIG = 1e12


def _center(bbox):
    b = np.asarray(bbox, np.float64)
    return b[:2] + b[2:] / 2


def _detection(rec):
    root = None
    if rec.get('absolute_cam'):
        root = np.mean(np.asarray(rec['absolute_cam'], np.float64), axis=0)
    return dict(rec=rec, bbox=np.asarray(rec['bbox'], np.float64), root=root)


def _cost(track, det, gate_px, gate_mm):
    if track['root'] is not None and det['root'] is not None:
        d = float(np.linalg.norm(track['root'] - det['root']))
        return d if d <= gate_mm else _BIG
    d = float(np.linalg.norm(_center(track['bbox']) - _center(det['bbox'])))
    scale = max(track['bbox'][2], track['bbox'][3],
                det['bbox'][2], det['bbox'][3])
    return d if d <= gate_px * scale else _BIG


def _match(cost):
    """Minimum-cost assignment over a (T, D) matrix; pairs with cost >=
    _BIG are never matched. Hungarian via scipy when available; greedy
    min-cost otherwise (identical on the well-separated costs tracking
    produces — ambiguous crossings differ only inside the gate)."""
    pairs = []
    try:
        from scipy.optimize import linear_sum_assignment
    except ImportError:
        linear_sum_assignment = None
    if linear_sum_assignment is not None:
        rows, cols = linear_sum_assignment(cost)
        pairs = [(r, c) for r, c in zip(rows, cols) if cost[r, c] < _BIG]
    else:
        cost = cost.copy()
        while True:
            r, c = np.unravel_index(np.argmin(cost), cost.shape)
            if cost[r, c] >= _BIG:
                break
            pairs.append((int(r), int(c)))
            cost[r, :] = _BIG
            cost[:, c] = _BIG
    return pairs


def assign_track_ids(records, gate_px=1.0, gate_mm=500.0, ttl=5):
    """Add a `track_id` field to every record, in place.

    `records` is the CLI's output list: dicts with `key` (frame), `bbox`
    and optionally `absolute_cam`, ordered by frame (all persons of a
    frame consecutive — the order `predict.py`'s stream produces).
    Returns the records for chaining.
    """
    tracks = []            # active: {'id', 'bbox', 'root', 'age'}
    next_id = 0

    # group consecutive records by frame key
    frames, cur_key = [], object()
    for rec in records:
        if rec['key'] != cur_key:
            cur_key = rec['key']
            frames.append([])
        frames[-1].append(rec)

    for frame in frames:
        dets = [_detection(rec) for rec in frame]
        if tracks and dets:
            cost = np.full((len(tracks), len(dets)), _BIG)
            for i, track in enumerate(tracks):
                for j, det in enumerate(dets):
                    cost[i, j] = _cost(track, det, gate_px, gate_mm)
            pairs = _match(cost)
        else:
            pairs = []

        matched_tracks, matched_dets = set(), set()
        for r, c in pairs:
            matched_tracks.add(r)
            matched_dets.add(c)
            tracks[r].update(bbox=dets[c]['bbox'], root=dets[c]['root'],
                             age=0)
            dets[c]['rec']['track_id'] = tracks[r]['id']
        for i, track in enumerate(tracks):
            if i not in matched_tracks:
                track['age'] += 1
        for j, det in enumerate(dets):
            if j not in matched_dets:
                det['rec']['track_id'] = next_id
                tracks.append(dict(id=next_id, bbox=det['bbox'],
                                   root=det['root'], age=0))
                next_id += 1
        tracks = [t for t in tracks if t['age'] <= ttl]
    return records
