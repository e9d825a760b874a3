"""Compatibility shim exposing the reference mat_utils.py surface
(mat_utils.py:6-141) on top of pose_tpu."""

import numpy as np

from pose_tpu.metrics import (analyze_mat as analyze, coord_to_scale,
                              parse_epoch_mat as parse_epoch)


class Mapper:
    """Joint-name remapping between skeleton layouts (mat_utils.py:6-20).

    Expressed as a single dest-indexed gather table: entry j holds the
    source-joint index feeding destination joint j, or -1 when `match`
    leaves j unmapped (those rows stay zero).
    """

    def __init__(self, curr_info, dest_info, match):
        src_index = {name: i for i, name in enumerate(curr_info.short_names)}
        table = np.full(len(dest_info.short_names), -1, dtype=np.int64)
        for dest_pos, dest_name in enumerate(dest_info.short_names):
            for src_name, mapped in match.items():
                if mapped == dest_name:
                    table[dest_pos] = src_index[src_name]
        self.table = table
        # Retained attribute names for reference-API compatibility.
        self.len_dest = table.size
        self.slice_dest = np.flatnonzero(0 <= table).tolist()
        self.slice_curr = table[0 <= table].tolist()

    def map_coord(self, curr_coord):
        curr_coord = np.asarray(curr_coord)
        gathered = curr_coord[np.maximum(self.table, 0)]
        return np.where((0 <= self.table)[:, None], gathered, 0.0)


class MatSample:
    """(mat_utils.py:23-28)"""

    def __init__(self, image_path, image_coords, bbox):
        self.image_path = image_path
        self.image_coords = image_coords
        self.bbox = bbox


def to_heatmap(ausgabe, num_joints, height, width):
    """2D softmax (mat_utils.py:31-41); NHWC, with NCHW auto-transpose."""
    import jax.numpy as jnp
    from pose_tpu.ops.heatmap import to_heatmap2d

    arr = jnp.asarray(np.asarray(ausgabe))
    if arr.shape[1] == num_joints and arr.shape[-1] != num_joints:
        arr = jnp.transpose(arr, (0, 2, 3, 1))
    return to_heatmap2d(arr, num_joints)


def decode(heatmap, map_range):
    """(mat_utils.py:44-55)"""
    import jax.numpy as jnp
    from pose_tpu.ops.heatmap import decode2d
    return decode2d(jnp.asarray(np.asarray(heatmap)), map_range)


def rand_rotate(center, image, points, max_radian):
    """Rotate an image + points about a center by a random angle
    (mat_utils.py:120-140), cv2-free."""
    radian = np.random.uniform(-max_radian, max_radian)
    c = np.cos(radian)
    s = np.sin(radian)
    cx, cy = center.astype(float)
    # cv2.getRotationMatrix2D convention: positive angle is counter-clockwise
    matrix = np.array([[c, s, (1 - c) * cx - s * cy],
                       [-s, c, s * cx + (1 - c) * cy]])

    import jax.numpy as jnp
    from pose_tpu.ops.warp import bilinear_sample

    h, w = image.shape[:2]
    inv = np.linalg.inv(np.vstack([matrix, [0, 0, 1]]))
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    src = np.stack([xx, yy, np.ones_like(xx)], -1) @ inv.T.astype(np.float32)
    coords = src[..., :2]
    img = image[..., None] if image.ndim == 2 else image
    dest = np.asarray(bilinear_sample(jnp.asarray(img.astype(np.float32)),
                                      jnp.asarray(coords)))
    if image.ndim == 2:
        dest = dest[..., 0]
    if image.dtype == np.uint8:
        dest = np.clip(np.round(dest), 0, 255).astype(np.uint8)

    trans = np.hstack([points, np.ones((points.shape[0], 1))]) @ matrix.T
    return dest, trans
