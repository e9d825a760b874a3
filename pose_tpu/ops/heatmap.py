"""Volumetric / planar soft-argmax decoding and attention maps (jnp).

Re-implements utils.to_heatmap/decode (utils.py:154-194), mat_utils
counterparts (mat_utils.py:31-55) and get_attention (utils.py:14-42) as jitted
XLA ops. Feature maps are NHWC.
"""

import jax
import jax.numpy as jnp


def to_heatmap3d(feat, depth, num_joints):
    """Numerically-stable softmax over the (H, W, D) volume per joint.

    feat: (B, H, W, depth*num_joints) where the channel dim factorizes as
    (depth, joints) with depth outermost — matching the reference's
    view(-1, depth, num_joints, h, w) of its NCHW regressor output
    (utils.py:164).

    Returns (B, num_joints, H, W, depth).
    """
    b, h, w, _ = feat.shape
    vol = feat.reshape(b, h, w, depth, num_joints)
    vol = vol.transpose(0, 4, 1, 2, 3)                      # (B, J, H, W, D)
    flat = vol.reshape(b, num_joints, h * w * depth)
    flat = jax.nn.softmax(flat, axis=2)
    return flat.reshape(b, num_joints, h, w, depth)


def decode3d(heatmap, depth_range):
    """Per-axis expectation on the linspace(0, 2) grid scaled by depth_range
    (utils.py:178-194). heatmap: (B, J, H, W, D) -> (B, J, 3) in mm,
    ordered (x, y, z)."""
    heat_y = jnp.sum(heatmap, axis=(3, 4))                   # (B, J, H)
    heat_x = jnp.sum(heatmap, axis=(2, 4))                   # (B, J, W)
    heat_z = jnp.sum(heatmap, axis=(2, 3))                   # (B, J, D)

    grid_y = jnp.linspace(0.0, 2.0, heat_y.shape[-1])
    grid_x = jnp.linspace(0.0, 2.0, heat_x.shape[-1])
    grid_z = jnp.linspace(0.0, 2.0, heat_z.shape[-1])

    coord_y = jnp.sum(grid_y * heat_y, axis=2)
    coord_x = jnp.sum(grid_x * heat_x, axis=2)
    coord_z = jnp.sum(grid_z * heat_z, axis=2)

    return jnp.stack((coord_x, coord_y, coord_z), axis=2) * depth_range


def to_heatmap2d(feat, num_joints):
    """2D softmax per joint (mat_utils.py:31-41).

    feat: (B, H, W, num_joints) -> (B, num_joints, H, W)."""
    b, h, w, _ = feat.shape
    maps = feat.transpose(0, 3, 1, 2).reshape(b, num_joints, h * w)
    maps = jax.nn.softmax(maps, axis=2)
    return maps.reshape(b, num_joints, h, w)


def decode2d(heatmap, map_range):
    """Expectation on linspace(0, 1) scaled by map_range = side_in
    (mat_utils.py:44-55). heatmap: (B, J, H, W) -> (B, J, 2) pixels (x, y)."""
    heat_x = jnp.sum(heatmap, axis=2)                        # (B, J, W)
    heat_y = jnp.sum(heatmap, axis=3)                        # (B, J, H)

    grid_x = jnp.linspace(0.0, 1.0, heat_x.shape[-1])
    grid_y = jnp.linspace(0.0, 1.0, heat_y.shape[-1])

    coord_x = jnp.sum(grid_x * heat_x, axis=-1)
    coord_y = jnp.sum(grid_y * heat_y, axis=-1)

    return jnp.stack((coord_x, coord_y), axis=2) * map_range


def get_attention(side_in, stride, image_coords, attention):
    """Distillation attention map: normalized sum of per-joint radial
    Gaussians (sigma^2 = 5) on the output-stride grid (utils.py:14-42).

    image_coords: (num_joints, 2) pixel coords in the side_in crop.
    Returns (1, side_out, side_out) — the reference's [None] leading dim.
    """
    side_out = (side_in - 1) // stride + 1
    if not attention:
        return jnp.ones((1, side_out, side_out))

    cy = jax.lax.broadcasted_iota(jnp.float32, (side_out, side_out), 0)
    cx = jax.lax.broadcasted_iota(jnp.float32, (side_out, side_out), 1)
    # reference meshgrid: cx varies along axis 1, cy along axis 0
    scale = side_in / side_out
    dist_x = cx[..., None] - image_coords[:, 0] / scale
    dist_y = cy[..., None] - image_coords[:, 1] / scale
    dist = dist_x ** 2 + dist_y ** 2
    radial = jnp.exp(-dist / 5.0).sum(axis=-1)
    radial = radial / jnp.max(radial)
    return radial[None, :, :]
