"""Reference-named shim (augment_occluder.py): occluder pasting and random
erase run on-device in production (pose_tpu.ops.occluder — MXU sprite warp,
gather fallback). This module keeps the reference's host API (numpy in/out,
implicit host RNG, occluder_<i>.npy/mask_<i>.npy bank layout,
augment_occluder.py:7-105) for external callers."""

import os

import numpy as np


def fetch_occluders(occ_idx, occ_path):
    """(augment_occluder.py:58-65)"""
    occluder = np.load(os.path.join(occ_path, f'occluder_{occ_idx}.npy'))
    mask = np.load(os.path.join(occ_path, f'mask_{occ_idx}.npy'))
    return occluder, mask


def random_occlu(image, occ_count, occ_path):
    """Paste one randomly-scaled sprite at a uniform-random center
    (augment_occluder.py:68-81); sampling runs through the device op.
    Reference contract: RGB image in [0, 256), uint8 [0, 255] out (the
    device op works in [0,1]; the shim owns the scaling)."""
    import jax
    import jax.numpy as jnp

    from pose_tpu.ops import occluder as occ_ops

    sprites, alphas, shapes = occ_ops.load_occluder_bank(occ_path, occ_count)
    key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))
    out = occ_ops.random_occlu(
        jnp.asarray(np.asarray(image, np.float32) / 255.0), key,
        jnp.asarray(sprites), jnp.asarray(alphas), jnp.asarray(shapes))
    return np.clip(np.rint(np.asarray(out) * 255.0), 0, 255).astype(np.uint8)


def random_erase(image):
    """Fill a random rectangle (10-25% area, aspect 0.4-2.5) with a random
    colour (augment_occluder.py:84-105). Reference contract: [0, 256) in,
    uint8 out; returns a new array (the reference mutates in place; jnp
    arrays are immutable)."""
    import jax
    import jax.numpy as jnp

    from pose_tpu.ops import occluder as occ_ops

    key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))
    out = occ_ops.random_erase(
        jnp.asarray(np.asarray(image, np.float32) / 255.0), key)
    return np.clip(np.rint(np.asarray(out) * 255.0), 0, 255).astype(np.uint8)
