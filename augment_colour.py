"""Reference-named shim (augment_colour.py): the photometric chain now
runs on-device inside the jitted batch program (pose_tpu.ops.colour, used
by pose_tpu.data.augment.process_color_batch). This module keeps the
reference's host API — numpy image in, numpy image out, implicit host
RNG — for external callers ported 1:1 (augment_colour.py:48-67)."""

import numpy as np


def random_color(image):
    """Brightness/contrast/hue/saturation jitter on one 3-channel RGB image
    in [0, 256) — the reference's contract (augment_colour.py:48-58) —
    returning uint8 [0, 255] like its final `(dest * 255).astype(uint8)`.
    (The on-device chain works in [0,1]; this shim owns the scaling so a
    1:1-ported caller's uint8 image is not silently clipped to white.)"""
    import jax
    import jax.numpy as jnp

    from pose_tpu.ops import colour

    key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))
    out = colour.random_color(
        jnp.asarray(np.asarray(image, np.float32) / 255.0), key)
    # the device chain already floor-quantizes to the k/255 lattice, so
    # nearest-int recovers the reference's truncation result exactly
    return np.rint(np.asarray(out) * 255.0).astype(np.uint8)
