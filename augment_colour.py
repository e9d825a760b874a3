"""Reference-named shim (augment_colour.py): the photometric chain now
runs on-device inside the jitted batch program (pose_tpu.ops.colour, used
by pose_tpu.data.augment.process_color_batch). This module keeps the
reference's host API — numpy image in, numpy image out, implicit host
RNG — for external callers ported 1:1 (augment_colour.py:48-67)."""

import numpy as np


def random_color(image):
    """Brightness/contrast/hue/saturation jitter on one float [0,1] image,
    returned on the uint8 lattice like the reference's final truncation."""
    import jax
    import jax.numpy as jnp

    from pose_tpu.ops import colour

    key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31))
    return np.asarray(colour.random_color(
        jnp.asarray(np.asarray(image, np.float32)), key))
