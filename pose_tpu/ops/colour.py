"""On-device photometric augmentation.

Re-implements the reference's colour-jitter chain (augment_colour.py:48-67) as
pure jnp: brightness(±0.125) → contrast(0.8-1.25 about 0.5) → hue(±18° in HSV)
→ saturation(0.8-1.25), with the RGB↔HSV conversions fused into the jitted
pipeline instead of calling cv2.cvtColor per sample on the host. Randomness is
driven by explicit jax.random keys so a training step is reproducible.

The reference operates on float32 in [0,1] and finally truncates back to uint8
((dest*255).astype(np.uint8), augment_colour.py:67) before torchvision's
ToTensor divides by 255 again; `quantize_like_uint8` replicates that
truncation so activations match bit-for-bit.
"""

import jax
import jax.numpy as jnp


def _rgb_planes_to_hsv(r, g, b):
    """RGB [0,1] channel planes -> (h, s, v) planes, H in degrees [0, 360)
    (cv2 float-image convention used by augment_colour.py). Single source
    of the conversion math for the stacked entry points AND the training
    chain (_random_color_channels) — identical op sequence everywhere."""
    v = jnp.maximum(jnp.maximum(r, g), b)
    c_min = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - c_min
    safe_delta = jnp.where(delta == 0, 1.0, delta)

    h_r = 60.0 * (g - b) / safe_delta
    h_g = 120.0 + 60.0 * (b - r) / safe_delta
    h_b = 240.0 + 60.0 * (r - g) / safe_delta

    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(delta == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)

    s = jnp.where(v == 0, 0.0, delta / jnp.where(v == 0, 1.0, v))
    return h, s, v


def _hsv_planes_to_rgb(h, s, v):
    """HSV planes (H degrees, S,V in [0,1]) -> (r, g, b) planes."""
    h = h / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = jnp.mod(i.astype(jnp.int32), 6)

    sel = [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5]
    r = jnp.select(sel, [v, q, p, p, t, v])
    g = jnp.select(sel, [t, v, v, q, p, p])
    b = jnp.select(sel, [p, p, t, v, v, q])
    return r, g, b


def rgb_to_hsv(image):
    """RGB [0,1] -> HSV, stacked-channel convenience wrapper."""
    h, s, v = _rgb_planes_to_hsv(image[..., 0], image[..., 1],
                                 image[..., 2])
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(image):
    """HSV -> RGB [0,1], stacked-channel convenience wrapper."""
    r, g, b = _hsv_planes_to_rgb(image[..., 0], image[..., 1],
                                 image[..., 2])
    return jnp.stack([r, g, b], axis=-1)


def _random_color_channels(r, g, b, key):
    """augment_colour.random_color's math on three same-shape channel
    planes; layout-agnostic core shared by the NHWC and channel-planar
    entries (identical op sequence -> bit-identical results)."""
    k_bri, k_con, k_hue, k_sat = jax.random.split(key, 4)

    # brightness (augment_colour.py:6-12)
    bri = jax.random.uniform(k_bri, (), minval=-0.125, maxval=0.125)
    r, g, b = (jnp.clip(c + bri, 0, 1) for c in (r, g, b))

    # contrast (augment_colour.py:15-23)
    con = jax.random.uniform(k_con, (), minval=0.8, maxval=1.25)
    r, g, b = (jnp.clip((c - 0.5) * con + 0.5, 0, 1) for c in (r, g, b))

    # rgb->hsv (cv2 float convention)
    h, s, v = _rgb_planes_to_hsv(r, g, b)

    # hue (augment_colour.py:26-35)
    hue = h + jax.random.uniform(k_hue, (), minval=-18.0, maxval=18.0)
    hue = jnp.where(hue < 0, hue + 360.0, hue)
    hue = jnp.where(hue >= 360.0, hue - 360.0, hue)

    # saturation (augment_colour.py:38-45)
    sat = s * jax.random.uniform(k_sat, (), minval=0.8, maxval=1.25)
    sat = jnp.clip(sat, 0, 1)

    # hsv->rgb
    r, g, b = _hsv_planes_to_rgb(hue, sat, v)
    quant = lambda c: jnp.floor(jnp.clip(c, 0, 1) * 255.0) / 255.0
    return quant(r), quant(g), quant(b)


def random_color(image, key):
    """The full chain of augment_colour.random_color for one (H, W, 3) float
    image in [0,1]. Returns float in [0,1] quantized to the uint8 lattice."""
    r, g, b = _random_color_channels(image[..., 0], image[..., 1],
                                     image[..., 2], key)
    return jnp.stack([r, g, b], axis=-1)


def random_color_planar(image, key):
    """random_color on a channel-planar (3, H, W) image: every op runs on
    full contiguous (H, W) planes instead of a 3-wide minor dim (3 of 128
    lanes) — the layout the split warp's Pallas stage already produces."""
    r, g, b = _random_color_channels(image[0], image[1], image[2], key)
    return jnp.stack([r, g, b], axis=0)


def quantize_like_uint8(image):
    """(x*255).astype(uint8)/255 truncation of augment_colour.py:67."""
    return jnp.floor(jnp.clip(image, 0, 1) * 255.0) / 255.0


def random_color_batch(images, keys):
    """vmapped random_color over a batch: (B, H, W, 3), (B, 2)-keys."""
    return jax.vmap(random_color)(images, keys)


def random_color_batch_planar(images, keys):
    """vmapped random_color_planar over a batch: (B, 3, H, W)."""
    return jax.vmap(random_color_planar)(images, keys)


IMAGENET_MEAN = (0.485, 0.456, 0.406)   # datasets.py:53
IMAGENET_DEV = (0.229, 0.224, 0.225)    # datasets.py:54


def normalize_imagenet(image):
    """torchvision Normalize(mean, std) on [0,1] RGB (datasets.py:61-63)."""
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
    dev = jnp.asarray(IMAGENET_DEV, image.dtype)
    return (image - mean) / dev


def normalize_imagenet_planar(image):
    """normalize_imagenet for (..., 3, H, W) channel-planar layouts."""
    mean = jnp.asarray(IMAGENET_MEAN, image.dtype)[:, None, None]
    dev = jnp.asarray(IMAGENET_DEV, image.dtype)[:, None, None]
    return (image - mean) / dev
