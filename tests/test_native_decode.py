"""Native C++ decode pools vs the Python (PIL) fallback — including the
oversized-source downscale paths, which must agree bit-for-bit so results
do not depend on which decode path ran (uint8 colour: integer box average;
float depth: nearest subsample; both report the realized prescale)."""

import os

import numpy as np
import pytest

from PIL import Image

from pose_tpu.data import crop
from pose_tpu.data.loader import imread


def _native_or_skip(cls, canvas):
    try:
        from pose_tpu.data import native_loader
        return getattr(native_loader, cls)(canvas, num_threads=2)
    except Exception as e:
        pytest.skip(f'native pool unavailable: {e!r}')


def _python_decode(paths, canvas, grayscale):
    canvases, extents, prescales = [], [], []
    for path in paths:
        image = imread(path)
        if grayscale:
            if image.ndim == 3:
                image = image[..., 0]
            image = image[..., None].astype(np.float32)
        cv, ext, pre = crop.pad_to_canvas(image, canvas)
        canvases.append(cv)
        extents.append(ext)
        prescales.append(pre)
    return (np.stack(canvases), np.stack(extents),
            np.asarray(prescales, np.float32))


class TestOversizedJpeg:
    def test_native_matches_python_box_average(self, tmp_path):
        canvas = (256, 256)
        pool = _native_or_skip('NativeImageLoader', canvas)
        rng = np.random.RandomState(0)
        paths = []
        for i, (h, w) in enumerate([(300, 420), (512, 380), (200, 200)]):
            # smooth content: JPEG is lossy but deterministic, and both
            # paths decode through libjpeg, so canvases compare exactly
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(yy * 255 // h), (xx * 255 // w),
                            ((yy + xx) * 255 // (h + w))],
                           -1).astype(np.uint8)
            img += rng.randint(0, 3, img.shape, dtype=np.uint8)
            p = str(tmp_path / f'c{i}.jpg')
            Image.fromarray(img).save(p, quality=95)
            paths.append(p)

        ncv, next_, npre = pool.decode_batch(paths)
        pcv, pext, ppre = _python_decode(paths, canvas, grayscale=False)
        np.testing.assert_array_equal(next_, pext)
        np.testing.assert_allclose(npre, ppre, rtol=1e-6)
        np.testing.assert_array_equal(ncv, pcv)


class TestOversizedPng:
    def test_native_matches_python_nearest(self, tmp_path):
        canvas = (212, 256)
        pool = _native_or_skip('NativeDepthLoader', canvas)
        rng = np.random.RandomState(1)
        paths = []
        for i, (h, w) in enumerate([(424, 512), (212, 256), (180, 300)]):
            depth = rng.randint(0, 65535, (h, w)).astype(np.uint16)
            p = str(tmp_path / f'd{i}.png')
            Image.fromarray(depth, mode='I;16').save(p)
            paths.append(p)

        ncv, next_, npre = pool.decode_batch(paths)
        pcv, pext, ppre = _python_decode(paths, canvas, grayscale=True)
        np.testing.assert_array_equal(next_, pext)
        np.testing.assert_allclose(npre, ppre, rtol=1e-6)
        np.testing.assert_array_equal(ncv, pcv)


class TestLoaderGateReachesPngPool:
    def test_decode_images_uses_depth_pool_for_png(self, tmp_path):
        """Regression for the dead native-PNG path: _decode_images gated
        ALL native decode on .jpg extensions, so depth .png batches always
        fell back to per-sample PIL."""
        from pose_tpu.data.loader import PoseLoader

        canvas = (106, 128)
        pool = _native_or_skip('NativeDepthLoader', canvas)
        rng = np.random.RandomState(2)
        paths = []
        for i in range(3):
            depth = rng.randint(0, 65535, (100, 120)).astype(np.uint16)
            p = str(tmp_path / f'e{i}.png')
            Image.fromarray(depth, mode='I;16').save(p)
            paths.append(p)

        calls = []
        real = pool.decode_batch

        def spy(batch_paths):
            calls.append(list(batch_paths))
            return real(batch_paths)

        pool.decode_batch = spy
        self_like = type('L', (), {})()
        out = PoseLoader._decode_images(self_like, paths, canvas, pool,
                                        grayscale=True)
        assert calls, 'native PNG pool was not invoked'
        pcv, pext, ppre = _python_decode(paths, canvas, grayscale=True)
        np.testing.assert_array_equal(out[0], pcv)
        np.testing.assert_array_equal(out[1], pext)


def test_per_axis_prescale_exact():
    """The realized downscale factors differ per axis (independent floors);
    pad_to_canvas must report BOTH exactly — averaging them into one
    isotropic scalar shifts warped source lookups sub-pixel vs GT."""
    img = np.zeros((700, 1000, 3), np.uint8)
    cv, ext, pre = crop.pad_to_canvas(img, (512, 512))
    # s = 0.512 -> new_h = floor(358.4) = 358, new_w = 512
    assert tuple(ext) == (358, 512)
    np.testing.assert_allclose(pre, np.float32([358 / 700, 512 / 1000]), rtol=0)
    assert pre[0] != pre[1]
