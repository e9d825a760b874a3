"""ctypes bindings for the native C++ image loader (native/pose_loader.cc).

Decodes a batch of JPEGs into zero-padded uint8 canvases with a persistent
C++ worker pool — the native replacement for the per-sample Python decode
(the reference used libjpeg-turbo via jpeg4py inside DataLoader worker
*processes*, datasets.py:5; here worker *threads* suffice because the decode
loop never takes the GIL).

Builds the shared library on demand with `make -C native` if missing.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, 'native', 'libposeloader.so')

_lib = None


def _build():
    subprocess.run(['make', '-C', os.path.join(_REPO, 'native')], check=True,
                   capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pl_create.restype = ctypes.c_void_p
    lib.pl_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pl_destroy.argtypes = [ctypes.c_void_p]
    lib.pl_decode_batch.restype = ctypes.c_int
    lib.pl_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


class NativeImageLoader:
    def __init__(self, canvas_hw, num_threads=4):
        self.canvas_hw = tuple(canvas_hw)
        self._lib = get_lib()
        self._handle = self._lib.pl_create(num_threads, canvas_hw[0],
                                           canvas_hw[1])

    def __del__(self):
        if getattr(self, '_handle', None):
            self._lib.pl_destroy(self._handle)
            self._handle = None

    def decode_batch(self, paths):
        """paths: list of JPEG file paths.

        Returns (canvases (N, ch, cw, 3) uint8, extents (N, 2) int32,
        prescales (N, 2) float32 — realized (sy, sx) downscale factors).
        Raises on decode failure."""
        n = len(paths)
        ch, cw = self.canvas_hw
        canvases = np.empty((n, ch, cw, 3), np.uint8)
        extents = np.empty((n, 2), np.int32)
        prescales = np.empty((n, 2), np.float32)

        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.pl_decode_batch(
            self._handle, arr, n,
            canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            extents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            prescales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if failures:
            bad = [p for p, e in zip(paths, extents) if e[0] == 0]
            raise IOError(f'{failures} images failed to decode: {bad[:5]}')
        return canvases, extents, prescales


def available():
    try:
        get_lib()
        return True
    except Exception:
        return False


class DecodeCropLoader:
    """Functional decode-and-crop loader (host-side, offline tooling).

    Replaces the reference's vestigial TF1 `ImageLoader`
    (cameralib.py:765-793): a tf.Session around `decode_and_crop_jpeg` at
    DCT ratios 1/2/4/8 whose `load()` fetches the *placeholder* rather than
    any decoded tensor — i.e. it returns the input bytes unchanged, a dead
    code path. This one actually decodes.

    `load(encoded_jpeg, box, ratio)` takes JPEG bytes, an optional
    `[x, y, w, h]` crop box (the reference reindexes its box to tf's
    `[y, x, h, w]` window, cameralib.py:791 — same convention here), and a
    downscale `ratio` in {1, 2, 4, 8} mirroring `decode_and_crop_jpeg`'s
    DCT scaling (output side = ceil(side / ratio)). Returns RGB uint8."""

    RATIOS = (1, 2, 4, 8)

    def load(self, encoded_jpeg, box=None, ratio=1):
        import cv2
        if ratio not in self.RATIOS:
            raise ValueError(f'ratio must be one of {self.RATIOS}: {ratio}')
        buf = np.frombuffer(bytes(encoded_jpeg), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError('JPEG decode failed')
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if box is not None:
            x, y, w, h = (int(round(v)) for v in np.asarray(box))
            ih, iw = img.shape[:2]
            if not (0 <= x and 0 <= y and w > 0 and h > 0
                    and x + w <= iw and y + h <= ih):
                raise ValueError(  # decode_and_crop_jpeg errors likewise
                    f'crop window {(x, y, w, h)} outside image {(iw, ih)}')
            img = img[y:y + h, x:x + w]
        if ratio > 1:
            oh = -(-img.shape[0] // ratio)
            ow = -(-img.shape[1] // ratio)
            img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_AREA)
        return img


class NativeDepthLoader:
    """PNG (8/16-bit grayscale) decode pool for the depth modality; float32
    canvases scaled like matplotlib imread (16-bit / 65535)."""

    def __init__(self, canvas_hw, num_threads=4):
        self.canvas_hw = tuple(canvas_hw)
        self._lib = get_lib()
        self._lib.pl_decode_png_batch.restype = ctypes.c_int
        self._lib.pl_decode_png_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float)]
        self._handle = self._lib.pl_create(num_threads, canvas_hw[0],
                                           canvas_hw[1])

    def __del__(self):
        if getattr(self, '_handle', None):
            self._lib.pl_destroy(self._handle)
            self._handle = None

    def decode_batch(self, paths):
        n = len(paths)
        ch, cw = self.canvas_hw
        canvases = np.empty((n, ch, cw), np.float32)
        extents = np.empty((n, 2), np.int32)
        prescales = np.empty((n, 2), np.float32)   # (sy, sx) per sample
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.pl_decode_png_batch(
            self._handle, arr, n,
            canvases.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            extents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            prescales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if failures:
            bad = [p for p, e in zip(paths, extents) if e[0] == 0]
            raise IOError(f'{failures} PNGs failed to decode: {bad[:5]}')
        return canvases[..., None], extents, prescales
