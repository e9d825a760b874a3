"""Module-path shim: the reference's sample pickles contain
`cameralib.Camera` instances (data_groups.py, depth_groups.py), so this name
must resolve for them to unpickle. All functionality lives in
pose_tpu.geometry.camera."""

from pose_tpu.geometry.camera import *          # noqa: F401,F403
from pose_tpu.geometry.camera import (Camera, get_affine, get_homography,
                                      look_at_box, look_at_skeleton,
                                      project_points, reproject_points,
                                      reproject_points_fast, triangulate,
                                      triangulate_single, undistort_points,
                                      calibrate_extrinsics,
                                      camera_in_new_world,
                                      build_extrinsic_matrix,
                                      allclose_or_nones)


def reproject_image(image, old_camera, new_camera, output_imshape,
                    antialias=False, **kwargs):
    """Host-side single-image warp for the offline tools (cameralib.py:378).
    The training path never calls this — it uses the batched on-device
    kernels in pose_tpu.ops.warp.

    Interpolation parity note: the reference's affine branch requests
    cv2.INTER_AREA on downscale (cameralib.py:403), but cv2.warpAffine does
    not implement INTER_AREA and silently resamples bilinearly (verified:
    warpAffine AREA==LINEAR bit-exact at non-integer minification), so our
    bilinear warp matches the reference's *actual* behavior. antialias=True
    replicates the reference's explicit pre-downscale path
    (cameralib.py:676-689) with an exact area average."""
    import numpy as np
    import jax.numpy as jnp
    from pose_tpu.ops import warp
    from pose_tpu.geometry.camera import get_homography as _gh

    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    orig_dtype = image.dtype
    img = image.astype(np.float32)
    for c in (old_camera, new_camera):
        if (c.distortion_coeffs is not None
                and len(c.distortion_coeffs) > 5):
            raise NotImplementedError(
                'only the 5-coefficient (k1 k2 p1 p2 k3) distortion model '
                'is implemented (every reference corpus uses <= 5); got '
                f'{len(c.distortion_coeffs)} coefficients')
    if new_camera.distortion_coeffs is not None:
        # general path (distorted TARGET camera, reference
        # cameralib.py:408-433): per-pixel reproject of the output grid
        # new->old (undistort -> rotate -> redistort), one bilinear gather.
        # Without this branch a distorted target silently fell through to
        # the pure-homography warp — geometrically wrong output, no error.
        yy, xx = np.mgrid[:output_imshape[0], :output_imshape[1]]
        dst_pts = np.stack([xx, yy], -1).reshape(-1, 2).astype(np.float64)
        src = reproject_points(dst_pts, new_camera, old_camera)
        coords = np.asarray(src, np.float32).reshape(
            output_imshape[0], output_imshape[1], 2)
        out = np.asarray(warp.bilinear_sample(jnp.asarray(img),
                                              jnp.asarray(coords)))
    elif old_camera.distortion_coeffs is not None:
        partial = (old_camera.R @ np.linalg.inv(new_camera.R)
                   @ np.linalg.inv(new_camera.intrinsic_matrix)).astype(np.float32)
        dist = np.zeros(5, np.float32)
        dist[:len(old_camera.distortion_coeffs)] = old_camera.distortion_coeffs
        out = np.asarray(warp.warp_single_distorted(
            jnp.asarray(img), jnp.asarray(partial),
            jnp.asarray(old_camera.intrinsic_matrix.astype(np.float32)),
            jnp.asarray(dist), tuple(output_imshape)))
    else:
        hom = _gh(old_camera, new_camera).astype(np.float32)
        if antialias:
            factor = warp.antialias_factor(hom, tuple(output_imshape))
            if factor < 1:
                scaled = (int(np.round(factor * img.shape[0])),
                          int(np.round(factor * img.shape[1])))
                img = np.asarray(warp.area_downscale(jnp.asarray(img),
                                                     scaled))
                hom = hom.copy()
                hom[:2] *= factor
        out = np.asarray(warp.warp_single(jnp.asarray(img), jnp.asarray(hom),
                                          tuple(output_imshape)))
    if orig_dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out


def reproject_image_fast(image, old_camera, new_camera, output_imshape,
                         border_mode=None, border_value=None, antialias=False,
                         dst=None):
    """Reference signature (cameralib.py:667-668); border args are the cv2
    defaults (constant zero) in every reference call."""
    return reproject_image(image, old_camera, new_camera, output_imshape,
                           antialias=antialias)


from pose_tpu.geometry.camera import (is_all_visible_in_new_camera,  # noqa: E402,F401
                                      visibility_homography_coords)


def reproject_image_fast_if_visible(image, old_camera, new_camera,
                                    output_imshape):
    """Warp only when fully visible, else None (cameralib.py:737-762)."""
    if not is_all_visible_in_new_camera(image, old_camera, new_camera,
                                        output_imshape):
        return None
    return reproject_image(image, old_camera, new_camera, output_imshape)


import functools  # noqa: E402

from pose_tpu.data.native_loader import (  # noqa: E402
    DecodeCropLoader as ImageLoader)


@functools.lru_cache()
def get_image_loader():
    """Functional replacement for the reference's vestigial TF1
    decode_and_crop_jpeg session (cameralib.py:765-793, whose `load()`
    fetches the placeholder — it never decodes). Batch decode on the
    training path uses the native C++ pool (native/pose_loader.cc)."""
    return ImageLoader()


def reproject_image_fast_partial(image_path, old_camera, new_camera,
                                 output_imshape):
    """Unfinished stub in the reference returning None
    (cameralib.py:796-801); preserved as a no-op for API parity."""
    return None
