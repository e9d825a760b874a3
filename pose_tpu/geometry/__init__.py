from . import boxlib
from .camera import (Camera, allclose_or_nones, build_extrinsic_matrix,
                     calibrate_extrinsics, camera_in_new_world, get_affine,
                     get_homography, look_at_box, look_at_skeleton,
                     project_points, reproject_points, reproject_points_fast,
                     triangulate, triangulate_single, undistort_points)
