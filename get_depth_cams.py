"""CLI shim (reference: get_depth_cams.py).
Usage: python get_depth_cams.py <skeleton_npy_path>"""

import sys

from pose_tpu.tools.depth_build import (calibrate_depth_camera as get_camera,
                                        get_depth_cams_main as main_impl)


def main(path):
    main_impl(path)


if __name__ == '__main__':
    main(sys.argv[1])
