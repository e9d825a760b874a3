"""CLI shim (reference: filter_ntu_samples.py).
Usage: python filter_ntu_samples.py <root_path> <skeleton_path>"""

import sys

from pose_tpu.tools.depth_build import (MotionGate, has_coords,
                                        filter_ntu_main as main_impl,
                                        filter_ntu_samples as filter_samples)


def main(root_path, skeleton_path):
    main_impl(root_path, skeleton_path)


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
