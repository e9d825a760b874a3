"""CLI shim (reference: filter_pku_samples.py).
Usage: python filter_pku_samples.py <root> <anno_path>"""

import sys

from pose_tpu.tools.depth_build import (filter_pku_main as main_impl,
                                        filter_pku_samples as filter_samples,
                                        kinect_to_box, reap_by_iou)


def main(root, anno_path):
    main_impl(root, anno_path)


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
