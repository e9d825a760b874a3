"""CLI shim for the offline RGB dataset construction (reference:
data_groups.py). Usage: python data_groups.py <cmu|h36m> <phase> <flags...>"""

import sys

from pose_tpu.tools.dataset_build import (collect_data, detect_bbox,
                                          get_cmu_cameras, get_cmu_group,
                                          get_h36m_cameras, get_h36m_group,
                                          load_coords, make_sample)


def main():
    import opts
    data_name, phase = sys.argv[1], sys.argv[2]
    sys.argv = [sys.argv[0]] + sys.argv[3:]
    args = opts.parse()
    if data_name == 'cmu':
        get_cmu_group(phase, args)
    else:
        get_h36m_group(phase, args)


if __name__ == '__main__':
    main()
