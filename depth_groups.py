"""CLI shim for the NTU/PKU midway->final sample construction (reference:
depth_groups.py). Usage: python depth_groups.py <ntu|pku> [phase] <flags...>"""

import sys

from pose_tpu.tools.depth_build import (get_ntu_group, get_pku_group,
                                        make_depth_sample as make_sample)


def main():
    import opts
    data_name = sys.argv[1]
    if data_name == 'ntu':
        phase = sys.argv[2]
        sys.argv = [sys.argv[0]] + sys.argv[3:]
        args = opts.parse()
        get_ntu_group(phase, args)
    else:
        sys.argv = [sys.argv[0]] + sys.argv[2:]
        args = opts.parse()
        get_pku_group(args)


if __name__ == '__main__':
    main()
