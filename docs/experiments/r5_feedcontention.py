"""2-thread producer-contention probe (round-4 VERDICT weak #4 follow-up).

PERF.md's "4 producer cores feed the chip" claim is 1-core x assumed-linear
scaling — this box has 1 vCPU, so true multi-core scaling cannot be
measured here. What CAN be measured on one core is the CONTENTION overhead
between two producer threads sharing one `PoseLoader`: with perfect
GIL-release and no lock contention, two threads timesharing one core
deliver the same AGGREGATE throughput as one thread (each takes ~2x wall
per batch). Any aggregate-throughput loss vs the 1-thread baseline is pure
interference (GIL hold in the numpy/camera math, allocator contention,
native-pool lock) — an upper bound on the per-core sublinearity a real
multi-core host would see from thread interference (a real host adds
memory-bandwidth sharing on top, which one core cannot probe).

Protocol: same honest config as r3_hostfeed2 (512^2 sources, bs128,
joint_space+do_track+extra_channel). Phase 1: one thread decodes 2R
batches. Phase 2: two threads decode R batches each, concurrently, on
disjoint batch-index slices. Aggregate img/s compared.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python docs/experiments/r5_feedcontention.py
"""
import json
import os
import sys
import tempfile
import threading
import time
import types

import jax

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from datasets import build_info  # noqa: E402
from pose_tpu.data.loader import PoseLoader  # noqa: E402
from pose_tpu.data.synthetic import make_cmu_fixture  # noqa: E402


def main():
    root = tempfile.mkdtemp(prefix='feedcontention_')
    metadata = make_cmu_fixture(root, num_train=256, num_valid=8,
                                imshape=(512, 512))

    args = types.SimpleNamespace(
        criterion='SmoothL1', half_acc=True, depth=16, num_joints=19,
        depth_range=1000.0, side_in=257, stride=16,
        do_track=True, joint_space=True, shuffle=True, geometry=True,
        colour=True, eraser=False, occluder=False, occ_path=None,
        occ_count=0, batch_size=128, data_name='cmu',
        metadata_path=metadata, random_zoom=0.8, n_cudas=1, workers=1,
        extra_channel=True, model='resnet50', nexponent=False,
        to_depth=False, depth_only=False, skip_relu=False, early_dist=False)

    loader = PoseLoader(args, 'train', build_info('cmu'))
    order = loader._order()
    bs = loader.batch_size
    batches = [order[i:i + bs] for i in range(0, len(order), bs)]
    batches = [b for b in batches if len(b) == bs]
    print(json.dumps({'native_pool': loader._native is not None,
                      'n_batches': len(batches), 'bs': bs}), flush=True)

    loader._decode_batch(batches[0])  # warmup: page cache, pool spin-up

    R = 6  # batches per thread in phase 2; phase 1 runs 2R for parity

    def run_slice(idx_lists, reps):
        for rep in range(reps):
            for idxs in idx_lists:
                loader._decode_batch(idxs)

    # Phase 1: single thread, 2R batches total.
    t0 = time.perf_counter()
    run_slice(batches[: 2], R)
    dt1 = time.perf_counter() - t0
    n1 = 2 * R * bs
    ips1 = n1 / dt1
    print(json.dumps({'phase': '1_thread', 'batches': 2 * R,
                      'wall_s': round(dt1, 2),
                      'aggregate_img_s': round(ips1, 1)}), flush=True)

    # Phase 2: two threads, R batches each, disjoint slices, concurrent.
    threads = [threading.Thread(target=run_slice, args=([batches[k]], R))
               for k in range(2)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt2 = time.perf_counter() - t0
    n2 = 2 * R * bs
    ips2 = n2 / dt2
    print(json.dumps({'phase': '2_threads', 'batches': 2 * R,
                      'wall_s': round(dt2, 2),
                      'aggregate_img_s': round(ips2, 1)}), flush=True)

    print(json.dumps({
        'exp': 'producer_contention_2thread_1core',
        'aggregate_ratio_2t_over_1t': round(ips2 / ips1, 3),
        'interference_overhead_pct': round((1 - ips2 / ips1) * 100, 1),
        'note': ('ratio ~1.0 => thread interference negligible; the '
                 'linear-scaling assumption loses at most this overhead '
                 'per added core (memory bandwidth not probed).')}),
        flush=True)


if __name__ == '__main__':
    main()
