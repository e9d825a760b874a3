"""Integrated host-feed measurement (round-2 VERDICT missing #5 follow-up).

r2_hostfeed measured the host pipeline by COMPONENT (parse_batch 19.4
ms/batch, decode 2.29 ms/img/core) and extrapolated the multi-core feed
rate by arithmetic. This script measures the INTEGRATED per-batch host work
— `PoseLoader._decode_batch` = vectorized camera/GT math + native JPEG
decode onto canvases + prescale folding, i.e. everything the producer
threads do before the device sees a batch — at the honest bench config
(512^2 source images, bs128, joint_space+do_track+extra_channel), on one
core. The host ceiling on an N-core production host is then
N * (measured img/s) straight off (the producer threads scale per core:
the C++ pool and numpy release the GIL; tests/test_loader_workers.py).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python docs/experiments/r3_hostfeed2.py
"""
import json
import os
import sys
import tempfile
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
    root = tempfile.mkdtemp(prefix='hostfeed2_')
    t0 = time.perf_counter()
    metadata = make_cmu_fixture(root, num_train=256, num_valid=8,
                                imshape=(512, 512))
    print(json.dumps({'fixture_built_s': round(time.perf_counter() - t0, 1)}))

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
                      'n_batches': len(batches), 'bs': bs}))

    # warmup (page cache, pool spin-up)
    loader._decode_batch(batches[0])

    times = []
    for rep in range(6):
        loader.set_epoch(rep + 1)
        for idxs in batches:
            t = time.perf_counter()
            loader._decode_batch(idxs)
            times.append(time.perf_counter() - t)
    times = np.asarray(times)
    ms = float(np.median(times) * 1000)
    print(json.dumps({
        'exp': 'integrated_host_decode_batch_bs128_512sq_1core',
        'median_ms_per_batch': round(ms, 1),
        'mean_ms_per_batch': round(float(times.mean() * 1000), 1),
        'img_s_per_core': round(bs / (ms / 1000), 1),
        'n_timed': len(times)}))


if __name__ == '__main__':
    main()
