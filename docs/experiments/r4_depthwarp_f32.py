"""r4: cost + accuracy of the depth-stream f32 warp fix.

Round-4 review found the matmul/split warps cast float sources to bf16 on
TPU (exact only for uint8-valued colour; raw depth loses mantissa — ~0.2%
of range where the reference's cv2 warp is f32-exact), so
augment.process_depth_batch now passes wdtype=f32. This probe measures, at
the depth-config shapes (bs128, 512^2 1-channel canvases -> 257^2 crops):

  - split-warp step time with wdtype=bf16 (old) vs f32 (new)
  - max|crop - gather_f32_reference| for both dtypes

Run: python docs/experiments/r4_depthwarp_f32.py   (on the chip)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, '.')
from pose_tpu.ops import warp  # noqa: E402
from bench import realistic_homs  # noqa: E402

B, CANVAS, SIDE = 128, 512, 257

rng = np.random.RandomState(0)
# kinect-like raw depth after /65535: piecewise-smooth metres-scale values
# (smooth surface + depth steps at object boundaries; NOT per-pixel noise,
# which would make resampling-semantic differences dominate the comparison)
yy, xx = np.mgrid[:CANVAS, :CANVAS].astype(np.float32)
base = 0.045 + 0.02 * np.sin(xx / 97.0) + 0.015 * np.cos(yy / 61.0)
steps = 0.03 * (np.sin(xx / 301.0 + yy / 211.0) > 0.3)
canv = np.broadcast_to((base + steps)[None, :, :, None],
                       (B, CANVAS, CANVAS, 1)).astype(np.float32).copy()
homs = realistic_homs(rng, B, CANVAS, SIDE)
exts = np.tile([CANVAS, CANVAS], (B, 1)).astype(np.int32)

dc = jnp.asarray(canv)
dh = jnp.asarray(homs)
de = jnp.asarray(exts)

outs = {}


def run(wdtype, label):
    out = warp.warp_batch_split(dc, dh, (SIDE, SIDE), de, stage_b='pallas',
                                wdtype=wdtype)
    outs[label] = np.asarray(out)
    for _ in range(3):
        out = warp.warp_batch_split(dc, dh, (SIDE, SIDE), de,
                                    stage_b='pallas', wdtype=wdtype)
    float(out[0, 0, 0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(30):
            out = warp.warp_batch_split(dc, dh, (SIDE, SIDE), de,
                                        stage_b='pallas', wdtype=wdtype)
        float(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f'{label}: {best * 1e3:.3f} ms/batch')


run(jnp.bfloat16, 'wdtype=bf16 (old)')
run(jnp.float32, 'wdtype=f32  (new)')
# the dtype-induced quantization, same sampling semantic on both sides
d = np.abs(outs['wdtype=bf16 (old)'] - outs['wdtype=f32  (new)'])
print(f'bf16-vs-f32 split-warp delta: max {d.max():.2e} '
      f'mean {d.mean():.2e} '
      f'(= {d.max() * 65535:.1f} / {d.mean() * 65535:.2f} mm at '
      f'uint16-mm raw-depth scale)')
