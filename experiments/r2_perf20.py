"""Round-2 perf #20: the stem conv's backward. r2_perf2 measured stem
fwd+bwd at 4.45 ms (bs128, 257^2 in, 7x7/2, 4->64) — ~4% of the whole
step in one conv, and the input-grad is never needed (the image is data).
Hypothesis: XLA's filter-grad for a 4-input-channel conv runs the MXU at
M=4 (3% of the array). Alternative: materialize the 49 strided taps and
contract as ONE (196, K)x(K, 64) matmul (M=196).

Measures: fwd-only, fwd+filter-grad (XLA), fwd+filter-grad (tap-einsum
custom vjp), each at the honest shape; plus numerical agreement."""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit


import os
B = int(os.environ.get('P20_B', 128))
S = int(os.environ.get('P20_S', 257))
CIN, COUT = 4, 64
PAD = 3


def conv_fwd(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=[(PAD, PAD), (PAD, PAD)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def filter_grad_taps(x, dy):
    """dW via 49 strided taps contracted as one (196, K) x (K, 64) dot.
    x: (B, S, S, CIN) padded to (B, S+2P, S+2P, CIN); dy: (B, OH, OW, COUT)."""
    oh, ow = dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    taps = []
    for kh in range(7):
        for kw in range(7):
            sl = jax.lax.slice(
                xp, (0, kh, kw, 0),
                (B, kh + 2 * oh - 1, kw + 2 * ow - 1, CIN), (1, 2, 2, 1))
            taps.append(sl)
    t = jnp.stack(taps)                       # (49, B, OH, OW, CIN)
    dw = jax.lax.dot_general(
        t.reshape(49, -1, CIN).transpose(0, 2, 1).reshape(49 * CIN, -1)
        .astype(jnp.bfloat16),
        dy.reshape(-1, COUT).astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (196, 64)
    return dw.reshape(7, 7, CIN, COUT)


def main():
    emit(devices=[str(d) for d in jax.devices()])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, CIN).astype(np.float32))
    w = jnp.asarray((rng.randn(7, 7, CIN, COUT) * 0.05).astype(np.float32))

    def timeit(fn, n=30):
        out = None
        for i in range(5):
            out = fn()
        float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        t0 = time.perf_counter()
        for i in range(n):
            out = fn()
        float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        return (time.perf_counter() - t0) / n

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    fwd = jax.jit(lambda xx, ww: conv_fwd(xx, ww))
    dt = timeit(lambda: fwd(xb, wb))
    emit(exp='stem_fwd_only', ms=round(dt * 1000, 3))

    def loss(ww):
        return jnp.sum(conv_fwd(xb, ww).astype(jnp.float32) ** 2)

    g_xla = jax.jit(jax.grad(loss))
    dt = timeit(lambda: g_xla(wb))
    emit(exp='stem_filter_grad_xla', ms=round(dt * 1000, 3))

    # tap-einsum filter grad given dy (isolate the grad op itself)
    y = fwd(xb, wb)
    dy = (2.0 * y).astype(jnp.bfloat16)
    g_taps = jax.jit(filter_grad_taps)
    dt = timeit(lambda: g_taps(xb, dy))
    emit(exp='stem_filter_grad_taps', ms=round(dt * 1000, 3))

    # agreement (f32 path on small slice to bound cost)
    gx = np.asarray(g_xla(wb), np.float32)
    gt = np.asarray(g_taps(xb, dy), np.float32)
    rel = np.abs(gt - gx).max() / max(np.abs(gx).max(), 1e-6)
    emit(exp='taps_vs_xla_rel', rel=float(rel))


if __name__ == '__main__':
    main()
