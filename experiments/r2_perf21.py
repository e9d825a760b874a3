"""Round-2 perf #21: the Pallas planar stem conv (ops/stem_pallas.py) vs
XLA's NHWC conv at the honest shape (bs128, 257^2, 4->64). Includes the
pad_planar cost in the Pallas number (the aug path can emit planar for
free, but padding is real). Correctness cross-check on device."""

import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit


def main():
    emit(devices=[str(d) for d in jax.devices()])
    from pose_tpu.ops import stem_pallas as sp

    B, S, C = 128, 257, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, C, S, S).astype(np.float32)).astype(
        jnp.bfloat16)
    xn = jnp.transpose(x, (0, 2, 3, 1))
    w = jnp.asarray((rng.randn(7, 7, C, 64) * 0.05).astype(np.float32))
    wb = w.astype(jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def xla_fwd(xn, wb):
        return jax.lax.conv_general_dilated(
            xn, wb, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    @jax.jit
    def pallas_fwd(xp_planar, w):
        xp = sp.pad_planar(xp_planar, 257)
        return sp.stem_conv_fwd(xp, w, 257)

    def timeit(fn, *a, n=30):
        for _ in range(5):
            out = fn(*a)
        float(jnp.ravel(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        float(jnp.ravel(out)[0])
        return (time.perf_counter() - t0) / n

    ours = pallas_fwd(x, w)
    ref = xla_fwd(xn, wb)
    md = float(jnp.max(jnp.abs(ours - ref)))
    emit(exp='stem_pallas_vs_xla_maxdiff', maxdiff=md)

    dt = timeit(xla_fwd, xn, wb)
    emit(exp='stem_fwd_xla', ms=round(dt * 1000, 3))
    dt = timeit(pallas_fwd, x, w)
    emit(exp='stem_fwd_pallas_incl_pad', ms=round(dt * 1000, 3))


if __name__ == '__main__':
    main()
