"""Round-2 perf #5: anatomy of the MXU warp cost at the 512^2/bs128 shape.

  1. pass-1 dot alone (generated W1, fused), both operand orders.
  2. pass-1 dot with int8 weights x int8 pixels (2x MXU rate on v5e).
  3. warp chunk-size sweep (lax.map granularity).
  4. standalone-warp anomaly probe: same program but summed output.
"""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/experiments')

import numpy as np
import jax
import jax.numpy as jnp

from r2_perf1 import emit, timeit, honest_batch


def _maps(hom, out_h, src_h, src_w):
    h = hom
    v = jax.lax.broadcasted_iota(jnp.float32, (out_h, src_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, src_w), 1)
    denom_u = h[0, 0] - h[2, 0] * xs
    u_of = (xs * (h[2, 1] * v + h[2, 2]) - h[0, 1] * v - h[0, 2]) / denom_u
    w_h = h[2, 0] * u_of + h[2, 1] * v + h[2, 2]
    Y = (h[1, 0] * u_of + h[1, 1] * v + h[1, 2]) / w_h
    return jnp.where(jnp.isfinite(Y), Y, -1e9)


def _w1(Y, src_h, eh, dtype):
    sy = jax.lax.broadcasted_iota(jnp.float32, (src_h, 1), 0)
    W1 = jnp.maximum(0.0, 1.0 - jnp.abs(Y[:, None, :] - sy[None]))
    W1 = W1 * (sy[None] <= eh - 1)
    return W1.astype(dtype)


def run_pass1_orders():
    rng = np.random.RandomState(0)
    b, src, out_h = 128, 512, 257
    imgs = jnp.asarray(rng.rand(b, src, src, 3).astype(np.float32))
    homs = jnp.asarray(np.tile(np.array(
        [[2.0, 0.01, 3.0], [-0.01, 1.9, 5.0], [1e-5, -1e-5, 1.0]],
        np.float32), (b, 1, 1)))

    def one_a(img, hom):                       # channels on N (lanes)
        Y = _maps(hom, out_h, src, src)
        W1 = _w1(Y, src, jnp.float32(src), jnp.bfloat16)
        return jax.lax.dot_general(
            W1, img.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((2,), (1,))),
            preferred_element_type=jnp.float32)

    def one_b(img, hom):                       # channels on M (sublanes)
        Y = _maps(hom, out_h, src, src)
        W1 = _w1(Y, src, jnp.float32(src), jnp.bfloat16)
        return jax.lax.dot_general(
            img.astype(jnp.bfloat16), W1,
            dimension_numbers=(((0,), (1,)), ((1,), (2,))),
            preferred_element_type=jnp.float32)

    def one_i8(img, hom):                      # int8 x int8 -> int32
        Y = _maps(hom, out_h, src, src)
        W1 = _w1(Y, src, jnp.float32(src), jnp.float32)
        W1q = jnp.round(W1 * 127.0).astype(jnp.int8)
        imq = jnp.round(img * 127.0).astype(jnp.int8)
        return jax.lax.dot_general(
            imq, W1q,
            dimension_numbers=(((0,), (1,)), ((1,), (2,))),
            preferred_element_type=jnp.int32)

    for name, fn in (('chanN', one_a), ('chanM', one_b), ('int8', one_i8)):
        @jax.jit
        def prog(imgs, homs, fn=fn):
            def chunk(args):
                return jax.vmap(fn)(*args)
            im = imgs.reshape(16, 8, src, src, 3)
            hm = homs.reshape(16, 8, 3, 3)
            out = jax.lax.map(chunk, (im, hm))
            return jnp.sum(out.astype(jnp.float32))

        try:
            dt = timeit(lambda i: prog(imgs, homs))
            emit(exp=f'pass1_{name}_512_bs128', ms=round(dt * 1000, 2))
        except Exception as e:
            emit(exp=f'pass1_{name}', error=repr(e)[:300])


def run_chunk_sweep():
    from pose_tpu.ops import warp
    rng = np.random.RandomState(5)
    d = honest_batch(rng, 128, 512, 19, 257)

    for chunk in (8, 16, 32, 128):
        @jax.jit
        def prog(canvases, homs, extents, chunk=chunk):
            images = canvases.astype(jnp.float32) / 255.0
            crops = warp.warp_batch_mxu.__wrapped__(
                images, homs, (257, 257), extents, chunk=chunk)
            return jnp.sum(crops)

        try:
            dt = timeit(lambda i: prog(d['canvases'], d['homs'],
                                       d['extents']))
            emit(exp=f'warp_sum_chunk{chunk}_512_bs128',
                 ms=round(dt * 1000, 2))
        except Exception as e:
            emit(exp=f'warp_chunk{chunk}', error=repr(e)[:300])


def main():
    emit(devices=[str(dev) for dev in jax.devices()])
    for fn in (run_pass1_orders, run_chunk_sweep):
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            emit(exp=fn.__name__, error=repr(e)[:500])
        emit(done=fn.__name__, wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    main()
