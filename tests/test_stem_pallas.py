"""Pallas planar stem conv (ops/stem_pallas.py) vs the XLA bf16 conv it
replaces — bit-exact in interpret mode across sides and channel counts
(the production resnet stems: 3ch RGB, 4ch extra-channel, 1ch raw depth)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from pose_tpu.ops import stem_pallas as sp


@pytest.mark.parametrize('side,cin', [(65, 4), (65, 3), (65, 1), (129, 4)])
def test_matches_xla_conv_bitexact(side, cin):
    rng = np.random.RandomState(hash((side, cin)) % (2 ** 31))
    x = rng.randn(2, cin, side, side).astype(np.float32)
    w = (rng.randn(7, 7, cin, 64) * 0.05).astype(np.float32)
    xp = sp.pad_planar(jnp.asarray(x).astype(jnp.bfloat16), side)
    ours = np.asarray(sp.stem_conv_fwd(xp, jnp.asarray(w), side,
                                       interpret=True))
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x).astype(jnp.bfloat16).transpose(0, 2, 3, 1),
        jnp.asarray(w).astype(jnp.bfloat16), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32))
    np.testing.assert_array_equal(ours, ref)
