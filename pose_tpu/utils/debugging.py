"""Numerics debugging hooks (SURVEY.md §5): jax debug_nans/debug_infs config
replaces the reference's fp16 inf-grad skip (depth_train.py:255-258) and
np.seterr('raise') (get_depth_cams.py:12)."""

import contextlib

import jax
import jax.numpy as jnp


def enable_nan_checks(infs=True):
    """Fail fast on NaN/Inf in any jitted computation (development mode;
    disables some fusions)."""
    jax.config.update('jax_debug_nans', True)
    if infs:
        jax.config.update('jax_debug_infs', True)


def disable_nan_checks():
    jax.config.update('jax_debug_nans', False)
    jax.config.update('jax_debug_infs', False)


@contextlib.contextmanager
def nan_checks():
    enable_nan_checks()
    try:
        yield
    finally:
        disable_nan_checks()


def assert_finite_tree(tree, name='tree'):
    """Host-side check over a pytree (e.g. grads) — the bf16 analogue of the
    reference's inf-skip, for debugging only; bf16 needs no skip in steady
    state."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise FloatingPointError(f'non-finite values in {name}{path}')
