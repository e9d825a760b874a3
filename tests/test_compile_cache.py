"""Persistent XLA compilation-cache wiring (-compile_cache /
POSE_TPU_COMPILE_CACHE)."""

import os
import types

import jax

from pose_tpu.utils.compile_cache import enable_compile_cache


def test_flag_enables_and_off_disables(tmp_path, monkeypatch):
    monkeypatch.delenv('POSE_TPU_COMPILE_CACHE', raising=False)
    d = str(tmp_path / 'cache')
    prev = jax.config.jax_compilation_cache_dir
    try:
        got = enable_compile_cache(types.SimpleNamespace(compile_cache=d))
        assert got == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        # flag wins over env; 'off' disables without touching the config
        monkeypatch.setenv('POSE_TPU_COMPILE_CACHE', str(tmp_path / 'env'))
        assert enable_compile_cache(
            types.SimpleNamespace(compile_cache='off')) is None
        assert jax.config.jax_compilation_cache_dir == d

        # env used when no flag
        got = enable_compile_cache(types.SimpleNamespace(compile_cache=None))
        assert got == str(tmp_path / 'env')

        monkeypatch.setenv('POSE_TPU_COMPILE_CACHE', 'off')
        assert enable_compile_cache(
            types.SimpleNamespace(compile_cache=None)) is None
    finally:
        jax.config.update('jax_compilation_cache_dir', prev)


def test_cache_populates_on_compile(tmp_path):
    import jax.numpy as jnp

    d = str(tmp_path / 'cache2')
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert enable_compile_cache(path=d) == d
        # drop the persistence threshold so this tiny program qualifies
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

        @jax.jit
        def f(x):
            return (x @ x).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        assert os.listdir(d), 'no cache entry written'
    finally:
        jax.config.update('jax_compilation_cache_dir', prev_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          prev_min)
