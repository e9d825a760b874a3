"""Persistent XLA compilation cache.

Remote TPU compiles cost minutes per program shape (a pain the reference
never had — torch eager has no compile step), so the CLI entry points
enable jax's persistent compilation cache by default: recompiling the same
program (same model/flag/batch shape) in a later run becomes a disk hit.

Resolution order: `-compile_cache DIR` flag > POSE_TPU_COMPILE_CACHE env >
default `~/.cache/pose_tpu/xla`. Pass `-compile_cache off` (or set the env
var to `off`) to disable. Compilations faster than 1 s are not persisted
(they are cheaper to redo than to read back)."""

import os
import sys

import jax

DEFAULT_DIR = os.path.join(os.path.expanduser('~'), '.cache', 'pose_tpu',
                           'xla')


def enable_compile_cache(args=None, path=None):
    """Configure the persistent cache; returns the directory or None if
    disabled. Safe to call more than once."""
    explicit = (path
                or getattr(args, 'compile_cache', None)
                or os.environ.get('POSE_TPU_COMPILE_CACHE'))
    path = explicit or DEFAULT_DIR
    if str(path).lower() in ('off', 'none', ''):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception as e:
        # a read-only home or an old jax must never break training — but an
        # EXPLICITLY requested cache dir failing deserves a visible warning
        # (silently paying minutes-long recompiles defeats the flag)
        if explicit:
            # stderr: bench.py (stdout = exactly one JSON line) imports this
            print('=> WARNING: compile cache %r unavailable (%s); '
                  'continuing without persistent cache' % (path, e),
                  file=sys.stderr)
        return None
    return path
