"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is testable without a TPU pod (SURVEY.md §4).

Note: this box's axon TPU plugin calls jax.config.update('jax_platforms',
'axon,cpu') from sitecustomize at interpreter start, which overrides the
JAX_PLATFORMS env var — so the config must be re-forced here, before any
backend initialization."""

import os

flags = os.environ.get('XLA_FLAGS', '')
# strip any pre-existing count and force 8: the mesh/podslice tests assume
# exactly the documented 8-device virtual CPU mesh
flags = ' '.join(f for f in flags.split()
                 if not f.startswith('--xla_force_host_platform_device_count'))
os.environ['XLA_FLAGS'] = (
    flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
