"""Device-mesh data parallelism.

Replaces the reference's single-process nn.DataParallel replicate/scatter/
gather (main.py:66, depth_main.py:72,105-106) with a jax.sharding Mesh: the
batch dimension is sharded over the 'data' axis, parameters are replicated,
and XLA's SPMD partitioner inserts the gradient all-reduce over ICI — the
TPU-native equivalent of DataParallel's implicit sync (SURVEY.md §5).

`-n_cudas` is interpreted as the number of mesh devices.

The model is a CNN over fixed 257x257 crops — there is no sequence axis, so
batch (dp) sharding is the scaling dimension at every practical pod size.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name='data'):
    """A 1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is None or n_devices <= 0:
        n_devices = len(devices)
    n_devices = min(n_devices, len(devices))
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name='data'):
    """Place a pytree of host arrays with the batch dim sharded over the mesh.
    The global batch must divide the mesh size (the loaders pad/crop to
    multiples of it)."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_replicated(mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
