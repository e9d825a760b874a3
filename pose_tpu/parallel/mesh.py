"""Device-mesh data parallelism.

Replaces the reference's single-process nn.DataParallel replicate/scatter/
gather (main.py:66, depth_main.py:72,105-106) with a jax.sharding Mesh: the
batch dimension is sharded over the 'data' axis, parameters are replicated,
and XLA's SPMD partitioner inserts the gradient all-reduce over ICI — the
TPU-native equivalent of DataParallel's implicit sync (SURVEY.md §5).

`-n_cudas` is interpreted as the number of mesh devices.

The model is a CNN over fixed 257x257 crops — there is no sequence axis, so
batch (dp) sharding is the scaling dimension at every practical pod size.

Multi-host scale-out: `init_distributed` (wired to `-dist_coord
-dist_nprocs -dist_rank`, or the POSE_TPU_DIST_* env vars) joins this
process to a JAX distributed cluster before backend init; `jax.devices()`
then spans every host's chips and the same mesh/jit code runs SPMD across
hosts — each process feeds its contiguous block of the global batch
(`shard_batch` routes through `make_array_from_process_local_data`) and
only process 0 writes checkpoints/console (`is_main_process`). On CPU the
cross-process collectives ride gloo (used by the 2-process tests); on TPU
pods they ride ICI/DCN natively.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(args=None):
    """Join a multi-process JAX cluster if configured; returns True if so.

    Reads `-dist_coord host:port`, `-dist_nprocs N`, `-dist_rank R` (or env
    POSE_TPU_DIST_COORD/NPROCS/RANK). Must run before any JAX backend use —
    main.py/depth_main.py call it right after flag parsing. Single-process
    runs (no coordinator configured) return False and touch nothing."""
    coord = (getattr(args, 'dist_coord', None)
             or os.environ.get('POSE_TPU_DIST_COORD'))
    if not coord:
        return False
    nprocs = int(getattr(args, 'dist_nprocs', 0)
                 or os.environ.get('POSE_TPU_DIST_NPROCS', 0))
    rank = int(getattr(args, 'dist_rank', -1)
               if getattr(args, 'dist_rank', -1) >= 0
               else os.environ.get('POSE_TPU_DIST_RANK', -1))
    assert nprocs > 0 and rank >= 0, (
        '-dist_coord requires -dist_nprocs and -dist_rank')
    # CPU cross-process collectives need the gloo transport. Set it
    # unconditionally (it only affects the CPU client, and probing the
    # backend here would initialize it before jax.distributed.initialize,
    # which must come first).
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=rank)
    return True


def is_main_process():
    """True on the process that owns console/checkpoint IO (process 0;
    trivially true single-process)."""
    return jax.process_index() == 0


def make_mesh(n_devices=None, axis_name='data', spatial=1):
    """A data-parallel mesh over the first `n_devices` devices (global
    across processes in a distributed run).

    spatial > 1 folds the devices into a 2-D ('data', 'space') mesh of
    shape (n_devices // spatial, spatial): the batch still shards over
    'data', while image HEIGHT shards over 'space' inside the jitted steps
    (steps.set_spatial_sharding installs the with_sharding_constraint).
    XLA's SPMD partitioner then inserts the convolution halo exchanges
    over ICI automatically — TPU spatial partitioning. This trades
    collective traffic for a smaller per-device batch, for canvases too
    large (or batches too small) for pure DP."""
    devices = jax.devices()
    if n_devices is None or n_devices <= 0:
        n_devices = len(devices)
    n_devices = min(n_devices, len(devices))
    if jax.process_count() > 1:
        assert n_devices == len(devices), (
            'multi-process meshes must span every device: a sub-mesh would '
            'leave some processes with no addressable mesh devices')
        assert len(jax.local_devices()) * jax.process_count() == len(
            devices), (
            'cluster mode requires an equal device count per process: the '
            'loaders slice the global batch into equal contiguous blocks '
            '(got %d local devices, %d processes, %d global devices)'
            % (len(jax.local_devices()), jax.process_count(), len(devices)))
    if spatial > 1:
        assert n_devices % spatial == 0, (
            '-mesh_spatial %d must divide the %d mesh devices'
            % (spatial, n_devices))
        if jax.process_count() > 1:
            assert len(jax.local_devices()) % spatial == 0, (
                'in cluster mode -mesh_spatial must divide the per-process '
                'device count, so every process owns whole (data, space) '
                'rows and its loader block keeps the full image height')
        grid = np.array(devices[:n_devices]).reshape(
            n_devices // spatial, spatial)
        return Mesh(grid, (axis_name, 'space'))
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def spatial_sharding(mesh, axis_name='data'):
    """Shard NHWC images: batch over 'data', height over 'space'."""
    return NamedSharding(mesh, P(axis_name, 'space'))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name='data'):
    """Place a pytree of host arrays with the batch dim sharded over the
    mesh's 'data' axis (the loaders pad/crop to multiples of the mesh size;
    on a 2-D (data, space) mesh the rows are replicated over 'space' — the
    H-split happens inside the jitted step, see steps.set_spatial_sharding,
    because device_put cannot represent unevenly sharded dims like 257/4).

    Single-process: a plain sharded device_put. Multi-process: THE CONTRACT
    CHANGES — each process must pass only ITS contiguous block of the
    global batch (rows [rank*local_n, (rank+1)*local_n), the way the
    loaders slice via _shard_indices), and the pieces assemble into one
    global jax.Array per leaf of local_n * process_count rows; device order
    in the mesh is process-major, so contiguous blocks preserve the global
    row order (and with -mesh_spatial, whole (data, space) rows stay
    process-local). Passing the FULL global batch from every process in
    cluster mode would silently duplicate each sample process_count times —
    size host batches accordingly."""
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        nproc = jax.process_count()
        # data-axis rows owned per process: make_mesh guarantees equal
        # device counts per process and (with spatial) whole process-local
        # (data, space) rows, so this holds for 1-D and 2-D meshes alike —
        # and stays correct for any axis order, unlike indexing devices[:, 0]
        local_dev = dict(mesh.shape)[axis_name] // nproc

        def place(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already assembled into a global array
            x = np.asarray(x)
            assert x.shape[0] % max(local_dev, 1) == 0, (
                'process-local batch block of %d rows does not divide this '
                "process's %d data-axis mesh rows" % (x.shape[0], local_dev))
            return jax.make_array_from_process_local_data(
                sharding, x,
                global_shape=(x.shape[0] * nproc,) + x.shape[1:])

        return jax.tree_util.tree_map(place, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_replicated(mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
