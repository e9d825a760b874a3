"""Inference/serving API.

The reference has no deployment path (training-repo only); this module gives
the framework a production predictor: ahead-of-time-compiled forward +
decode on fixed shapes, with optional on-device crop-warp from full frames
and least-squares absolute-root reconstruction.

    predictor = Predictor.from_checkpoint('model_20.pth', args)
    coords = predictor.predict_crops(crops)                # (B, J, 3) mm
    absolute = predictor.predict_absolute(crops, intrinsics)
"""

import queue as queue_lib
import threading
import time
import types
from concurrent.futures import Future

import numpy as np

import jax
import jax.numpy as jnp

from . import quant
from .data import augment
from .models import build_model
from .models.convert import load_torch_file, variables_from_torch
from .ops import heatmap, recon


def default_args(**over):
    base = dict(model='resnet50', criterion='SmoothL1', half_acc=True,
                extra_channel=False, joint_space=True, skip_relu=False,
                early_dist=False, depth_only=False,
                side_in=257, stride=16, num_joints=19, depth=16,
                depth_range=1000.0)
    base.update(over)
    return types.SimpleNamespace(**base)


def _edge_pad(inputs, target):
    """Edge-pad every array's leading dim up to `target` by repeating the
    last row (static shapes -> one compiled program; the pad rows are
    sliced off by the caller). No-op when already >= target."""
    b = inputs[0].shape[0]
    if b >= target:
        return inputs
    return tuple(jnp.concatenate(
        [x, jnp.repeat(x[-1:], target - b, axis=0)]) for x in inputs)


class Predictor:
    """Fixed-shape, jit-compiled pose predictor for one model variant.

    With `mesh` (a jax.sharding Mesh with a 'data' axis, e.g.
    `parallel.make_mesh(n)`), serving runs data-parallel: crops shard over
    'data', weights replicate, and GSPMD partitions the forward+decode —
    the whole pipeline is batch-elementwise, so DP inference needs no
    collectives and scales linearly over chips. Ragged batches are padded
    to the mesh's data extent and sliced back."""

    def __init__(self, args, variant='rgb', variables=None, batch_size=8,
                 mesh=None):
        self.args = args
        self.variant = variant
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if 'data' not in mesh.axis_names:
                raise ValueError(f'serving mesh needs a "data" axis, got '
                                 f'{mesh.axis_names}')
            if jax.process_count() > 1:
                raise ValueError(
                    'mesh serving is single-process (requests arrive at one '
                    'host): under jax.distributed, give each process its '
                    'own Predictor over its local devices and route '
                    'requests per host')
            self._ndata = mesh.shape['data']
            if batch_size % self._ndata:
                raise ValueError(f'batch_size {batch_size} must divide over '
                                 f'the {self._ndata}-way data axis')
            self._rep = NamedSharding(mesh, P())
            self._shard = NamedSharding(mesh, P('data'))
        self._placed = None                  # mesh-replicated weights cache
        self.model = build_model(args, variant)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(0),
                *self._sample_inputs(1), train=False)
        self.variables = variables           # float originals, always
        self._quant_scales = None            # set by quantize()
        self._quant_skip = quant.DEFAULT_SKIP
        self._quant_wscales = None           # per-channel weight scales
        self._quant_acc = jnp.int32          # conv output dtype (quantize())
        self._quant_variables = None         # int8-kernel serving copy
        self._forward = jax.jit(self._forward_impl)

    def _sample_inputs(self, b):
        s = self.args.side_in
        if self.variant in ('fusion', 'partial_fusion'):
            return (jnp.ones((b, s, s, 3)), jnp.ones((b, s, s, 1)))
        in_ch = 1 if getattr(self.args, 'depth_only', False) else 3
        if self.variant == 'rgb' and getattr(self.args, 'extra_channel',
                                             False):
            in_ch = 4
        return (jnp.ones((b, s, s, in_ch)),)

    @classmethod
    def from_checkpoint(cls, path, args, variant='rgb', batch_size=8,
                        mesh=None):
        """Load a model_<E>.pth (ours or reference-converted)."""
        blob = load_torch_file(path)
        state_dict = blob['model'] if isinstance(blob, dict) and 'model' in blob else blob
        predictor = cls(args, variant, None, batch_size, mesh=mesh)
        predictor.variables = variables_from_torch(
            jax.device_get(predictor.variables), state_dict, verbose=False)
        return predictor

    @property
    def serve_variables(self):
        """What the jitted forward runs with: the prequantized int8-kernel
        copy after quantize(), the float originals otherwise — placed on
        device ONCE and cached. Without the cache, numpy-leaved weight
        trees (Predictor.from_checkpoint converts on host) would re-upload
        the full checkpoint on every request."""
        v = (self._quant_variables if self._quant_variables is not None
             else self.variables)
        if self._placed is None or self._placed[0] is not v:
            placed = (jax.device_put(v, self._rep) if self.mesh is not None
                      else jax.device_put(v))
            self._placed = (v, placed)
        return self._placed[1]

    def _place_inputs(self, inputs):
        """Edge-pad a ragged leading dim up to the configured batch_size —
        ONE program shape serves every partial batch (each distinct padded
        size would otherwise compile its own program: 3-8 min per shape
        through a remote transport), and the AOT executable covers them
        all — then shard over the mesh's data axis when meshed. Oversized
        batches keep their own (data-axis-padded) shape.
        Returns (inputs, real_batch)."""
        b = inputs[0].shape[0]
        inputs = _edge_pad(inputs, self.batch_size)
        if self.mesh is None:
            return inputs, b
        bp = inputs[0].shape[0]
        inputs = _edge_pad(inputs, -(-bp // self._ndata) * self._ndata)
        return tuple(jax.device_put(x, self._shard) for x in inputs), b

    def _model_apply(self, variables, inputs):
        apply_fn = lambda *ins: self.model.apply(variables, *ins, train=False)
        if self._quant_scales is not None:
            apply_fn = quant.quantized_call(apply_fn, self._quant_scales,
                                            self._quant_skip,
                                            self._quant_wscales,
                                            self._quant_acc)
        return apply_fn(*inputs)

    def _serve_dtype(self):
        """ONE dtype policy for the serving forward, the calibration
        forward and weight prequantization — three sites that must agree
        or calibration silently diverges from what it calibrates for."""
        return jnp.bfloat16 if self.args.half_acc else jnp.float32

    def _cast_floats(self, tree):
        dtype = self._serve_dtype()
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def _forward_impl(self, variables, *inputs):
        cast = self._cast_floats
        out = self._model_apply(
            {'params': cast(variables['params']),
             'batch_stats': variables['batch_stats']},
            [cast(x) for x in inputs])
        if self.variant == 'rgb' and self.args.joint_space:
            cam_feat, mat_feat = out
        elif self.variant == 'rgb':
            cam_feat, mat_feat = out, None
        else:
            cam_feat, mat_feat = out[0], None
        cam_feat = cam_feat.astype(jnp.float32)
        hm = heatmap.to_heatmap3d(cam_feat, self.args.depth,
                                  self.args.num_joints)
        relat = heatmap.decode3d(hm, self.args.depth_range)
        key = 0
        relat = relat - relat[:, key:key + 1]  # root set by caller's key_index
        result = {'relat_cam': relat}
        if mat_feat is not None:
            mat_feat = mat_feat.astype(jnp.float32)
            hm2 = heatmap.to_heatmap2d(mat_feat, self.args.num_joints)
            result['spec_mat'] = heatmap.decode2d(hm2, self.args.side_in)
        return result

    def _run(self, inputs):
        """One forward on placed inputs: the AOT executable when it exists
        and the (padded) batch matches its compiled shape, else the jit —
        otherwise aot_compile + predict_crops would compile the identical
        program twice (3-8 min each through a remote transport)."""
        compiled = getattr(self, '_compiled', None)
        if compiled is not None and inputs[0].shape[0] == self.batch_size:
            return compiled(self.serve_variables, *inputs)
        return self._forward(self.serve_variables, *inputs)

    def predict_crops(self, *inputs):
        """Root-relative 3D (and 2D when joint_space) for prepared crops."""
        inputs, b = self._place_inputs(tuple(jnp.asarray(x) for x in inputs))
        out = self._run(inputs)
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[:b], out)

    def predict_absolute(self, crops, intrinsics, key_index=0):
        """Absolute camera-space joints via the least-squares root
        reconstruction (requires joint_space; utils.get_deter_cam semantics,
        utils.py:296-332)."""
        inputs, b = self._place_inputs((jnp.asarray(crops),))
        out = self._run(inputs)
        if 'spec_mat' not in out:
            raise ValueError('predict_absolute requires a joint_space model')
        # slice padding off before the root solve: intrinsics has one row
        # per REAL sample
        out = jax.tree_util.tree_map(lambda a: a[:b], out)
        relat = out['relat_cam'] - out['relat_cam'][:, key_index:key_index + 1]
        absolute = recon.recon_root(out['spec_mat'], relat,
                                    jnp.asarray(intrinsics))
        return np.asarray(absolute)

    def make_calibrator(self):
        """Streaming N-batch calibration (quant.Calibrator): feed request
        batches as they arrive with `cal.update(inputs)` (inputs in
        `predict_crops` form), then switch to int8 once with
        `quantize_with_scales(cal.scales)` — one recording compile total,
        vs one per batch if `quantize([batch])` were called repeatedly."""
        cast = self._cast_floats
        variables = {'params': cast(jax.tree_util.tree_map(
            jnp.asarray, self.variables['params'])),
            'batch_stats': self.variables['batch_stats']}
        apply_fn = lambda *ins: self.model.apply(
            variables, *cast([jnp.asarray(x) for x in ins]), train=False)
        return quant.Calibrator(apply_fn)

    def quantize(self, calib_batches, skip=quant.DEFAULT_SKIP,
                 acc_dtype=jnp.int32):
        """Switch the serving forward to int8 convs (pose_tpu.quant): ~2x
        MXU rate on TPU for the conv trunk, with activation scales
        calibrated from `calib_batches` — an iterable of input tuples of
        the same form `predict_crops` takes (single-input variants may pass
        bare arrays). Regressor heads stay bf16 by default (`skip`).

        Returns the calibrated {conv_path: absmax} so deployments can
        persist it (quant.save_scales / load_scales) and re-apply with
        `quantize_with_scales` instead of re-calibrating."""
        cal = self.make_calibrator()
        for b in calib_batches:
            cal.update(b if isinstance(b, (tuple, list)) else (b,))
        self.quantize_with_scales(cal.scales, skip, acc_dtype)
        return cal.scales

    def quantize_with_scales(self, scales, skip=quant.DEFAULT_SKIP,
                             acc_dtype=jnp.int32):
        """Apply previously calibrated activation scales (see quantize).

        Weights are quantized ONCE here (quant.prequantize_params) into
        `serve_variables`, which the jitted forward runs with: the live
        path passes params as jit ARGUMENTS, so leaving quantization to the
        interceptor would re-run abs-max/round/clip over every kernel on
        every call. `self.variables` keeps the float originals (sharable
        with other Predictors, re-quantizable with a new skip list)."""
        self._quant_scales = dict(scales)
        self._quant_skip = tuple(skip)
        self._quant_acc = acc_dtype
        qparams, self._quant_wscales = quant.prequantize_params(
            self.variables['params'], self._quant_scales, self._quant_skip,
            self._serve_dtype())
        self._quant_variables = {'params': qparams,
                                 'batch_stats': self.variables['batch_stats']}
        # fresh jit wrapper: the old one cached the bf16 trace
        self._forward = jax.jit(self._forward_impl)
        if hasattr(self, '_compiled'):
            del self._compiled               # stale AOT executable
        return self

    def aot_compile(self):
        """Ahead-of-time compile the forward for the configured batch size;
        predict_crops / predict_absolute / BatchingServer reuse the
        executable for every batch-size-shaped (incl. padded-ragged) call,
        so first-request latency is paid here exactly once. Idempotent."""
        compiled = getattr(self, '_compiled', None)
        if compiled is not None:
            return compiled
        inputs, _ = self._place_inputs(self._sample_inputs(self.batch_size))
        lowered = jax.jit(self._forward_impl).lower(self.serve_variables,
                                                    *inputs)
        self._compiled = lowered.compile()
        return self._compiled

    def export_artifact(self, path):
        """Serialize the whole predict graph (weights baked in as
        constants, decode included) as a self-contained jax.export
        artifact at the configured batch size. The artifact loads and
        runs WITHOUT the framework or model code — the deployment-handoff
        analogue of a TF SavedModel; the reference has no deployment
        path at all."""
        from jax import export as jax_export
        variables = jax.device_get(self.serve_variables)

        def predict(*inputs):
            return self._forward_impl(variables, *inputs)

        shapes = tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype)
            for x in self._sample_inputs(self.batch_size))
        exported = jax_export.export(jax.jit(predict))(*shapes)
        with open(path, 'wb') as f:
            f.write(exported.serialize())
        return path

    @staticmethod
    def load_artifact(path):
        """Load an export_artifact file; returns a callable
        `fn(*inputs) -> {'relat_cam', ...}` usable with no model code."""
        from jax import export as jax_export
        with open(path, 'rb') as f:
            exported = jax_export.deserialize(f.read())
        return exported.call


class ArtifactPredictor:
    """Predictor-surface wrapper around an export_artifact file.

    Exposes `batch_size` / `predict_crops` / `aot_compile` / `_compiled`
    so `BatchingServer` and `predict.py` run from the self-contained
    artifact with no model code or checkpoint on hand — the deployment
    handoff is a single file. The batch size and input shapes are baked
    into the artifact (read back from `in_avals`).

    With `mesh` (a 'data'-axis Mesh, e.g. `parallel.make_mesh(n)`), the
    imported graph serves data-parallel: inputs shard over 'data' and
    GSPMD partitions the deserialized StableHLO — the baked-in weights
    are constants, so they replicate, and the forward+decode is
    batch-elementwise, so DP needs no collectives. The artifact's baked
    batch size must divide over the data axis."""

    def __init__(self, path, mesh=None):
        from jax import export as jax_export
        with open(path, 'rb') as f:
            self._exported = jax_export.deserialize(f.read())
        self.in_shapes = tuple(tuple(a.shape)
                               for a in self._exported.in_avals)
        self.out_shapes = tuple(tuple(a.shape)
                                for a in self._exported.out_avals)
        self.batch_size = self.in_shapes[0][0]
        self.variables = None               # weights live in the artifact
        self.serve_variables = None
        self.mesh = mesh
        self._shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if 'data' not in mesh.axis_names:
                raise ValueError(f'serving mesh needs a "data" axis, got '
                                 f'{mesh.axis_names}')
            if jax.process_count() > 1:
                raise ValueError(
                    'mesh serving is single-process (requests arrive at one '
                    'host): under jax.distributed, give each process its '
                    'own ArtifactPredictor over its local devices')
            ndata = mesh.shape['data']
            if self.batch_size % ndata:
                raise ValueError(
                    f'artifact batch size {self.batch_size} (baked at '
                    f'export) must divide over the {ndata}-way data axis')
            self._shard = NamedSharding(mesh, P('data'))
            self._call = jax.jit(
                self._exported.call,
                in_shardings=(self._shard,) * len(self.in_shapes))
        else:
            self._call = jax.jit(self._exported.call)

    def aot_compile(self):
        return self._call

    def _compiled(self, variables, *inputs):
        del variables                       # Predictor._compiled signature
        return self._call(*inputs)

    def _place_inputs(self, inputs):
        """Predictor surface: edge-pad a ragged batch up to the artifact's
        BAKED batch size (the exported program has exactly one shape) and
        report the real row count; larger batches are a loud error. With a
        mesh, also shard over 'data'."""
        b = inputs[0].shape[0]
        if b > self.batch_size:
            raise ValueError(
                f'batch of {b} rows exceeds the artifact\'s baked batch '
                f'size {self.batch_size} — chunk requests (or re-export '
                'with a larger batch_size)')
        inputs = _edge_pad(inputs, self.batch_size)
        if self._shard is not None:
            inputs = tuple(jax.device_put(jnp.asarray(x), self._shard)
                           for x in inputs)
        return inputs, b

    def predict_crops(self, *inputs):
        inputs, b = self._place_inputs(tuple(jnp.asarray(x)
                                             for x in inputs))
        out = self._call(*inputs)
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[:b], out)


class BatchingServer:
    """Request batching/queueing in front of a Predictor (VERDICT round-2
    item 10): single-crop requests are micro-batched up to the predictor's
    compiled batch size (or until `max_delay_ms` passes), padded to the
    fixed shape, run through one AOT-compiled forward, and resolved through
    per-request futures. One device program shape -> no recompiles, and the
    device sees full batches under load instead of batch-1 calls.

        server = BatchingServer(predictor, max_delay_ms=5.0)
        fut = server.submit(crop)              # (side_in, side_in, C)
        coords = fut.result()['relat_cam']     # (J, 3)
        server.stop()
    """

    def __init__(self, predictor, max_delay_ms=5.0, queue_size=1024):
        self.predictor = predictor
        self.batch_size = predictor.batch_size
        self.max_delay = max_delay_ms / 1000.0
        self._queue = queue_lib.Queue(maxsize=queue_size)
        self._stopping = False
        # guards the (check _stopping, enqueue) pair in submit() against
        # stop(): without it a submit could land its item BEHIND the stop
        # sentinel, the worker would exit first, and that request's future
        # would never resolve (caller hangs forever on fut.result())
        self._lock = threading.Lock()
        self.served = 0
        self.batches = 0
        predictor.aot_compile()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, crop):
        """Enqueue one crop; returns a Future resolving to the predictor's
        output dict with the batch dimension stripped."""
        item = (np.asarray(crop), Future())
        with self._lock:
            if self._stopping:
                raise RuntimeError('server is stopped')
            self._queue.put(item)
        return item[1]

    def predict(self, crop, timeout=None):
        """Blocking single-request convenience wrapper."""
        return self.submit(crop).result(timeout)

    def stop(self):
        with self._lock:
            if self._stopping:        # idempotent (context-manager + manual)
                return
            self._stopping = True
            self._queue.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

    def _collect(self):
        """Block for the first request, then drain up to batch_size-1 more
        within the latency budget."""
        item = self._queue.get()
        if item is None:
            return None
        items = [item]
        deadline = time.monotonic() + self.max_delay
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue_lib.Empty:
                break
            if nxt is None:
                self._queue.put(None)   # re-post the sentinel for next round
                break
            items.append(nxt)
        return items

    def _worker(self):
        while True:
            items = self._collect()
            if items is None:
                return
            n = len(items)
            try:
                # re-resolve the executable per batch: a live
                # predictor.quantize() drops the stale float AOT program
                # (quantize_with_scales), so the next batch recompiles
                # int8 instead of wedging every future with an aval
                # mismatch against int8 serve_variables
                compiled = getattr(self.predictor, '_compiled', None)
                if compiled is None:
                    compiled = self.predictor.aot_compile()
                # assembly is inside the try: a malformed request (wrong
                # crop shape, non-array) must resolve the batch's futures
                # with the error, not kill the worker thread and wedge
                # every later submit()
                crops = np.stack([c for c, _ in items])
                batch, _ = self.predictor._place_inputs(
                    (jnp.asarray(crops),))   # pads ragged to batch_size
                try:
                    out = compiled(self.predictor.serve_variables, *batch)
                except Exception:
                    # a live quantize() can swap serve_variables between
                    # the executable snapshot above and this call (the
                    # re-resolve comment only covers quantize landing
                    # BEFORE the snapshot): re-resolve once and retry
                    # before failing the whole batch
                    compiled = self.predictor.aot_compile()
                    out = compiled(self.predictor.serve_variables, *batch)
                host = jax.tree_util.tree_map(np.asarray, out)
                for i, (_, fut) in enumerate(items):
                    fut.set_result(jax.tree_util.tree_map(
                        lambda a, i=i: a[i], host))
            except Exception as e:               # resolve, don't wedge
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            self.served += n
            self.batches += 1


def preprocess_frames(frames, homographies, extents, side_in):
    """Full-frame -> network-input crops on device (no augmentation), for
    serving pipelines that feed raw camera frames plus per-frame crop
    homographies."""
    return augment.process_color_batch(
        jnp.asarray(frames), jnp.asarray(homographies), jnp.asarray(extents),
        jax.random.PRNGKey(0), side_in, False, False, mxu_warp=True)
