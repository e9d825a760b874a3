"""Host data loader feeding the on-device preprocessing pipeline.

Replaces the reference's torch DataLoader + per-sample cv2 hot loop
(datasets.py:22-154, depth_datasets.py:23-263). Per sample, the host only:
decodes the image, draws flip/zoom, synthesizes the crop camera (3x3 math)
and transforms the GT joints. Pixels ship as zero-padded uint8 canvases; the
batched warp + photometric chain + normalization run as one jitted program on
the TPU (pose_tpu.data.augment), and batches are sharded over the mesh before
augmentation so preprocessing scales with the data-parallel axis.

Randomness: flip/zoom are drawn from a numpy RandomState seeded per
(seed, epoch, index) — reproducible and worker-count independent; the
on-device colour chain consumes jax.random keys folded per batch. The same
flip/zoom draw is shared between the RGB and depth modalities of one sample
(depth_datasets.py:203-208).

The joint-space dataset variant (true 2D coords + intrinsics) is
reconstructed from the trainer's expectations (train.py:67, :218) since the
reference snapshot never produces it — SURVEY.md §7 item 5.
"""

import os
import queue
import threading

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..geometry import camera as cameralib
from ..geometry import funcam
from ..parallel import make_mesh, shard_batch
from . import augment, crop, samples as sample_lib


def imread(path):
    """matplotlib.image.imread semantics (datasets.py:118): PNG -> float32 in
    [0, 1] (16-bit scaled by 65535), everything else -> uint8."""
    with Image.open(path) as img:
        arr = np.asarray(img)
    if os.path.splitext(path)[1].lower() == '.png':
        if arr.dtype == np.uint16 or arr.dtype == np.int32:
            return arr.astype(np.float32) / 65535.0
        return arr.astype(np.float32) / 255.0
    return arr


def condition_image(image):
    """Normalize an imread result to HxWx3 uint8 RGB (gray replicated,
    alpha stripped, PNG floats rescaled) — the parse-time conditioning of
    the reference's matplotlib reads (datasets.py:118-121)."""
    if image.ndim == 2:
        image = image[..., None].repeat(3, axis=-1)
    image = image[..., :3]
    if image.dtype != np.uint8:
        image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    return image


def attention_map(side_in, stride, image_coords, attention):
    """Host replica of utils.get_attention (utils.py:14-42)."""
    side_out = (side_in - 1) // stride + 1
    if not attention:
        return np.ones((1, side_out, side_out), np.float32)
    cx, cy = np.meshgrid(np.arange(side_out), np.arange(side_out))
    cx = np.expand_dims(cx, -1)
    cy = np.expand_dims(cy, -1)
    dist_x = cx - image_coords[:, 0] / (side_in / side_out)
    dist_y = cy - image_coords[:, 1] / (side_in / side_out)
    radial = np.exp(-(dist_x ** 2 + dist_y ** 2) / 5.0).sum(axis=-1)
    radial = radial / np.amax(radial)
    return radial[None].astype(np.float32)


class PoseLoader:
    """RGB loader (reference Dataset, datasets.py:36-154).

    Yields dict batches with device-resident, mesh-sharded arrays:
      train: image, true_cam, true_val [+ true_mat, intrinsics]
      test:  + back_rotation (host numpy)
    """

    def __init__(self, args, phase, data_info, samples=None, mesh=None,
                 canvas=None, seed=0):
        assert len(data_info.short_names) == args.num_joints
        self.args = args
        self.phase = phase
        self.data_info = data_info
        self.at_test = phase != 'train'
        # mirror the trainer's mesh shape (-mesh_spatial folds a 'space'
        # axis): batch placement is P('data') either way, but matching
        # meshes make the trainer's shard_batch a no-op instead of a
        # per-batch cross-device copy of the warped images
        assert (mesh is None or getattr(args, 'mesh_spatial', 1) <= 1
                or 'space' in mesh.axis_names), (
            '-mesh_spatial %d was requested but the loader received an '
            'explicit mesh without a space axis — pass the trainer mesh '
            'or build one with make_mesh(n, spatial=...)'
            % args.mesh_spatial)
        self.mesh = mesh if mesh is not None else make_mesh(
            args.n_cudas, spatial=getattr(args, 'mesh_spatial', 1))

        if samples is None:
            metadata = sample_lib.load_metadata(args)
            root = metadata['root'][args.data_name]
            samples = sample_lib.get_samples(args.data_name, root, phase)
        self.samples = samples

        self.side_in = args.side_in
        self.colour = args.colour and (not self.at_test)
        self.geometry = args.geometry and (not self.at_test)
        self.eraser = args.eraser and (not self.at_test)
        self.occluder = args.occluder and (not self.at_test)
        self.random_zoom = args.random_zoom
        self.joint_space = getattr(args, 'joint_space', False)
        self.extra_channel = getattr(args, 'extra_channel', False)
        self.batch_size = args.batch_size
        self.shuffle = args.shuffle and (not self.at_test)
        self.seed = seed
        self.epoch = 0
        # -save_every mid-epoch resume: index of the first batch the NEXT
        # iteration should yield (one-shot; see __iter__)
        self.start_batch = 0

        self.canvas = canvas or (512, 512)
        # POSE_TPU_WARP=split|mxu|gather|pallas_banded selects the train-time
        # resampler. Default on TPU is the two-stage split warp (prescale +
        # banded residual, ops/warp.py warp_batch_split) with per-batch
        # fallback to mxu when split_band_ok rejects the homographies;
        # elsewhere the exact single-pass mxu path (XLA:CPU has no Pallas,
        # and the cv2-golden tests pin the single-pass semantics).
        # POSE_TPU_EVAL_WARP selects the eval-time resampler. 'gather' is
        # strictly cv2-parity (reference remap semantics cameralib.py:696-
        # 707); 'mxu' is the two-pass matmul path — 3.1x faster on chip
        # (294 -> 921 img/s at bs64/512², docs/ROUND2_NOTES.md item 8) at a
        # measured 0.17 mm cam_mean delta on a 469 mm metric. On TPU the
        # fast path is the default; `-strict_eval` (or the env var) opts
        # back into the gather path: coordinate-exact vs cv2 (identical
        # lookup locus) with float interpolation — cv2's uint8 output
        # rounding is the one remaining deviation, measured at 22.6 um
        # cam_mean (tests/test_eval_parity.py). Off-TPU gather stays the
        # default: the speed motive is TPU-only and the CPU test suite pins
        # cv2 parity.
        default_impl = 'split' if jax.default_backend() == 'tpu' else 'mxu'
        self.warp_impl = os.environ.get('POSE_TPU_WARP', default_impl)
        default_eval = ('gather' if (getattr(args, 'strict_eval', False)
                                     or jax.default_backend() != 'tpu')
                        else 'mxu')
        self.eval_warp_impl = os.environ.get('POSE_TPU_EVAL_WARP',
                                             default_eval)

        # native C++ decode pool (threaded libjpeg, native/pose_loader.cc);
        # falls back to PIL per-sample decode when unavailable
        self._native = None
        try:
            from .native_loader import NativeImageLoader
            self._native = NativeImageLoader(self.canvas,
                                             num_threads=max(args.workers, 1))
        except Exception:
            pass

        self._occ_bank = None
        if self.occluder and args.occ_path:
            from ..ops.occluder import load_occluder_bank
            self._occ_bank = load_occluder_bank(args.occ_path, args.occ_count)

    def __len__(self):
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self.epoch = epoch

    # ------------------------------------------------------------ per sample

    def _rng(self, index):
        return np.random.RandomState(
            (self.seed * 1000003 + self.epoch * 9176 + index) % (2 ** 31))

    def parse_sample(self, sample, index, decode=True):
        rng = self._rng(index)
        do_flip = (not self.at_test) and (rng.rand() < 0.5)
        random_zoom = rng.uniform(self.random_zoom, self.random_zoom ** (-1))

        cam = sample['camera']
        new_cam, matrices = crop.build_crop(cam, sample['bbox'], self.side_in,
                                            do_flip, random_zoom,
                                            self.geometry)

        camera_coords, valid, back_rotate = crop.transform_gt(
            cam, new_cam, sample['skeleton'], sample['valid'],
            self.data_info.mirror, do_flip, self.at_test)

        # undistorted sources carry a single homography (the MXU fast path);
        # distorted sources carry the general-lookup triple
        # (cameralib.py:408-433 analogue, ops/warp.py:warp_single_distorted)
        out = dict(true_cam=camera_coords, true_val=valid.astype(bool))
        out.update(matrices)
        if self.extra_channel:
            bx, by, bw, bh = np.asarray(sample['bbox'], np.float32)
            corners = np.array([[bx, by], [bx + bw, by],
                                [bx + bw, by + bh], [bx, by + bh]], np.float32)
            out['bbox_quad'] = cameralib.reproject_points(
                corners, cam, new_cam).astype(np.float32)
        if decode:
            image = condition_image(imread(sample['image']))
            canvas, extent, prescale = crop.pad_to_canvas(image, self.canvas)
            out['canvas'] = canvas
            out['extent'] = extent
            crop.scale_lookup(out, prescale)
        else:
            out['image_path'] = sample['image']
        if self.joint_space:
            out['true_mat'] = new_cam.camera_to_image(
                camera_coords).astype(np.float32)
            out['intrinsics'] = new_cam.intrinsic_matrix.astype(np.float32)
        if back_rotate is not None:
            out['back_rotation'] = back_rotate.astype(np.float32)
        return out

    # -------------------------------------------------------------- batching

    def _order(self):
        order = np.arange(len(self.samples))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        return order

    def _draws(self, idxs):
        """Per-sample flip/zoom draws, identical to parse_sample's RNG use."""
        flips, zooms = [], []
        for i in idxs:
            rng = self._rng(int(i))
            flips.append((not self.at_test) and bool(rng.rand() < 0.5))
            zooms.append(rng.uniform(self.random_zoom,
                                     self.random_zoom ** (-1)))
        return np.asarray(flips, bool), np.asarray(zooms, np.float32)

    def parse_batch(self, idxs):
        """All non-pixel per-sample work for a batch, vectorized: one funcam
        call chain builds every crop camera, homography and GT transform at
        once (the reference runs this per sample inside DataLoader workers,
        datasets.py:124-146). Returns (batch dict, image paths).

        If any sample's source camera is distorted, the whole batch uses the
        general-lookup triple (funcam.stack pads pinhole samples with zero
        coefficients, under which the general warp equals the homography
        warp exactly)."""
        samples = [self.samples[int(i)] for i in idxs]
        flips, zooms = self._draws(idxs)
        cams = funcam.stack([s['camera'].arrays() for s in samples])
        bboxes = np.stack([np.asarray(s['bbox'], np.float32)
                           for s in samples])
        new_cams, matrices = crop.build_crop_batch(
            cams, bboxes, self.side_in, flips, zooms, self.geometry)

        coords, valid, back = crop.transform_gt_batch(
            cams, new_cams,
            np.stack([s['skeleton'] for s in samples]),
            np.stack([s['valid'] for s in samples]),
            self.data_info.mirror, flips, self.at_test)

        out = dict(true_cam=coords, true_val=valid.astype(bool))
        out.update(matrices)
        if self.extra_channel:
            corners = np.stack([
                bboxes[:, :2],
                bboxes[:, :2] + bboxes[:, 2:] * [1, 0],
                bboxes[:, :2] + bboxes[:, 2:],
                bboxes[:, :2] + bboxes[:, 2:] * [0, 1]], axis=1)
            out['bbox_quad'] = funcam.reproject_pixels(
                corners.astype(np.float32), cams, new_cams)
        if self.joint_space:
            out['true_mat'] = funcam.project(new_cams, coords)
            out['intrinsics'] = new_cams.kmat.astype(np.float32)
        if back is not None:
            out['back_rotation'] = back
        return out, [s['image'] for s in samples]

    @staticmethod
    def _scale_lookup_batch(batch, prescales, key=None):
        """Vectorized crop.scale_lookup over per-sample (sy, sx) decode
        prescales (shape (B, 2)). `key` names the lookup matrix to fold
        the prescale into (default: the colour stream's
        homography/intrinsics)."""
        if not np.any(prescales != 1.0):
            return
        if key is None:
            key = 'homography' if 'homography' in batch else 'old_intrinsics'
        batch[key] = np.array(batch[key], np.float32)
        batch[key][:, 0] *= prescales[:, 1, None]    # x-row by sx
        batch[key][:, 1] *= prescales[:, 0, None]    # y-row by sy

    def _decode_images(self, paths, canvas_hw, native_pool, grayscale=False):
        """Decode a batch of images onto fixed canvases: the native C++
        pools (JPEG for colour, PNG for the grayscale depth stream), PIL
        per sample otherwise."""
        exts = ('.png',) if grayscale else ('.jpg', '.jpeg')
        if native_pool is not None and all(
                p.lower().endswith(exts) for p in paths):
            return native_pool.decode_batch(paths)
        canvases, extents, prescales = [], [], []
        for path in paths:
            image = imread(path)
            if grayscale:
                if image.ndim == 3:
                    image = image[..., 0]
                image = image[..., None].astype(np.float32)
            else:
                image = condition_image(image)
            cv, ext, pre = crop.pad_to_canvas(image, canvas_hw)
            canvases.append(cv)
            extents.append(ext)
            prescales.append(pre)
        return (np.stack(canvases), np.stack(extents),
                np.asarray(prescales, np.float32))

    def _decode_batch(self, idxs):
        """Per-batch host work: vectorized camera/GT math + image decode."""
        batch, paths = self.parse_batch(idxs)
        canvases, extents, prescales = self._decode_images(
            paths, self.canvas, self._native)
        batch['canvas'] = canvases
        batch['extent'] = np.asarray(extents)
        self._scale_lookup_batch(batch, np.asarray(prescales, np.float32))
        return batch

    def _gated_impl(self, homographies, src_hw=None):
        """Per-batch resampler choice: the banded implementations carry
        host-side support gates and fall back to the exact mxu path when a
        batch's homographies violate them. Call with the HOST (numpy)
        homographies before shard_batch — gating on the device copy would
        force a device->host fetch (and through a remote transport, a full
        sync) on every training batch. `src_hw` is the source-canvas shape
        the banded gate validates against (defaults to the colour canvas;
        the depth stream passes its own)."""
        impl = self.eval_warp_impl if self.at_test else self.warp_impl
        gated = impl in ('pallas_banded', 'split', 'split_mxu')
        if impl == 'pallas_banded':
            from ..ops.warp_pallas import band_ok_v2
            if not band_ok_v2(np.asarray(homographies),
                              src_hw or self.canvas,
                              (self.side_in, self.side_in)):
                impl = 'mxu'
        elif impl in ('split', 'split_mxu'):
            from ..ops.warp import split_band_ok
            if not split_band_ok(np.asarray(homographies),
                                 (self.side_in, self.side_in)):
                impl = 'mxu'
        if gated and jax.process_count() > 1:
            # cluster mode: each process gated only its LOCAL rows, but
            # every process must jit the SAME program over the global
            # batch. Both gates are all-rows predicates, so the global
            # decision is the AND of the local ones — one tiny allgather
            # reproduces the single-process gate exactly (requires the
            # same POSE_TPU_WARP env on every host).
            from jax.experimental import multihost_utils
            ok_here = np.int32(impl != 'mxu')
            if not multihost_utils.process_allgather(ok_here).all():
                impl = 'mxu'
        return impl

    def _data_extent(self):
        """Rows required for P('data') placement: the mesh's data-axis
        size — NOT the device count, since a -mesh_spatial 'space' axis
        replicates batch rows rather than consuming them."""
        return dict(self.mesh.shape).get('data', self.mesh.devices.size)

    def _pad_to_mesh(self, batch, true_n=None, offset=0):
        n = len(batch['canvas'])
        if jax.process_count() > 1:
            # multi-process: _shard_indices already padded the GLOBAL batch
            # to the mesh size and handed this process its contiguous block;
            # here only the padded global rows (position >= true_n) that
            # landed in this block get their loss/metric weight cleared
            if offset + n > true_n:
                keep = max(true_n - offset, 0)
                batch['true_val'] = np.array(batch['true_val'])
                batch['true_val'][keep:] = False
            return batch, true_n
        m = self._data_extent()
        if n % m == 0:
            return batch, n
        pad = m - n % m
        out = {}
        for k, v in batch.items():
            reps = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
            out[k] = reps
        out['true_val'][n:] = False  # padded rows carry no loss/metric weight
        return out, n

    def _shard_indices(self, batches):
        """Multi-process batch slicing: every process builds the SAME global
        index order (seeded shuffle), pads each global batch to the mesh's
        data-axis extent by repeating the last index (the per-sample RNG is
        keyed on the sample index, so a repeated index reproduces the
        single-process padded row bit-exactly), and takes its contiguous
        block — the block shard_batch reassembles into the global array.
        Returns (local_batches, [(global_true_n, local_offset), ...])."""
        nproc = jax.process_count()
        if nproc == 1:
            return batches, [(None, 0)] * len(batches)
        m = self._data_extent()
        rank = jax.process_index()
        local_batches, meta = [], []
        for idxs in batches:
            true_n = len(idxs)
            padded = ((true_n + m - 1) // m) * m
            idxs = np.concatenate(
                [idxs, np.repeat(idxs[-1:], padded - true_n)])
            loc = padded // nproc
            off = rank * loc
            local_batches.append(idxs[off:off + loc])
            meta.append((true_n, off))
        return local_batches, meta

    def _pop_host_extras(self, batch, true_n):
        """Pull host-side (never-sharded) per-batch arrays out of the batch
        before device dispatch."""
        host_extras = {}
        for k in ('back_rotation',):
            if k in batch:
                v = batch.pop(k)
                # multi-process: keep every local row (equal shapes across
                # processes for the engine's process_allgather); the engine
                # trims the gathered global array to _true_size
                host_extras[k] = v if jax.process_count() > 1 else v[:true_n]
        return host_extras

    def _colour_stream(self, batch, key):
        """Colour canvases -> augmented crops, shared by the RGB and depth
        loaders: the distorted-source general lookup, the occluder
        compositing path, or the gated split/MXU/gather warp."""
        if 'partial_homography' in batch:
            # distorted-source batch: general per-pixel lookup
            device = shard_batch(self.mesh, {
                'canvas': batch.pop('canvas'),
                'partial': batch.pop('partial_homography'),
                'old_k': batch.pop('old_intrinsics'),
                'dist': batch.pop('dist_coeffs'),
                'extent': batch.pop('extent')})
            return augment.process_color_batch_general(
                device['canvas'], device['partial'], device['old_k'],
                device['dist'], device['extent'], key, self.side_in,
                self.colour, self.eraser,
                occ_bank=self._occ_bank)
        host_homs = batch['homography']
        device = shard_batch(self.mesh, {
            'canvas': batch.pop('canvas'),
            'homography': batch.pop('homography'),
            'extent': batch.pop('extent')})
        if self._occ_bank is not None:
            sprites, alphas, shapes = self._occ_bank
            return augment.process_color_batch_occluded(
                device['canvas'], device['homography'], device['extent'],
                key, sprites, alphas, shapes, self.side_in, self.colour,
                self.eraser)
        # train uses the configured resampler (default: MXU two-pass);
        # eval defaults to the gather path for strict cv2 parity
        return augment.process_color_batch(
            device['canvas'], device['homography'], device['extent'],
            key, self.side_in, self.colour, self.eraser,
            warp_impl=self._gated_impl(host_homs))

    def _finalize(self, batch, i_batch, true_n=None, offset=0):
        batch, true_n = self._pad_to_mesh(batch, true_n, offset)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + 7919 * self.epoch), i_batch)
        host_extras = self._pop_host_extras(batch, true_n)
        image = self._colour_stream(batch, key)

        if 'bbox_quad' in batch:
            quads = shard_batch(self.mesh, batch.pop('bbox_quad'))
            mask = augment.bbox_mask_channel(quads, self.side_in)
            image = jnp.concatenate([image, mask], axis=-1)

        out = dict(image=image)
        out.update(shard_batch(self.mesh, batch))
        out.update(host_extras)
        out['_true_size'] = true_n
        return out

    def __iter__(self):
        order = self._order()
        bs = self.batch_size
        batches = [order[i:i + bs] for i in range(0, len(order), bs)]
        batches, meta = self._shard_indices(batches)
        n_workers = max(getattr(self.args, 'workers', 1), 1)

        # mid-epoch resume (-save_every): one-shot fast-forward — skipped
        # batches are never decoded, and every batch keeps its ORIGINAL
        # index, so the per-batch fold_in key and every RNG draw are
        # identical to the uninterrupted epoch
        start = self.start_batch
        self.start_batch = 0

        if n_workers == 1:
            def produce(q):
                # a raising _decode_batch (e.g. one corrupt JPEG) must
                # surface in the consumer, not die silently in the daemon
                # thread and leave the training loop blocked on q.get()
                try:
                    for i_batch, idxs in enumerate(batches):
                        if i_batch < start:
                            continue
                        q.put((i_batch, self._decode_batch(idxs)))
                    q.put(None)
                except BaseException as e:
                    q.put(e)

            q = queue.Queue(maxsize=2)
            thread = threading.Thread(target=produce, args=(q,),
                                      daemon=True)
            thread.start()
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                i_batch, batch = item
                yield self._finalize(batch, i_batch, *meta[i_batch])
        else:
            # N producer threads build whole batches concurrently (the C++
            # decode pool and numpy release the GIL); a reorder buffer keeps
            # the epoch's batch order — and therefore every RNG draw —
            # identical to the single-producer stream. Reference analogue:
            # torch DataLoader num_workers (datasets.py:5), which the
            # 1-thread producer of round 1 could not match on many-core
            # hosts (VERDICT round-2 item 4).
            next_idx = [start]
            ready = {}
            lock = threading.Lock()
            avail = threading.Condition(lock)

            def produce():
                while True:
                    with lock:
                        # bound the reorder buffer so a fast worker cannot
                        # run ahead unboundedly
                        while (next_idx[0] < len(batches)
                               and len(ready) >= 2 * n_workers):
                            avail.wait()
                        i = next_idx[0]
                        if i >= len(batches):
                            return
                        next_idx[0] = i + 1
                    try:
                        batch = self._decode_batch(batches[i])
                    except BaseException as e:
                        # deliver the error at this batch's slot so the
                        # consumer raises instead of waiting forever
                        batch = e
                    with lock:
                        ready[i] = batch
                        avail.notify_all()
                        if isinstance(batch, BaseException):
                            return

            threads = [threading.Thread(target=produce, daemon=True)
                       for _ in range(n_workers)]
            for t in threads:
                t.start()
            for i_batch in range(start, len(batches)):
                with lock:
                    while i_batch not in ready:
                        avail.wait()
                    batch = ready.pop(i_batch)
                    avail.notify_all()
                if isinstance(batch, BaseException):
                    raise batch
                yield self._finalize(batch, i_batch, *meta[i_batch])

        if not self.at_test:
            self.epoch += 1


class DepthPoseLoader(PoseLoader):
    """Depth/fusion loader (reference depth Dataset,
    depth_datasets.py:59-263): runs the crop machinery twice per sample —
    once for RGB, once for the depth image with its own camera and depth_bbox
    sharing the same flip/zoom draw — and applies the enhance transform
    on device.
    """

    def __init__(self, args, phase, data_info, samples=None, mesh=None,
                 canvas=None, depth_canvas=None, seed=0, root=None):
        if samples is None or root is None:
            metadata = sample_lib.load_metadata(args)
            root = root or metadata['root'][args.data_name]
            if samples is None:
                samples = sample_lib.get_samples(args.data_name, root, phase)
        super().__init__(args, phase, data_info, samples, mesh, canvas, seed)
        self.root = root
        self.depth_canvas = depth_canvas or (424, 512)
        self._dnative = None
        try:
            from .native_loader import NativeDepthLoader
            self._dnative = NativeDepthLoader(self.depth_canvas,
                                              num_threads=max(args.workers, 1))
        except Exception:
            pass
        self.depth_cams = sample_lib.load_depth_cameras(args.data_name, root)
        self.do_teach = args.do_teach
        self.attention = args.attention
        self.stride = args.stride
        self.nexponent = args.nexponent
        self.apply_to_depth = args.to_depth
        self.enhance_thresh = 0.1 if args.data_name == 'ntu' else 0.5

    def parse_batch(self, idxs):
        """Vectorized depth-stack parse: the RGB and depth crop cameras share
        one flip/zoom draw per sample (depth_datasets.py:203-208); both go
        through build_crop_batch."""
        samples = [self.samples[int(i)] for i in idxs]
        flips, zooms = self._draws(idxs)
        cams = funcam.stack([s['camera'].arrays() for s in samples])
        depth_cams = [sample_lib.depth_cam_for(self.args.data_name,
                                               self.depth_cams, s)
                      for s in samples]
        dcams = funcam.stack([c.arrays() for c in depth_cams])

        new_cams, matrices = crop.build_crop_batch(
            cams, np.stack([np.asarray(s['bbox'], np.float32)
                            for s in samples]),
            self.side_in, flips, zooms, self.geometry)
        new_dcams, dmatrices = crop.build_crop_batch(
            dcams, np.stack([np.asarray(s['depth_bbox'], np.float32)
                             for s in samples]),
            self.side_in, flips, zooms, self.geometry)
        if 'homography' not in dmatrices:
            raise ValueError(
                'depth cameras are intrinsics-only in every reference store '
                '(get_depth_cams.py builds pinhole intrinsics); a distorted '
                'depth camera has no batched warp path')

        coords, valid, back = crop.transform_gt_batch(
            cams, new_cams,
            np.stack([s['skeleton'] for s in samples]),
            np.stack([s['valid'] for s in samples]),
            self.data_info.mirror, flips, self.at_test)

        out = dict(depth_homography=dmatrices['homography'],
                   depth_k_inv=np.linalg.inv(
                       dcams.kmat.astype(np.float64)).astype(np.float32),
                   true_cam=coords, true_val=valid.astype(bool))
        out.update(matrices)
        if back is not None:
            out['back_rotation'] = back
        elif self.do_teach:
            image_coords = funcam.project(new_cams, coords)
            out['atten_map'] = np.stack([
                attention_map(self.side_in, self.stride, image_coords[i],
                              self.attention) for i in range(len(samples))])
        paths = [s['image'] for s in samples]
        depth_paths = [sample_lib.depth_image_path(self.args.data_name,
                                                   self.root, s)
                       for s in samples]
        return out, paths, depth_paths

    def _decode_batch(self, idxs):
        """Per-batch host work: vectorized camera math; the C++ pools decode
        the colour JPEGs and the depth PNGs (PIL fallback per sample)."""
        batch, paths, depth_paths = self.parse_batch(idxs)
        canvases, extents, prescales = self._decode_images(
            paths, self.canvas, self._native)
        dcanvases, dextents, dprescales = self._decode_images(
            depth_paths, self.depth_canvas, self._dnative, grayscale=True)
        batch['canvas'] = canvases
        batch['extent'] = np.asarray(extents)
        self._scale_lookup_batch(batch, np.asarray(prescales, np.float32))
        batch['depth_canvas'] = dcanvases
        batch['depth_extent'] = np.asarray(dextents)
        self._scale_lookup_batch(batch, np.asarray(dprescales, np.float32),
                                 key='depth_homography')
        return batch

    def viz(self, args, batch_file='./batch.npy'):
        """Predicted-vs-GT overlay on the depth view for the first
        batch_size samples (reference Dataset.viz, depth_datasets.py:248-263);
        expects predictions dumped by -save_last."""
        from ..tools.viz import visualize

        cam_specs = np.load(batch_file)
        for index in range(args.batch_size):
            sample = self.samples[index]
            depth_image = sample_lib.depth_image_path(self.args.data_name,
                                                      self.root, sample)
            depth_cam = sample_lib.depth_cam_for(self.args.data_name,
                                                 self.depth_cams, sample)
            visualize(depth_image, depth_cam, sample['skeleton'],
                      cam_specs[index], sample['depth_bbox'])

    def parse_sample(self, sample, index, decode=True):
        rng = self._rng(index)
        do_flip = (not self.at_test) and (rng.rand() < 0.5)
        random_zoom = rng.uniform(self.random_zoom, self.random_zoom ** (-1))

        cam = sample['camera']
        depth_cam = sample_lib.depth_cam_for(self.args.data_name,
                                             self.depth_cams, sample)
        depth_path = sample_lib.depth_image_path(self.args.data_name,
                                                 self.root, sample)

        new_cam, matrices = crop.build_crop(cam, sample['bbox'], self.side_in,
                                            do_flip, random_zoom,
                                            self.geometry)
        new_dcam, dmatrices = crop.build_crop(depth_cam, sample['depth_bbox'],
                                              self.side_in, do_flip,
                                              random_zoom, self.geometry)
        if 'homography' not in dmatrices:
            raise ValueError(
                'depth cameras are intrinsics-only in every reference store '
                '(get_depth_cams.py builds pinhole intrinsics); a distorted '
                'depth camera has no batched warp path')

        camera_coords, valid, back_rotate = crop.transform_gt(
            cam, new_cam, sample['skeleton'], sample['valid'],
            self.data_info.mirror, do_flip, self.at_test)

        out = dict(depth_homography=dmatrices['homography'],
                   depth_k_inv=np.linalg.inv(
                       depth_cam.intrinsic_matrix).astype(np.float32),
                   true_cam=camera_coords, true_val=valid.astype(bool))
        out.update(matrices)
        if decode:
            # same conditioning as PoseLoader.parse_sample / _decode_images:
            # grayscale replicated, alpha stripped, floats rescaled — NOT
            # just the dtype fix, or a gray/RGBA colour frame breaks the
            # fixed HxWx3 colour pipeline only on this path
            image = condition_image(imread(sample['image']))
            canvas, extent, prescale = crop.pad_to_canvas(image, self.canvas)
            out['canvas'] = canvas
            out['extent'] = extent
            crop.scale_lookup(out, prescale)

            depth_image = imread(depth_path)
            if depth_image.ndim == 3:
                depth_image = depth_image[..., 0]
            depth_image = depth_image[..., None].astype(np.float32)
            dcanvas, dextent, dprescale = crop.pad_to_canvas(
                depth_image, self.depth_canvas)
            out['depth_canvas'] = dcanvas
            out['depth_extent'] = dextent
            out['depth_homography'] = crop.scale_homography(
                out['depth_homography'], dprescale)
        else:
            out['image_path'] = sample['image']
            out['depth_path'] = depth_path
        if back_rotate is not None:
            out['back_rotation'] = back_rotate.astype(np.float32)
        elif self.do_teach:
            image_coords = new_cam.camera_to_image(camera_coords)
            out['atten_map'] = attention_map(self.side_in, self.stride,
                                             image_coords, self.attention)
        return out

    def _finalize(self, batch, i_batch, true_n=None, offset=0):
        batch, true_n = self._pad_to_mesh(batch, true_n, offset)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed + 7919 * self.epoch), i_batch)
        host_extras = self._pop_host_extras(batch, true_n)
        color = self._colour_stream(batch, key)

        host_depth_homs = batch['depth_homography']
        depth_dev = shard_batch(self.mesh, {
            'canvas': batch.pop('depth_canvas'),
            'homography': batch.pop('depth_homography'),
            'extent': batch.pop('depth_extent'),
            'k_inv': batch.pop('depth_k_inv')})
        # sized from the HOST rows (process-local in cluster mode;
        # shard_batch scales it back to the global batch), not from the
        # already-global depth_dev['canvas']
        thresh = np.full((len(host_depth_homs),), self.enhance_thresh,
                         np.float32)
        if self.at_test:
            depth_impl = ('mxu' if self.eval_warp_impl == 'mxu'
                          else 'gather')
        else:
            depth_impl = self._gated_impl(host_depth_homs,
                                          src_hw=self.depth_canvas)
        depth = augment.process_depth_batch(
            depth_dev['canvas'], depth_dev['homography'], depth_dev['extent'],
            depth_dev['k_inv'], shard_batch(self.mesh, thresh), self.side_in,
            self.nexponent, self.apply_to_depth, warp_impl=depth_impl)

        if 'atten_map' in batch:
            # reference layout (B, 1, S, S) -> NHWC (B, S, S, 1) to broadcast
            # over feature channels in the distill loss
            batch['atten_map'] = batch['atten_map'].transpose(0, 2, 3, 1)

        out = dict(color=color, depth=depth)
        out.update(shard_batch(self.mesh, batch))
        out.update(host_extras)
        out['_true_size'] = true_n
        return out


def data_loader(args, phase, data_info, **kwargs):
    """Reference-compatible entry (datasets.data_loader, datasets.py:22-27)."""
    return PoseLoader(args, phase, data_info, **kwargs)


def depth_data_loader(args, phase, data_info, **kwargs):
    """depth_datasets.data_loader (depth_datasets.py:23-28)."""
    return DepthPoseLoader(args, phase, data_info, **kwargs)
