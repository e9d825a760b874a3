"""Predictor / serving API tests."""

import numpy as np
import pytest

from pose_tpu.serve import Predictor, default_args, preprocess_frames


def small_args(**over):
    return default_args(model='resnet18', side_in=65, stride=32, depth=4,
                        num_joints=5, half_acc=False, **over)


def test_predict_crops_shapes():
    args = small_args()
    p = Predictor(args, 'rgb', batch_size=2)
    crops = np.random.RandomState(0).randn(2, 65, 65, 3).astype(np.float32)
    out = p.predict_crops(crops)
    assert out['relat_cam'].shape == (2, 5, 3)
    assert out['spec_mat'].shape == (2, 5, 2)
    assert np.all(np.isfinite(out['relat_cam']))


def test_predict_absolute():
    args = small_args()
    p = Predictor(args, 'rgb', batch_size=2)
    crops = np.random.RandomState(1).randn(2, 65, 65, 3).astype(np.float32)
    K = np.tile(np.array([[100., 0, 32], [0, 100., 32], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    absolute = p.predict_absolute(crops, K)
    assert absolute.shape == (2, 5, 3)
    assert np.all(np.isfinite(absolute))


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from pose_tpu.models.convert import (save_torch_file,
                                         variables_to_torch_state)
    args = small_args()
    p = Predictor(args, 'rgb', batch_size=2)
    ckpt = tmp_path / 'model_1.pth'
    save_torch_file(dict(state={}, model=variables_to_torch_state(
        jax.device_get(p.variables))), str(ckpt))

    p2 = Predictor.from_checkpoint(str(ckpt), args, 'rgb', batch_size=2)
    crops = np.random.RandomState(2).randn(2, 65, 65, 3).astype(np.float32)
    np.testing.assert_allclose(p.predict_crops(crops)['relat_cam'],
                               p2.predict_crops(crops)['relat_cam'],
                               atol=1e-5)


def test_aot_compile():
    args = small_args(joint_space=False)
    p = Predictor(args, 'rgb', batch_size=2)
    compiled = p.aot_compile()
    assert compiled is not None


def test_preprocess_frames():
    frames = np.random.RandomState(3).randint(
        0, 255, (2, 96, 96, 3), dtype=np.uint8)
    homs = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    homs[:, 0, 0] = homs[:, 1, 1] = 96 / 65
    extents = np.tile([96, 96], (2, 1)).astype(np.int32)
    out = np.asarray(preprocess_frames(frames, homs, extents, 65))
    assert out.shape == (2, 65, 65, 3)
    assert np.all(np.isfinite(out))


class TestArtifactPredictor:
    def test_matches_source_predictor_and_serves(self, tmp_path):
        from pose_tpu.serve import ArtifactPredictor, BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=2)
        path = str(tmp_path / 'pose.jaxexport')
        p.export_artifact(path)

        ap = ArtifactPredictor(path)
        assert ap.batch_size == 2
        assert ap.in_shapes == ((2, 65, 65, 3),)
        assert ap.out_shapes[0] == (2, 5, 3)    # relat_cam carries J
        crops = np.random.RandomState(7).randn(2, 65, 65, 3).astype(
            np.float32)
        # the artifact's program is recompiled from serialized StableHLO, so
        # fusions differ slightly from the live jit: tolerance is mm-scale
        np.testing.assert_allclose(ap.predict_crops(crops)['relat_cam'],
                                   p.predict_crops(crops)['relat_cam'],
                                   rtol=1e-4, atol=1e-2)
        # the artifact serves through the BatchingServer with no model code
        with BatchingServer(ap, max_delay_ms=5.0) as server:
            out = server.predict(crops[0], timeout=60)
            np.testing.assert_allclose(
                out['relat_cam'], p.predict_crops(crops)['relat_cam'][0],
                rtol=1e-4, atol=1e-2)


def test_artifact_ragged_batch_pads_and_slices(tmp_path):
    """ArtifactPredictor pads a short batch up to the artifact's baked
    batch size and slices the padding back off (Predictor symmetry);
    batches larger than the baked size fail loudly."""
    from pose_tpu.serve import ArtifactPredictor
    args = small_args(joint_space=False)
    p = Predictor(args, 'rgb', batch_size=4)
    path = str(tmp_path / 'pose_b4.jaxexport')
    p.export_artifact(path)
    ap = ArtifactPredictor(path)
    crops = np.random.RandomState(13).rand(3, 65, 65, 3).astype(np.float32)
    out = ap.predict_crops(crops)['relat_cam']
    assert out.shape == (3, 5, 3)
    np.testing.assert_allclose(out, p.predict_crops(crops)['relat_cam'],
                               rtol=1e-4, atol=1e-2)
    with pytest.raises(ValueError, match='baked batch'):
        ap.predict_crops(np.zeros((5, 65, 65, 3), np.float32))


def test_fusion_artifact_two_streams(tmp_path):
    """export_artifact/ArtifactPredictor for the two-input fusion variant:
    both streams bake into one artifact (in_shapes carries both), and the
    imported call matches the source predictor."""
    from pose_tpu.serve import ArtifactPredictor
    args = small_args(joint_space=False)
    p = Predictor(args, 'fusion', batch_size=2)
    path = str(tmp_path / 'fusion.jaxexport')
    p.export_artifact(path)

    ap = ArtifactPredictor(path)
    assert ap.in_shapes == ((2, 65, 65, 3), (2, 65, 65, 1))
    rng = np.random.RandomState(9)
    color = rng.rand(2, 65, 65, 3).astype(np.float32)
    depth = rng.rand(2, 65, 65, 1).astype(np.float32)
    np.testing.assert_allclose(
        ap.predict_crops(color, depth)['relat_cam'],
        p.predict_crops(color, depth)['relat_cam'], rtol=1e-4, atol=1e-2)


class TestBatchingServer:
    def test_single_and_burst_requests(self):
        from pose_tpu.serve import BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=4)
        rng = np.random.RandomState(2)
        with BatchingServer(p, max_delay_ms=20.0) as server:
            # single request (partial batch, padded)
            crop = rng.randn(65, 65, 3).astype(np.float32)
            out = server.predict(crop, timeout=60)
            assert out['relat_cam'].shape == (5, 3)
            assert np.all(np.isfinite(out['relat_cam']))

            # burst: more requests than one batch
            crops = [rng.randn(65, 65, 3).astype(np.float32)
                     for _ in range(10)]
            futs = [server.submit(c) for c in crops]
            results = [f.result(timeout=60) for f in futs]
            assert all(r['relat_cam'].shape == (5, 3) for r in results)

            # batched result equals the direct predictor output
            direct = p.predict_crops(np.stack(crops[:4]))
            for i in range(4):
                np.testing.assert_allclose(results[i]['relat_cam'],
                                           direct['relat_cam'][i],
                                           rtol=2e-4, atol=2e-3)
            assert server.served == 11
            assert server.batches >= 3   # 11 requests / batch 4

    def test_concurrent_submitters(self):
        """Many threads hammering submit() concurrently: every future
        resolves with its own request's result (identity checked through a
        per-request constant crop), nothing deadlocks, counts add up."""
        import threading
        from pose_tpu.serve import BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=4)
        results = {}
        errors = []
        with BatchingServer(p, max_delay_ms=2.0) as server:
            def client(tid):
                try:
                    rng = np.random.RandomState(tid)
                    for j in range(6):
                        crop = rng.randn(65, 65, 3).astype(np.float32)
                        out = server.predict(crop, timeout=120)
                        results[(tid, j)] = out['relat_cam']
                except Exception as e:           # pragma: no cover
                    errors.append((tid, e))
            threads = [threading.Thread(target=client, args=(t,))
                       for t in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
            assert not errors, errors
            assert len(results) == 24
            assert server.served == 24
            assert all(np.all(np.isfinite(v)) for v in results.values())
            # distinct inputs must not have been cross-wired to one output
            flat = [v.tobytes() for v in results.values()]
            assert len(set(flat)) == len(flat)

    def test_aot_executable_reused_by_predict_crops(self):
        """After aot_compile(), predict_crops must run the AOT executable
        for full AND padded-ragged batches — not re-trace self._forward
        (that compiled the identical program twice, 3-8 min each through a
        remote transport). Ragged batches pad to the ONE configured
        batch_size, so every partial batch shares the compiled shape."""
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=4)
        rng = np.random.RandomState(7)
        full = rng.randn(4, 65, 65, 3).astype(np.float32)
        via_jit = p.predict_crops(full)
        p.aot_compile()

        def boom(*a, **k):                    # _forward must NOT be hit
            raise AssertionError('jit forward used despite AOT executable')

        p._forward = boom
        out = p.predict_crops(full)
        np.testing.assert_allclose(out['relat_cam'], via_jit['relat_cam'],
                                   rtol=1e-5, atol=1e-5)
        ragged = p.predict_crops(full[:3])    # pads to 4 -> AOT shape
        np.testing.assert_allclose(ragged['relat_cam'],
                                   via_jit['relat_cam'][:3],
                                   rtol=1e-5, atol=1e-5)

    def test_stop_rejects_new_requests(self):
        from pose_tpu.serve import BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=2)
        server = BatchingServer(p, max_delay_ms=1.0)
        server.stop()
        server.stop()                   # idempotent (manual + __exit__)
        with pytest.raises(RuntimeError):
            server.submit(np.zeros((65, 65, 3), np.float32))

    def test_stop_submit_race_never_orphans_futures(self):
        """submit() racing stop(): every submit must either raise (server
        stopped) or return a future that RESOLVES — an item enqueued behind
        the stop sentinel would hang its caller forever on fut.result()."""
        import threading
        import time
        from pose_tpu.serve import BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=2)
        crop = np.zeros((65, 65, 3), np.float32)
        for _ in range(5):              # several races per predictor compile
            server = BatchingServer(p, max_delay_ms=1.0)
            futs, rejected = [], []

            def client():
                try:
                    while True:
                        futs.append(server.submit(crop))
                        time.sleep(0.0002)    # bound the drain backlog
                except RuntimeError:
                    rejected.append(True)

            t = threading.Thread(target=client)
            t.start()
            time.sleep(0.02)
            server.stop()
            t.join(timeout=60)
            assert rejected             # the loop ended via the stop check
            for f in futs:              # none orphaned behind the sentinel
                assert f.result(timeout=60) is not None


def test_malformed_request_resolves_not_wedges():
    """A wrong-shape crop must resolve its future with the error and leave
    the worker alive for later requests (batch assembly happens inside the
    resolve-don't-wedge handler)."""
    from pose_tpu.serve import BatchingServer
    args = small_args()
    p = Predictor(args, 'rgb', batch_size=2)
    with BatchingServer(p, max_delay_ms=5.0) as server:
        bad = server.submit(np.zeros((3, 3), np.float32))   # not a crop
        with pytest.raises(Exception):
            bad.result(timeout=60)
        good = server.predict(
            np.random.RandomState(0).randn(65, 65, 3).astype(np.float32),
            timeout=60)
        assert np.all(np.isfinite(good['relat_cam']))


def test_export_artifact_roundtrip(tmp_path):
    """export_artifact serializes the whole predict graph (weights baked
    in, decode included); the loaded artifact reproduces predict_crops
    without the Predictor or model code."""
    args = small_args()
    p = Predictor(args, 'rgb', batch_size=2)
    path = str(tmp_path / 'pose_predictor.jaxexport')
    p.export_artifact(path)

    fn = Predictor.load_artifact(path)
    crops = np.random.RandomState(5).randn(2, 65, 65, 3).astype(np.float32)
    out = fn(crops)
    direct = p.predict_crops(crops)
    # baked-constant folding changes fusion order slightly: ~5e-4 mm
    # deviation on millimeter-scale coordinates (vs the 1 mm north star)
    np.testing.assert_allclose(np.asarray(out['relat_cam']),
                               direct['relat_cam'], atol=2e-3)


class TestMeshServing:
    """Data-parallel serving: Predictor(mesh=make_mesh(8)) shards crops
    over the 'data' axis with replicated weights — same numbers as the
    single-device predictor, linear scale-out over chips."""

    def _pair(self, **over):
        from pose_tpu.parallel import make_mesh
        args = small_args(**over)
        single = Predictor(args, 'rgb', batch_size=8)
        mesh = Predictor(args, 'rgb', variables=single.variables,
                         batch_size=8, mesh=make_mesh(8))
        return single, mesh

    def test_matches_single_device(self):
        single, meshed = self._pair()
        crops = np.random.RandomState(3).rand(8, 65, 65, 3).astype(
            np.float32)
        ref, out = single.predict_crops(crops), meshed.predict_crops(crops)
        np.testing.assert_allclose(out['relat_cam'], ref['relat_cam'],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(out['spec_mat'], ref['spec_mat'],
                                   rtol=1e-4, atol=1e-3)

    def test_ragged_batch_pads_and_slices(self):
        single, meshed = self._pair()
        crops = np.random.RandomState(4).rand(5, 65, 65, 3).astype(
            np.float32)
        ref = single.predict_crops(crops)['relat_cam']
        out = meshed.predict_crops(crops)['relat_cam']
        assert out.shape == ref.shape == (5, 5, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
        K = np.tile(np.array([[100., 0, 32], [0, 100., 32], [0, 0, 1]],
                             np.float32), (5, 1, 1))
        absolute = meshed.predict_absolute(crops, K)
        assert absolute.shape == (5, 5, 3)
        np.testing.assert_allclose(absolute,
                                   single.predict_absolute(crops, K),
                                   rtol=1e-4, atol=1e-2)

    def test_quantized_mesh_serving(self):
        single, meshed = self._pair()
        calib = np.random.RandomState(5).rand(8, 65, 65, 3).astype(
            np.float32)
        scales = single.quantize([calib])
        meshed.quantize_with_scales(scales)
        crops = np.random.RandomState(6).rand(8, 65, 65, 3).astype(
            np.float32)
        ref = single.predict_crops(crops)['relat_cam']
        out = meshed.predict_crops(crops)['relat_cam']
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-2)

    @pytest.mark.slow
    def test_artifact_serves_on_mesh(self, tmp_path):
        """A .jaxexport artifact composes with mesh serving (VERDICT r3
        item 4): the deserialized StableHLO jits with 'data' in_shardings
        and GSPMD partitions it — single-device-equal outputs on the
        8-device virtual mesh, through predict_crops and the
        BatchingServer."""
        from pose_tpu.parallel import make_mesh
        from pose_tpu.serve import ArtifactPredictor, BatchingServer
        args = small_args()
        p = Predictor(args, 'rgb', batch_size=8)
        path = str(tmp_path / 'pose.jaxexport')
        p.export_artifact(path)

        single = ArtifactPredictor(path)
        meshed = ArtifactPredictor(path, mesh=make_mesh(8))
        crops = np.random.RandomState(11).rand(8, 65, 65, 3).astype(
            np.float32)
        ref = single.predict_crops(crops)['relat_cam']
        out = meshed.predict_crops(crops)['relat_cam']
        assert out.shape == ref.shape == (8, 5, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
        with BatchingServer(meshed, max_delay_ms=5.0) as server:
            got = server.predict(crops[0], timeout=60)['relat_cam']
        np.testing.assert_allclose(got, ref[0], rtol=1e-4, atol=1e-3)

    def test_artifact_mesh_batch_divisibility_is_loud(self, tmp_path):
        from pose_tpu.parallel import make_mesh
        from pose_tpu.serve import ArtifactPredictor
        args = small_args()
        Predictor(args, 'rgb', batch_size=3).export_artifact(
            str(tmp_path / 'odd.jaxexport'))
        with pytest.raises(ValueError, match='divide over'):
            ArtifactPredictor(str(tmp_path / 'odd.jaxexport'),
                              mesh=make_mesh(8))

    def test_batching_server_on_mesh(self):
        from pose_tpu.serve import BatchingServer
        _, meshed = self._pair(joint_space=False)
        rng = np.random.RandomState(7)
        crops = rng.rand(6, 65, 65, 3).astype(np.float32)
        expected = meshed.predict_crops(crops)['relat_cam']
        with BatchingServer(meshed, max_delay_ms=20.0) as server:
            futs = [server.submit(c) for c in crops]
            got = np.stack([f.result(60)['relat_cam'] for f in futs])
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)

    def test_mesh_validation(self):
        from pose_tpu.parallel import make_mesh
        args = small_args()
        with pytest.raises(ValueError, match='divide'):
            Predictor(args, 'rgb', batch_size=6, mesh=make_mesh(8))

    def test_fusion_two_stream_mesh(self):
        from pose_tpu.parallel import make_mesh
        args = small_args(joint_space=False)
        single = Predictor(args, 'fusion', batch_size=8)
        meshed = Predictor(args, 'fusion', variables=single.variables,
                           batch_size=8, mesh=make_mesh(8))
        rng = np.random.RandomState(8)
        color = rng.rand(5, 65, 65, 3).astype(np.float32)   # ragged too
        depth = rng.rand(5, 65, 65, 1).astype(np.float32)
        ref = single.predict_crops(color, depth)['relat_cam']
        out = meshed.predict_crops(color, depth)['relat_cam']
        assert out.shape == (5, 5, 3)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_live_quantize_behind_running_server():
    """Quantizing a Predictor already behind a BatchingServer must not
    wedge it: the worker re-resolves the AOT executable per batch, so the
    first post-quantize batch recompiles int8 instead of feeding int8
    serve_variables to the stale float program (review finding)."""
    from pose_tpu.serve import BatchingServer
    args = small_args(joint_space=False)
    p = Predictor(args, 'rgb', batch_size=2)
    rng = np.random.RandomState(9)
    crop = rng.rand(65, 65, 3).astype(np.float32)
    with BatchingServer(p, max_delay_ms=5.0) as server:
        before = server.predict(crop, timeout=120)['relat_cam']
        p.quantize([rng.rand(4, 65, 65, 3).astype(np.float32)])
        after = server.predict(crop, timeout=120)['relat_cam']
    assert np.all(np.isfinite(before)) and np.all(np.isfinite(after))
    # int8 convs actually took effect (outputs differ, within decode tol)
    assert not np.array_equal(before, after)
    assert np.max(np.abs(before - after)) < 10.0


def test_numpy_checkpoint_weights_are_placed_once():
    """from_checkpoint leaves numpy arrays in .variables; serve_variables
    must return a cached on-device copy (one upload), not hand the numpy
    tree to every jitted call (per-request full-checkpoint re-upload
    through a remote transport — review finding)."""
    import jax as _jax
    args = small_args(joint_space=False)
    p = Predictor(args, 'rgb', batch_size=2)
    p.variables = _jax.tree_util.tree_map(np.asarray,
                                          _jax.device_get(p.variables))
    sv1 = p.serve_variables
    leaves = _jax.tree_util.tree_leaves(sv1)
    assert all(isinstance(l, _jax.Array) for l in leaves)
    assert p.serve_variables is sv1       # cached, not re-placed
    out = p.predict_crops(np.random.RandomState(10).rand(
        2, 65, 65, 3).astype(np.float32))
    assert np.all(np.isfinite(out['relat_cam']))
