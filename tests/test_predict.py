"""End-to-end tests for the inference CLI (predict.py).

The reference has no deployment entry point (its closest path is
main.py:77-95 -val_only over the pickled corpus); predict.py is the
framework's checkpoint+frames -> poses JSON journey. These tests drive the
real CLI main() over tiny JPEG fixtures with a real (small) checkpoint.
"""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import predict  # noqa: E402

ARGS = dict(model='resnet18', side_in=65, stride=32, depth=4,
            num_joints=19, half_acc=False)


@pytest.fixture(scope='module')
def fixture_dir(tmp_path_factory):
    """Three small JPEG frames + 16-bit depth PNGs + rgb/depth/fusion
    resnet18 checkpoints."""
    import jax
    from PIL import Image

    from pose_tpu import serve
    from pose_tpu.models.convert import (save_torch_file,
                                         variables_to_torch_state)

    root = tmp_path_factory.mktemp('predict_fixture')
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = rng.randint(0, 255, (80, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f'frame_{i}.jpg')
        depth = rng.randint(800, 5000, (80, 96), dtype=np.uint16)
        Image.fromarray(depth).save(root / f'depth_{i}.png')

    def save(variant, name, **over):
        args = serve.default_args(**dict(ARGS, **over))
        p = serve.Predictor(args, variant, batch_size=1)
        save_torch_file(
            dict(state={}, model=variables_to_torch_state(
                jax.device_get(p.variables))),
            str(root / name))

    save('rgb', 'model_1.pth', joint_space=True)
    save('depth', 'model_depth.pth', joint_space=False, depth_only=True)
    save('fusion', 'model_fusion.pth', joint_space=False)
    return root


def cli(fixture_dir, out_name, extra):
    argv = ['-model', 'resnet18', '-model_path',
            str(fixture_dir / 'model_1.pth'),
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-num_joints', '19', '-joint_space',
            '-images', str(fixture_dir / 'frame_*.jpg'),
            '-out', str(fixture_dir / out_name)] + extra
    return predict.main(argv)


def test_images_bboxes_camera_viz(fixture_dir):
    """Dict bboxes + explicit pinhole camera + overlay PNGs."""
    boxes = {f'frame_{i}.jpg': [10 + i, 5, 60, 70] for i in range(3)}
    with open(fixture_dir / 'boxes.json', 'w') as f:
        json.dump(boxes, f)
    cam = dict(K=[[120.0, 0, 48], [0, 120.0, 40], [0, 0, 1]],
               R=np.eye(3).tolist(), t=[0.0, 0.0, 0.0])
    with open(fixture_dir / 'camera.json', 'w') as f:
        json.dump(cam, f)
    viz_dir = fixture_dir / 'overlays'

    blob = cli(fixture_dir, 'out.json', [
        '-bboxes', str(fixture_dir / 'boxes.json'),
        '-camera', str(fixture_dir / 'camera.json'),
        '-viz', str(viz_dir)])

    with open(fixture_dir / 'out.json') as f:
        on_disk = json.load(f)
    assert on_disk['frames'] == blob['frames']
    assert len(blob['frames']) == 3
    for i, rec in enumerate(blob['frames']):
        assert rec['key'] == f'frame_{i}.jpg'
        assert rec['bbox'] == [10 + i, 5, 60, 70]
        relat = np.asarray(rec['relat_cam'])
        assert relat.shape == (19, 3)
        assert np.all(np.isfinite(relat))
        # root-relative: the cmu key joint (key_foots base) sits at zero
        from datasets import build_info
        key_index = build_info('cmu').key_index
        np.testing.assert_allclose(relat[key_index], 0.0, atol=1e-3)
        assert np.asarray(rec['spec_mat']).shape == (19, 2)
        for field in ('absolute_world', 'absolute_cam', 'image_coord'):
            arr = np.asarray(rec[field])
            assert arr.shape[0] == 19
            assert np.all(np.isfinite(arr))
        # frame-transform consistency: the absolute pose re-rooted in the
        # original camera frame must reproduce the reported relative pose
        absolute = np.asarray(rec['absolute_cam'])
        np.testing.assert_allclose(absolute - absolute[key_index], relat,
                                   atol=0.5)
        assert os.path.exists(viz_dir / f'frame_{i}.png')


def test_distorted_camera_list_bboxes(fixture_dir):
    """Distorted source camera exercises the general warp branch; a single
    shared bbox broadcasts to every frame."""
    cam = dict(K=[[120.0, 0, 48], [0, 120.0, 40], [0, 0, 1]],
               dist=[-0.2, 0.05, 0.0, 0.0, 0.0])
    with open(fixture_dir / 'camera_dist.json', 'w') as f:
        json.dump(cam, f)
    with open(fixture_dir / 'one_box.json', 'w') as f:
        json.dump([8, 6, 70, 66], f)

    blob = cli(fixture_dir, 'out_dist.json', [
        '-bboxes', str(fixture_dir / 'one_box.json'),
        '-camera', str(fixture_dir / 'camera_dist.json')])
    assert len(blob['frames']) == 3
    for rec in blob['frames']:
        assert rec['bbox'] == [8, 6, 70, 66]
        assert np.all(np.isfinite(np.asarray(rec['relat_cam'])))
        assert np.all(np.isfinite(np.asarray(rec['absolute_cam'])))


def test_default_camera_and_fullframe_boxes(fixture_dir):
    """No -bboxes / -camera: full-frame boxes + centered pinhole guess."""
    blob = cli(fixture_dir, 'out_default.json', [])
    assert len(blob['frames']) == 3
    assert blob['frames'][0]['bbox'] == [0, 0, 96, 80]
    assert np.asarray(blob['frames'][0]['relat_cam']).shape == (19, 3)


def test_video_input_streams_in_chunks(fixture_dir):
    """-video drives the same path through tools.video.prefetch, consumed
    LAZILY in batch_size chunks (long clips never materialize in host
    memory): 5 frames at batch 2 = 3 chunks with a padded tail."""
    import types
    cv2 = pytest.importorskip('cv2')
    path = str(fixture_dir / 'clip.avi')
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 5.0,
                             (96, 80))
    if not writer.isOpened():
        pytest.skip('no MJPG encoder in this cv2 build')
    rng = np.random.RandomState(1)
    for _ in range(5):
        writer.write(rng.randint(0, 255, (80, 96, 3), dtype=np.uint8))
    writer.release()

    frames, total, canvas = predict.load_frames(
        types.SimpleNamespace(images=None, video=path))
    assert total is None and canvas is None
    assert not isinstance(frames, (list, tuple))   # a lazy generator
    assert next(frames)[0] == 'frame_000000'

    argv = ['-model', 'resnet18', '-model_path',
            str(fixture_dir / 'model_1.pth'),
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-num_joints', '19', '-joint_space', '-batch_size', '2',
            '-video', path, '-out', str(fixture_dir / 'out_video.json')]
    blob = predict.main(argv)
    assert [r['key'] for r in blob['frames']] == [
        'frame_%06d' % i for i in range(5)]
    for rec in blob['frames']:
        assert np.all(np.isfinite(np.asarray(rec['relat_cam'])))


def test_depth_only_student(fixture_dir):
    """The distilled depth-only student on raw 16-bit depth PNGs — the
    privileged-information deployment target."""
    with open(fixture_dir / 'depth_cam.json', 'w') as f:
        json.dump(dict(K=[[110.0, 0, 48], [0, 110.0, 40], [0, 0, 1]]), f)
    argv = ['-model', 'resnet18', '-model_path',
            str(fixture_dir / 'model_depth.pth'),
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-num_joints', '19', '-depth_only', '-nexponent', '-to_depth',
            '-depth_images', str(fixture_dir / 'depth_*.png'),
            '-depth_camera', str(fixture_dir / 'depth_cam.json'),
            '-out', str(fixture_dir / 'out_depth.json')]
    blob = predict.main(argv)
    assert blob['variant'] == 'depth'
    assert [r['key'] for r in blob['frames']] == [
        f'depth_{i}.png' for i in range(3)]
    for rec in blob['frames']:
        relat = np.asarray(rec['relat_cam'])
        assert relat.shape == (19, 3)
        assert np.all(np.isfinite(relat))
        assert 'spec_mat' not in rec          # depth trunks have no 2D head
        assert 'absolute_cam' not in rec


def test_fusion_two_streams(fixture_dir):
    blob = predict.main([
        '-model', 'resnet18', '-model_path',
        str(fixture_dir / 'model_fusion.pth'),
        '-side_in', '65', '-stride', '32', '-depth', '4',
        '-num_joints', '19', '-do_fusion',
        '-images', str(fixture_dir / 'frame_*.jpg'),
        '-depth_images', str(fixture_dir / 'depth_*.png'),
        '-out', str(fixture_dir / 'out_fusion.json')])
    assert blob['variant'] == 'fusion'
    assert len(blob['frames']) == 3
    # output keys/boxes follow the colour stream
    assert blob['frames'][0]['key'] == 'frame_0.jpg'
    assert np.all(np.isfinite(np.asarray(blob['frames'][0]['relat_cam'])))


@pytest.fixture(scope='module')
def artifact3(fixture_dir):
    """Batch-3 joint-space .jaxexport, exported once on demand — tests
    that need it must take THIS fixture, not assume another test ran
    first (execution-order coupling)."""
    from pose_tpu import serve
    path = fixture_dir / 'pose.jaxexport'
    if not path.exists():
        args = serve.default_args(joint_space=True, **ARGS)
        p = serve.Predictor.from_checkpoint(
            str(fixture_dir / 'model_1.pth'), args, batch_size=3)
        p.export_artifact(str(path))
    return str(path)


def test_artifact_model_path(fixture_dir, artifact3):
    """A .jaxexport deployment artifact drives the CLI with no checkpoint;
    outputs match the .pth run bit-for-tolerance."""
    artifact = artifact3

    base = cli(fixture_dir, 'out_pth.json', [])
    argv = ['-model_path', artifact,
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-num_joints', '19', '-joint_space',
            '-images', str(fixture_dir / 'frame_*.jpg'),
            '-out', str(fixture_dir / 'out_artifact.json')]
    blob = predict.main(argv)
    assert len(blob['frames']) == 3
    for ref, got in zip(base['frames'], blob['frames']):
        # artifact programs recompile from StableHLO with slightly
        # different fusions; mm-scale tolerance
        np.testing.assert_allclose(got['relat_cam'], ref['relat_cam'],
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(got['absolute_cam'], ref['absolute_cam'],
                                   rtol=1e-3, atol=1e-1)
    # flag/artifact mismatches fail fast with a clear message
    with pytest.raises(SystemExit):
        predict.main(argv[:2] + ['-side_in', '129'] + argv[4:])
    with pytest.raises(SystemExit):
        predict.main(argv + ['-extra_channel'])
    with pytest.raises(SystemExit):   # joint count baked into the artifact
        predict.main([a if a != '19' else '17' for a in argv])


def test_multi_person_boxes(fixture_dir):
    """A per-frame LIST of boxes yields one record per person (the
    reference corpus is one sample per person+bbox, data_groups.py
    make_sample); -viz writes per-person overlays."""
    boxes = {'frame_0.jpg': [[5, 5, 40, 60], [45, 10, 45, 60]],
             'frame_1.jpg': [[10, 8, 70, 60]],
             'frame_2.jpg': [[0, 0, 96, 80], [20, 10, 50, 60],
                             [8, 4, 30, 70]]}
    with open(fixture_dir / 'people.json', 'w') as f:
        json.dump(boxes, f)
    viz_dir = fixture_dir / 'people_viz'
    blob = cli(fixture_dir, 'out_people.json', [
        '-bboxes', str(fixture_dir / 'people.json'),
        '-viz', str(viz_dir), '-batch_size', '4'])
    got = [(r['key'], r['person']) for r in blob['frames']]
    assert got == [('frame_0.jpg', 0), ('frame_0.jpg', 1),
                   ('frame_1.jpg', 0), ('frame_2.jpg', 0),
                   ('frame_2.jpg', 1), ('frame_2.jpg', 2)]
    for rec in blob['frames']:
        assert np.all(np.isfinite(np.asarray(rec['relat_cam'])))
    assert sorted(os.listdir(viz_dir)) == [
        'frame_0.png', 'frame_0_p1.png', 'frame_1.png', 'frame_2.png',
        'frame_2_p1.png', 'frame_2_p2.png']
    # two people in one frame really get different crops/poses
    a, b = blob['frames'][0], blob['frames'][1]
    assert not np.allclose(a['relat_cam'], b['relat_cam'])

    # the top-level-list form also takes ragged per-frame person counts
    with open(fixture_dir / 'ragged.json', 'w') as f:
        json.dump([[[5, 5, 40, 60]], [[10, 8, 70, 60], [4, 4, 50, 50]],
                   [[0, 0, 96, 80]]], f)
    blob = cli(fixture_dir, 'out_ragged.json', [
        '-bboxes', str(fixture_dir / 'ragged.json')])
    assert [(r['key'], r['person']) for r in blob['frames']] == [
        ('frame_0.jpg', 0), ('frame_1.jpg', 0), ('frame_1.jpg', 1),
        ('frame_2.jpg', 0)]


def test_best_pth_pointer(fixture_dir, tmp_path):
    """best.pth ({'best': E}, Logger convention) resolves to model_<E>.pth
    beside it (main.py:37-46 semantics)."""
    from pose_tpu.models.convert import save_torch_file
    save_torch_file({'best': 7}, str(tmp_path / 'best.pth'))
    assert predict.resolve_model_path(str(tmp_path / 'best.pth')) == str(
        tmp_path / 'model_7.pth')
    assert predict.resolve_model_path('foo/model_3.pth') == 'foo/model_3.pth'


def test_variant_dispatch():
    """depth_main.py:37-42 dispatch table, no model build needed."""
    parse = lambda extra: predict.build_parser().parse_args(
        ['-model_path', 'x.pth'] + extra)
    assert predict.resolve_variant(parse([])) == 'rgb'
    assert predict.resolve_variant(parse(['-depth_only'])) == 'depth'
    assert predict.resolve_variant(parse(['-depth_net'])) == 'depth'
    assert predict.resolve_variant(parse(['-do_fusion'])) == 'fusion'
    assert predict.resolve_variant(
        parse(['-partial_conv', '-depth_only'])) == 'partial_depth'
    assert predict.resolve_variant(
        parse(['-partial_conv', '-do_fusion'])) == 'partial_fusion'


def test_input_validation(fixture_dir):
    with pytest.raises(SystemExit):
        predict.main(['-model_path', 'x.pth'])      # neither images nor video
    with pytest.raises(SystemExit):
        predict.main(['-model_path', 'x.pth',
                      '-images', str(fixture_dir / 'nomatch_*.jpg')])
    with pytest.raises(SystemExit):            # depth models have no 2D head
        predict.main(['-model_path', 'x.pth', '-depth_only',
                      '-joint_space',
                      '-depth_images', str(fixture_dir / 'depth_*.png')])
    with pytest.raises(SystemExit):            # fusion needs the depth glob
        predict.main(['-model_path', 'x.pth', '-do_fusion',
                      '-images', str(fixture_dir / 'frame_*.jpg')])
    with pytest.raises(SystemExit):   # bbox mask channel is RGB-trunk-only
        predict.main(['-model_path', 'x.pth', '-do_fusion',
                      '-extra_channel',
                      '-images', str(fixture_dir / 'frame_*.jpg'),
                      '-depth_images', str(fixture_dir / 'depth_*.png')])
    with pytest.raises(SystemExit):   # colour-side flags with -depth_only
        predict.main(['-model_path', 'x.pth', '-depth_only',
                      '-bboxes', 'b.json',
                      '-depth_images', str(fixture_dir / 'depth_*.png')])
    with pytest.raises(SystemExit):   # depth-enhance flags never read
        predict.main(['-model_path', 'x.pth', '-nexponent',
                      '-images', str(fixture_dir / 'frame_*.jpg')])
    # fusion consumes BOTH streams; -depth_only contradicts it — must fail
    # at flag-check time (depth_main.py asserts the same pair), not as a
    # TypeError deep inside run_batch's colour warp
    with pytest.raises(SystemExit, match='BOTH streams'):
        predict.main(['-model_path', 'x.pth', '-do_fusion', '-depth_only',
                      '-depth_images', str(fixture_dir / 'depth_*.png')])


def test_empty_bbox_entry_means_zero_detections(fixture_dir):
    """A frame whose bbox entry is [] yields NO person samples for that
    frame (the detector found nobody) instead of a hard error — previously
    unrepresentable, forcing users to fabricate dummy boxes that then
    polluted -track_ids association."""
    boxes = {'frame_0.jpg': [[10, 5, 60, 70]],
             'frame_1.jpg': [],
             'frame_2.jpg': [[12, 6, 58, 68], [2, 2, 30, 30]]}
    with open(fixture_dir / 'boxes_gap.json', 'w') as f:
        json.dump(boxes, f)
    blob = cli(fixture_dir, 'out_gap.json',
               ['-bboxes', str(fixture_dir / 'boxes_gap.json')])
    keys = [(rec['key'], rec['person']) for rec in blob['frames']]
    assert keys == [('frame_0.jpg', 0), ('frame_2.jpg', 0),
                    ('frame_2.jpg', 1)]
    # an ALL-empty spec still fails loudly (nothing to predict)
    with open(fixture_dir / 'boxes_all_empty.json', 'w') as f:
        json.dump({f'frame_{i}.jpg': [] for i in range(3)}, f)
    with pytest.raises(SystemExit, match='no person samples'):
        cli(fixture_dir, 'out_all_empty.json',
            ['-bboxes', str(fixture_dir / 'boxes_all_empty.json')])


def test_box_list_longer_than_stream(fixture_dir):
    """A per-frame box list longer than the frames is a hard error, not a
    silent truncation (a glob typo would otherwise drop user boxes)."""
    with open(fixture_dir / 'toolong.json', 'w') as f:
        json.dump([[0, 0, 9, 9]] * 5, f)        # 5 entries, 3 frames
    with pytest.raises(SystemExit):
        cli(fixture_dir, 'out_toolong.json',
            ['-bboxes', str(fixture_dir / 'toolong.json')])


def test_zero_distortion_is_pinhole(tmp_path):
    """An explicit all-zero dist list parses as a pure pinhole (common in
    calibration dumps) — no general-warp detour, no -depth_camera reject."""
    with open(tmp_path / 'cam.json', 'w') as f:
        json.dump(dict(K=[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]],
                       dist=[0, 0, 0, 0, 0]), f)
    cam = predict.load_camera(str(tmp_path / 'cam.json'), (16, 16))
    assert cam.distortion_coeffs is None


def test_quantize_flag(fixture_dir, artifact3):
    """-quantize serves int8 convs calibrated on the first batch; outputs
    stay within the quantization tolerance of the bf16 run, and the flag
    is rejected for .jaxexport artifacts (precision bakes at export)."""
    base = cli(fixture_dir, 'out_fp.json', [])
    blob = cli(fixture_dir, 'out_q.json', ['-quantize'])
    assert len(blob['frames']) == len(base['frames']) == 3
    for ref, got in zip(base['frames'], blob['frames']):
        delta = np.max(np.abs(np.asarray(got['relat_cam'])
                              - np.asarray(ref['relat_cam'])))
        # random-init decode is the quantization worst case (near-uniform
        # logits); measured 10.1 mm here — the accuracy evidence proper is
        # tests/test_quant.py + the on-chip flagship deltas (PERF.md)
        assert delta < 20.0, delta
        assert not np.array_equal(got['relat_cam'], ref['relat_cam'])
    with pytest.raises(SystemExit):
        predict.main(['-model_path', artifact3,
                      '-side_in', '65', '-stride', '32', '-depth', '4',
                      '-num_joints', '19', '-joint_space', '-quantize',
                      '-images', str(fixture_dir / 'frame_*.jpg'),
                      '-out', str(fixture_dir / 'out_qa.json')])


def test_track_ids_flag(fixture_dir):
    """-track_ids threads stable person identities through a multi-person
    stream: frame 1 lists the two boxes in swapped order, the assigned
    track_id must follow position."""
    left, right = [2, 4, 40, 70], [52, 6, 40, 70]
    boxes = {'frame_0.jpg': [left, right],
             'frame_1.jpg': [right, left],
             'frame_2.jpg': [left, right]}
    with open(fixture_dir / 'tboxes.json', 'w') as f:
        json.dump(boxes, f)
    blob = cli(fixture_dir, 'out_track.json',
               ['-bboxes', str(fixture_dir / 'tboxes.json'), '-track_ids'])
    assert len(blob['frames']) == 6
    by = {(r['key'], tuple(r['bbox'])): r['track_id']
          for r in blob['frames']}
    assert by[('frame_0.jpg', tuple(left))] == by[
        ('frame_1.jpg', tuple(left))] == by[('frame_2.jpg', tuple(left))]
    assert by[('frame_0.jpg', tuple(right))] == by[
        ('frame_1.jpg', tuple(right))] == by[('frame_2.jpg', tuple(right))]
    assert by[('frame_0.jpg', tuple(left))] != by[
        ('frame_0.jpg', tuple(right))]


def test_calib_batches_flag(fixture_dir):
    """-calib_batches N widens int8 calibration over the first N request
    batches (running absmax): with -batch_size 2 over 3 frames, batch 1
    serves at full precision inside the window (matches the bf16 run
    exactly) while the final batch serves int8 (differs)."""
    base = cli(fixture_dir, 'out_cb_fp.json', ['-batch_size', '2'])
    blob = cli(fixture_dir, 'out_cb_q.json',
               ['-batch_size', '2', '-quantize', '-calib_batches', '2'])
    assert len(blob['frames']) == len(base['frames']) == 3
    # frames 0-1 (batch 1, inside the window) are the float forward
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(blob['frames'][i]['relat_cam']),
            np.asarray(base['frames'][i]['relat_cam']), rtol=0, atol=1e-4)
    # frame 2 (batch 2, window closed) is the int8 forward
    got = np.asarray(blob['frames'][2]['relat_cam'])
    ref = np.asarray(base['frames'][2]['relat_cam'])
    assert not np.array_equal(got, ref)
    assert np.max(np.abs(got - ref)) < 20.0
    assert np.all(np.isfinite(got))


def test_mesh_flag_data_parallel(fixture_dir, artifact3):
    """-mesh N serves data-parallel (Predictor over make_mesh(N)): the
    3-frame stream (a ragged final chunk after batch_size rounds up to a
    mesh multiple) must reproduce the single-device run exactly. A
    .jaxexport artifact composes with -mesh only when its baked batch
    size divides by N — the batch-3 fixture artifact on -mesh 2 must
    fail loudly, not serve skewed shards."""
    base = cli(fixture_dir, 'out_1dev.json', ['-batch_size', '2'])
    blob = cli(fixture_dir, 'out_mesh.json', ['-batch_size', '3',
                                              '-mesh', '2'])
    assert len(blob['frames']) == len(base['frames']) == 3
    for ref, got in zip(base['frames'], blob['frames']):
        np.testing.assert_allclose(np.asarray(got['relat_cam']),
                                   np.asarray(ref['relat_cam']),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got['absolute_cam']),
                                   np.asarray(ref['absolute_cam']),
                                   rtol=0, atol=1e-3)
    with pytest.raises(SystemExit, match='divide over'):
        predict.main(['-model_path', artifact3,
                      '-side_in', '65', '-stride', '32', '-depth', '4',
                      '-num_joints', '19', '-joint_space', '-mesh', '2',
                      '-images', str(fixture_dir / 'frame_*.jpg'),
                      '-out', str(fixture_dir / 'out_ma.json')])


def test_artifact_mesh_flag(fixture_dir):
    """-mesh N from a .jaxexport artifact whose baked batch size divides
    by N (VERDICT r3 item 4): data-parallel serving of the imported
    StableHLO reproduces the single-device artifact run."""
    from pose_tpu import serve
    args = serve.default_args(joint_space=True, **ARGS)
    p = serve.Predictor.from_checkpoint(
        str(fixture_dir / 'model_1.pth'), args, batch_size=4)
    artifact = str(fixture_dir / 'pose_b4.jaxexport')
    p.export_artifact(artifact)

    argv = ['-model_path', artifact,
            '-side_in', '65', '-stride', '32', '-depth', '4',
            '-num_joints', '19', '-joint_space',
            '-images', str(fixture_dir / 'frame_*.jpg')]
    base = predict.main(argv + ['-out', str(fixture_dir / 'out_am1.json')])
    blob = predict.main(argv + ['-mesh', '2',
                                '-out', str(fixture_dir / 'out_am2.json')])
    assert len(blob['frames']) == len(base['frames']) == 3
    for ref, got in zip(base['frames'], blob['frames']):
        # the sharded jit recompiles the imported StableHLO with different
        # fusions than the single-device program; XLA:CPU conv drift makes
        # that mm-scale, same tolerance as test_artifact_model_path
        np.testing.assert_allclose(np.asarray(got['relat_cam']),
                                   np.asarray(ref['relat_cam']),
                                   rtol=1e-4, atol=1e-2)


def test_mesh_flag_rejects_more_shards_than_devices(fixture_dir):
    """Requesting -mesh N beyond the local device count must fail loudly
    (make_mesh silently clamps; serving with fewer shards than the user
    asked for — or hitting an opaque divisibility error — is worse)."""
    import jax
    too_many = len(jax.devices()) + 1
    with pytest.raises(SystemExit, match='device'):
        cli(fixture_dir, 'out_m_over.json', ['-mesh', str(too_many)])


def test_mesh_quantize_compose(fixture_dir):
    """-mesh and -quantize compose on the CLI: calibrate-on-first-batch int8
    serving through the data-parallel predictor (quantize resets the jitted
    forward; the int8 serve_variables then replicate over the mesh)."""
    blob = cli(fixture_dir, 'out_mq.json', ['-batch_size', '3', '-mesh', '2',
                                            '-quantize'])
    qref = cli(fixture_dir, 'out_q1.json', ['-batch_size', '3', '-quantize'])
    assert len(blob['frames']) == 3
    for ref, got in zip(qref['frames'], blob['frames']):
        relat = np.asarray(got['relat_cam'])
        assert relat.shape == (19, 3) and np.all(np.isfinite(relat))
        # same int8 graph, same calibration batch -> same outputs up to
        # cross-batch-size XLA scheduling noise
        np.testing.assert_allclose(relat, np.asarray(ref['relat_cam']),
                                   rtol=0, atol=1e-3)
