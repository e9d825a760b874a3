"""Round-5: int8 serving accuracy on a TRAINED checkpoint under a SHIFTED
held-out distribution (VERDICT r4 next-#5 — closes the "synthetic-overfit
scale" caveat as far as this box allows).

Protocol:
  1. Train the eval-parity configuration through the real CLI (main.py,
     resnet18 @65^2, geometry+colour augmentation) on a 48-sample synthetic
     CMU fixture for 12 epochs -> model_12.pth (the same torch-format
     interchange a user would quantize).
  2. Load it into serve.Predictor; calibrate int8 scales with
     `quantize(...)` over 4 TRAIN-distribution batches (the production
     -calib_batches flow).
  3. Evaluate MPJPE (root-relative decoded mm vs GT) in bf16 and int8 on
     two held-out sets:
       a. SHIFTED AUGMENTATION of the training scenes — different zoom
          regime (-random_zoom 0.6 vs the 0.9 the calibration saw) and
          different colour draws (different loader seed). The model still
          performs here, so the int8 delta is measured against meaningful
          outputs; the activation distribution is the shift the r4
          Calibrator work guards against.
       b. entirely NEW scenes (different generator seed) — reported as a
          secondary robustness row; a 48-scene overfit does not
          generalize scene-wise, so its absolute MPJPE is large and only
          the bf16-vs-int8 delta is informative there.

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python docs/experiments/r5_int8_trained.py
"""
import json
import os
import subprocess
import sys
import tempfile
import types

import jax

jax.config.update('jax_platforms', 'cpu')
REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_cli(flags):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    r = subprocess.run([sys.executable, 'main.py'] + flags, cwd=REPO,
                       capture_output=True, text=True, env=env, timeout=3600)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def make_args(metadata_path, random_zoom):
    return types.SimpleNamespace(
        criterion='SmoothL1', half_acc=False, depth=4, num_joints=19,
        depth_range=1000.0, side_in=65, stride=32, grad_norm=5.0,
        weight_decay=4e-5, loss_div=10.0, do_track=False, joint_space=False,
        shuffle=True, geometry=True, colour=True, eraser=False,
        occluder=False, occ_path=None, occ_count=0, batch_size=8,
        data_name='cmu', metadata_path=metadata_path,
        random_zoom=random_zoom, n_cudas=1, workers=1, nexponent=False,
        to_depth=False, extra_channel=False, model='resnet18',
        depth_only=False, skip_relu=False, early_dist=False)


def batches_from(metadata_path, random_zoom, seed, n):
    from datasets import build_info
    from pose_tpu.data.loader import PoseLoader
    loader = PoseLoader(make_args(metadata_path, random_zoom), 'train',
                        build_info('cmu'), seed=seed)
    out = []
    for batch in loader:
        out.append({k: np.asarray(v) for k, v in batch.items()
                    if hasattr(v, 'shape')})
        if len(out) >= n:
            break
    return out


def mpjpe(out_relat, true_cam, key=2):
    relat = np.asarray(out_relat) - np.asarray(out_relat)[:, key:key + 1]
    true = true_cam - true_cam[:, key:key + 1]
    return float(np.mean(np.linalg.norm(relat - true, axis=-1)))


def main():
    from pose_tpu import serve
    from pose_tpu.data.synthetic import make_cmu_fixture
    from pose_tpu.models import convert

    work = tempfile.mkdtemp(prefix='int8trained_')
    train_fix = make_cmu_fixture(os.path.join(work, 'train'), num_train=48,
                                 num_valid=8)
    # a held-out scene population: a different generator seed draws fresh
    # scenes (poses, cameras, textures)
    held_fix = make_cmu_fixture(os.path.join(work, 'held'), num_train=48,
                                num_valid=8, seed=23)

    save = os.path.join(work, 'save')
    n_epochs = int(os.environ.get('R5_INT8_EPOCHS', 40))
    flags = ['-suffix', 'q', '-criterion', 'SmoothL1', '-batch_size', '8',
             '-side_in', '65', '-stride', '32', '-depth', '4',
             '-n_epochs', str(n_epochs), '-n_cudas', '1',
             '-learn_rate', '1e-4',
             '-model', 'resnet18', '-data_name', 'cmu', '-num_joints', '19',
             '-metadata_path', train_fix, '-save_path', save,
             '-shuffle', '-save_record', '-geometry', '-colour']
    out = run_cli(flags)
    print(json.dumps({'trained': True,
                      'last_line': out.strip().splitlines()[-1][:120]}),
          flush=True)
    ckpt_path = os.path.join(save, 'resnet18-q', 'model_%d.pth' % n_epochs)
    assert os.path.exists(ckpt_path)

    args = make_args(train_fix, 0.9)
    p = serve.Predictor(args, 'rgb', batch_size=8)
    ckpt = convert.load_torch_file(ckpt_path)
    p.variables = convert.variables_from_torch(
        jax.device_get(p.variables), ckpt['model'], verbose=False)

    calib = batches_from(train_fix, random_zoom=0.9, seed=0, n=4)
    # same aug distribution, fresh draws: the in-distribution floor
    train_dist = batches_from(train_fix, random_zoom=0.9, seed=29, n=5)
    shift_aug = batches_from(train_fix, random_zoom=0.78, seed=17, n=5)
    new_scenes = batches_from(held_fix, random_zoom=0.78, seed=17, n=5)

    def eval_mpjpe(batches):
        per, n = 0.0, 0
        for b in batches:
            out = p.predict_crops(jnp.asarray(b['image']))
            per += mpjpe(out['relat_cam'], b['true_cam']) * len(b['image'])
            n += len(b['image'])
        return per / n

    sets = dict(train_dist=train_dist, shift_aug=shift_aug,
                new_scenes=new_scenes)
    bf = {name: eval_mpjpe(held) for name, held in sets.items()}

    p.quantize([jnp.asarray(b['image']) for b in calib])
    q8_train = {name: eval_mpjpe(held) for name, held in sets.items()}

    # control: calibration drawn from the SAME shifted distribution — how
    # much of the delta is calibration mismatch vs int8 itself
    # (re-quantize starts from the retained float originals)
    q8_matched = {}
    for name, held in sets.items():
        p.quantize([jnp.asarray(b['image']) for b in held[:4]])
        q8_matched[name] = eval_mpjpe(held)

    for name in sets:
        print(json.dumps({
            'exp': 'int8_trained_' + name,
            'bf16_mpjpe_mm': round(bf[name], 3),
            'int8_mpjpe_mm_train_calib': round(q8_train[name], 3),
            'int8_mpjpe_mm_matched_calib': round(q8_matched[name], 3),
            'delta_mm_train_calib': round(abs(q8_train[name] - bf[name]), 3),
            'delta_mm_matched_calib': round(
                abs(q8_matched[name] - bf[name]), 3)}), flush=True)


if __name__ == '__main__':
    main()
