"""End-to-end pretrain-checkpoint ingestion on the Bottleneck (resnet50)
trunk: construct a state_dict with torchvision resnet50's EXACT key set and
shapes, push it through convert.load_pretrained for every warm-start
surgery, and assert full key consumption on both sides:

- every torch key is consumed except the classifier head (fc.*), which the
  reference also discards (resnet.py:226-231 prints 'deleted');
- every flax template param/stat is overwritten except the pose heads the
  pretrain cannot provide (cam/mat regressors, fusion block).

A silent key mismatch here would poison every -pretrain run
(reference surgeries: resnet.py:221-224, depthnet.py:211-217,
fusionnet.py:243-262, partial_depthnet.py:232-257).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flax import traverse_util

from pose_tpu.models import convert
from pose_tpu.models.resnet import PoseResNet

# torchvision resnet50 topology: stage -> (planes, blocks, inplanes)
R50_STAGES = (('layer1', 64, 3, 64), ('layer2', 128, 4, 256),
              ('layer3', 256, 6, 512), ('layer4', 512, 3, 1024))


def _bn_entries(state, prefix, n, rng):
    state[prefix + '.weight'] = rng.standard_normal(n).astype(np.float32)
    state[prefix + '.bias'] = rng.standard_normal(n).astype(np.float32)
    state[prefix + '.running_mean'] = rng.standard_normal(n).astype(
        np.float32)
    state[prefix + '.running_var'] = rng.uniform(
        0.5, 2.0, n).astype(np.float32)
    state[prefix + '.num_batches_tracked'] = np.asarray(0, np.int64)


def tv_resnet50_state(seed=0):
    """Synthetic state_dict with torchvision resnet50's exact keys/shapes
    (derivable offline from the architecture; no download needed)."""
    rng = np.random.default_rng(seed)
    state = {}

    def conv(key, out_c, in_c, k):
        state[key] = rng.standard_normal(
            (out_c, in_c, k, k)).astype(np.float32)

    conv('conv1.weight', 64, 3, 7)
    _bn_entries(state, 'bn1', 64, rng)

    for name, planes, blocks, inplanes in R50_STAGES:
        for i in range(blocks):
            cin = inplanes if i == 0 else planes * 4
            base = f'{name}.{i}'
            conv(base + '.conv1.weight', planes, cin, 1)
            _bn_entries(state, base + '.bn1', planes, rng)
            conv(base + '.conv2.weight', planes, planes, 3)
            _bn_entries(state, base + '.bn2', planes, rng)
            conv(base + '.conv3.weight', planes * 4, planes, 1)
            _bn_entries(state, base + '.bn3', planes * 4, rng)
            if i == 0:
                conv(base + '.downsample.0.weight', planes * 4, cin, 1)
                _bn_entries(state, base + '.downsample.1', planes * 4, rng)

    state['fc.weight'] = rng.standard_normal((1000, 2048)).astype(np.float32)
    state['fc.bias'] = rng.standard_normal(1000).astype(np.float32)
    return state


TV_KEYS_REAL = {k for k in tv_resnet50_state()
                if not k.endswith('num_batches_tracked')}
FC_KEYS = {'fc.weight', 'fc.bias'}


def _template(variant, in_channels, joint_space=False):
    model = PoseResNet(block='bottleneck', layers=(3, 4, 6, 3),
                       variant=variant, in_channels=in_channels, stride=16,
                       num_joints=19, depth=16, joint_space=joint_space,
                       bn_impl='xla')
    x = jnp.zeros((1, 65, 65, in_channels), jnp.float32)
    if variant in ('fusion', 'partial_fusion'):
        y = jnp.zeros((1, 65, 65, 1), jnp.float32)
        return model, model.init(jax.random.PRNGKey(0), x, y, train=False)
    return model, model.init(jax.random.PRNGKey(0), x, train=False)


def _torch_keys_of(variables):
    flat = traverse_util.flatten_dict(variables)
    return {convert.to_torch_key(p)[0]: p for p in flat}


def _host_depth_state(seed=7, in_channels=1):
    """A trained depthnet-style checkpoint: trunk + 1ch stem + regressor."""
    state = tv_resnet50_state(seed)
    del state['fc.weight'], state['fc.bias']
    state['conv1.weight'] = state['conv1.weight'][:, :in_channels]
    rng = np.random.default_rng(seed + 1)
    state['regressor.weight'] = rng.standard_normal(
        (16 * 19, 2048, 3, 3)).astype(np.float32)
    state['regressor.bias'] = rng.standard_normal(16 * 19).astype(np.float32)
    return state


def _run(template_variables, args, variant):
    report = {}
    loaded = convert.load_pretrained(template_variables, args, variant,
                                     report=report)
    return loaded, report


def _flat(vs):
    return traverse_util.flatten_dict(vs)


# ------------------------------------------------------------ rgb flagship


def test_rgb_extra_channel_ingestion(tmp_path):
    tv = tv_resnet50_state()
    path = tmp_path / 'tv.pth'
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               str(path))

    _, template = _template('rgb', in_channels=4, joint_space=True)
    args = types.SimpleNamespace(model_path=str(path), extra_channel=True)
    loaded, report = _run(template, args, 'rgb')

    # every real torchvision key consumed except the classifier
    assert report['unused'] == FC_KEYS
    # every template entry filled except the two pose heads
    assert set(report['missing']) == {
        'cam_regressor.weight', 'cam_regressor.bias',
        'mat_regressor.weight', 'mat_regressor.bias'}

    flat_l, flat_t = _flat(loaded), _flat(template)
    conv1 = flat_l[('params', 'conv1', 'kernel')]
    np.testing.assert_array_equal(
        np.asarray(conv1)[..., :3, :],
        tv['conv1.weight'].transpose(2, 3, 1, 0))
    # 4th (bbox-mask) input channel keeps the template init (resnet.py:224)
    np.testing.assert_array_equal(
        np.asarray(conv1)[..., 3, :],
        np.asarray(flat_t[('params', 'conv1', 'kernel')])[..., 3, :])
    # deep spot checks: last stage + batch stats
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer4', '2', 'conv3', 'kernel')]),
        tv['layer4.2.conv3.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(flat_l[('batch_stats', 'layer3', '4', 'bn2', 'mean')]),
        tv['layer3.4.bn2.running_mean'])
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer2', '0', 'downsample_1',
                           'scale')]),
        tv['layer2.0.downsample.1.weight'])


# ------------------------------------------------------- depth-only / host


def test_depth_only_ingestion(tmp_path):
    tv = tv_resnet50_state()
    path = tmp_path / 'tv.pth'
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               str(path))

    _, template = _template('depth', in_channels=1)
    args = types.SimpleNamespace(model_path=str(path), depth_only=True,
                                 depth_host=False)
    loaded, report = _run(template, args, 'depth')

    assert report['unused'] == FC_KEYS
    assert set(report['missing']) == {'regressor.weight', 'regressor.bias'}
    # conv1 sliced to its first input channel (depthnet.py:211-213)
    np.testing.assert_array_equal(
        np.asarray(_flat(loaded)[('params', 'conv1', 'kernel')]),
        tv['conv1.weight'][:, :1].transpose(2, 3, 1, 0))


def test_depth_host_ingestion(tmp_path):
    host = _host_depth_state()
    path = tmp_path / 'host.pth'
    torch.save({'state': {'epoch': 3},
                'model': {k: torch.from_numpy(np.asarray(v))
                          for k, v in host.items()}}, str(path))

    _, template = _template('depth', in_channels=3)
    args = types.SimpleNamespace(host_path=str(path), depth_host=True,
                                 depth_only=False)
    loaded, report = _run(template, args, 'depth')

    # a full depthnet checkpoint fills EVERYTHING, including the regressor
    assert report['unused'] == set()
    assert report['missing'] == []
    # 1ch -> 3ch replicate scaled by 1/3 (depthnet.py:215-217)
    np.testing.assert_allclose(
        np.asarray(_flat(loaded)[('params', 'conv1', 'kernel')]),
        np.repeat(host['conv1.weight'] / 3.0, 3,
                  axis=1).transpose(2, 3, 1, 0), rtol=1e-6)


# ----------------------------------------------------------------- fusion


def test_fusion_manual_update_ingestion(tmp_path):
    tv = tv_resnet50_state()
    path = tmp_path / 'tv.pth'
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               str(path))

    _, template = _template('fusion', in_channels=3)
    args = types.SimpleNamespace(model_path=str(path), depth_host=False)
    loaded, report = _run(template, args, 'fusion')

    assert report['unused'] == FC_KEYS
    assert set(report['missing']) == {
        'fusion.conv.weight', 'fusion.bn.weight', 'fusion.bn.bias',
        'fusion.bn.running_mean', 'fusion.bn.running_var',
        'regressor.weight', 'regressor.bias'}

    flat_l = _flat(loaded)
    # depth branch seeded from the RGB stages (fusionnet.py:243-262)
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer5', '0', 'conv2', 'kernel')]),
        tv['layer1.0.conv2.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer6', '3', 'conv3', 'kernel')]),
        tv['layer2.3.conv3.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'conv2', 'kernel')]),
        tv['conv1.weight'][:, :1].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(flat_l[('batch_stats', 'bn2', 'var')]),
        tv['bn1.running_var'])


def test_fusion_depth_host_two_sources(tmp_path):
    """-depth_host fusion: trunk body from model_path, depth branch from
    host_path (fusionnet.py:270-276)."""
    tv = tv_resnet50_state(seed=1)
    host = _host_depth_state(seed=9)
    tv_path, host_path = tmp_path / 'tv.pth', tmp_path / 'host.pth'
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               str(tv_path))
    torch.save({'state': {}, 'model': {
        k: torch.from_numpy(np.asarray(v)) for k, v in host.items()}},
        str(host_path))

    _, template = _template('fusion', in_channels=3)
    args = types.SimpleNamespace(model_path=str(tv_path),
                                 host_path=str(host_path), depth_host=True)
    loaded, report = _run(template, args, 'fusion')

    flat_l = _flat(loaded)
    # depth branch comes from the HOST depth model...
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer5', '0', 'conv1', 'kernel')]),
        host['layer1.0.conv1.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'conv2', 'kernel')]),
        host['conv1.weight'][:, :1].transpose(2, 3, 1, 0))
    # ...while the shared body comes from model_path
    np.testing.assert_array_equal(
        np.asarray(flat_l[('params', 'layer3', '0', 'conv1', 'kernel')]),
        tv['layer3.0.conv1.weight'].transpose(2, 3, 1, 0))
    # host regressor/fc keys that the fusion surgery does not copy are the
    # only permissible unused leftovers besides fc
    assert report['unused'] == FC_KEYS


# ------------------------------------------------------- partial variants


def test_partial_depth_ingestion(tmp_path):
    tv = tv_resnet50_state()
    path = tmp_path / 'tv.pth'
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in tv.items()},
               str(path))

    _, template = _template('partial_depth', in_channels=1)
    args = types.SimpleNamespace(model_path=str(path), depth_only=True,
                                 depth_host=False)
    loaded, report = _run(template, args, 'partial_depth')

    assert report['unused'] == FC_KEYS
    assert set(report['missing']) == {'regressor.weight', 'regressor.bias'}
    # raw partial-conv kernels map onto the same torch keys
    np.testing.assert_array_equal(
        np.asarray(_flat(loaded)[('params', 'conv1_kernel')]),
        tv['conv1.weight'][:, :1].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(_flat(loaded)[('params', 'layer2', '1', 'conv2_kernel')]),
        tv['layer2.1.conv2.weight'].transpose(2, 3, 1, 0))


def test_tv_keyset_is_torchvision_exact():
    """Pin the synthetic dict's key census: torchvision resnet50 has 161
    weight/bias entries + 53 running_mean/var pairs... derived count:
    conv+bn+fc parameter keys = 267 + 53 num_batches_tracked = 320."""
    state = tv_resnet50_state()
    n_blocks = sum(b for _, _, b, _ in R50_STAGES)
    n_bns = 1 + 3 * n_blocks + 4          # stem + per-block + downsamples
    n_convs = 1 + 3 * n_blocks + 4
    expected = n_convs + 5 * n_bns + 2    # conv w + bn(4 stats+tracked) + fc
    assert len(state) == expected
    assert n_blocks == 16 and n_bns == 53
