"""PyTorch <-> Flax checkpoint conversion for the PoseResNet family.

Covers every warm-start path of the reference:

- ImageNet `-pretrain` with conv1 channel surgery: extra bbox channel
  (resnet.py:221-224), RGB->1ch slice for depth_only (depthnet.py:211-213),
  depth->3ch replicate for depth_host (depthnet.py:215-217);
- fusionnet `manual_update`: copy RGB stages into the depth branch
  (bn2<-bn1, layer5<-layer1, layer6<-layer2, conv2<-conv1[:, :1],
  fusionnet.py:243-262);
- loading reference-format `{'state': ..., 'model': state_dict}` checkpoints
  (-resume / -teacher_path / -host_path, log.py:33-40).

Our own checkpoints are saved in the *same* torch-key naming through
`variables_to_torch_state`, so `model_<E>.pth` files remain interchangeable
with reference tooling.

Key mapping (flax path -> torch key):
    params/layer1/0/conv1/kernel   -> layer1.0.conv1.weight   (HWIO -> OIHW)
    params/.../conv1_kernel        -> ....conv1.weight        (partial convs)
    params/.../downsample_0/kernel -> ....downsample.0.weight
    params/.../downsample_1/scale  -> ....downsample.1.weight (BN)
    params/fusion_conv/kernel      -> fusion.conv.weight
    batch_stats/.../bn1/mean       -> ....bn1.running_mean
"""

import numpy as np

try:
    import torch
except ImportError:  # torch is only needed for .pth IO
    torch = None

from flax import traverse_util


def _flax_scope_to_torch(scope_parts):
    out = []
    for part in scope_parts:
        if part == 'downsample_0':
            out.extend(['downsample', '0'])
        elif part == 'downsample_1':
            out.extend(['downsample', '1'])
        elif part == 'fusion_conv':
            out.extend(['fusion', 'conv'])
        elif part == 'fusion_bn':
            out.extend(['fusion', 'bn'])
        else:
            out.append(part)
    return out


def to_torch_key(path):
    """Map a flattened flax variables path (collection, *scopes, leaf) to the
    reference's torch state_dict key. Returns (key, transform) where transform
    is applied to the torch tensor on load ('conv' transposes OIHW->HWIO)."""
    collection, *scopes, leaf = path
    torch_scopes = _flax_scope_to_torch(scopes)

    if leaf.endswith('_kernel'):
        # partial-conv raw kernels: params/.../conv1_kernel
        torch_scopes.append(leaf[:-len('_kernel')])
        return '.'.join(torch_scopes + ['weight']), 'conv'

    if collection == 'batch_stats':
        mapping = {'mean': 'running_mean', 'var': 'running_var'}
        return '.'.join(torch_scopes + [mapping[leaf]]), 'none'

    mapping = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias'}
    transform = 'conv' if leaf == 'kernel' else 'none'
    return '.'.join(torch_scopes + [mapping[leaf]]), transform


def _to_numpy(tensor):
    if torch is not None and isinstance(tensor, torch.Tensor):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def variables_from_torch(template_variables, torch_state, strict=False,
                         verbose=True, report=None):
    """Fill a flax variables pytree from a torch state_dict.

    Keys present in the template but absent from torch_state keep their
    (randomly initialized) template values — mirroring the reference's
    `model_dict.update(toy_dict)` pattern (resnet.py:231). Shape-mismatched
    tensors raise (the surgeries below must run first).

    `report`, if given a dict, is filled with the full ingestion audit:
    'filled' (torch key -> flax path actually written), 'missing' (flax
    paths left at template values, as torch-key strings) and 'unused'
    (torch keys no template path consumed, num_batches_tracked excluded).
    """
    flat = traverse_util.flatten_dict(template_variables)
    torch_state = {k: _to_numpy(v) for k, v in torch_state.items()}
    filled, missing = {}, []

    new_flat = {}
    for path, value in flat.items():
        key, transform = to_torch_key(path)
        if key in torch_state:
            src = torch_state[key]
            if transform == 'conv':
                src = src.transpose(2, 3, 1, 0)
            if src.shape != value.shape:
                raise ValueError(
                    f'{key}: torch shape {src.shape} vs flax {value.shape} '
                    f'at {"/".join(path)} — missing surgery?')
            new_flat[path] = src.astype(np.asarray(value).dtype)
            filled[key] = path
        else:
            new_flat[path] = value
            missing.append(key)

    unused = {k for k in set(torch_state) - set(filled)
              if not k.endswith('num_batches_tracked')}
    if strict and missing:
        raise KeyError(f'missing torch keys: {missing}')
    if report is not None:
        report.update(filled=filled, missing=missing, unused=unused)
    if verbose:
        for key in sorted(unused):
            print('key [', key, '] deleted')
    return traverse_util.unflatten_dict(new_flat)


def variables_to_torch_state(variables):
    """Inverse mapping: flax variables -> torch-style state_dict (numpy)."""
    flat = traverse_util.flatten_dict(variables)
    state = {}
    for path, value in flat.items():
        key, transform = to_torch_key(path)
        arr = np.asarray(value)
        if transform == 'conv':
            arr = arr.transpose(3, 2, 0, 1)
        state[key] = arr
    return state


# ------------------------------------------------------------------ surgeries


def surgery_extra_channel(torch_state, model_conv1_oihw):
    """resnet.py:221-224: keep the model's 4-channel conv1, overwrite its
    first 3 input channels with the pretrain's RGB kernel."""
    tensor = np.array(model_conv1_oihw)
    tensor[:, :3] = _to_numpy(torch_state['conv1.weight'])
    torch_state = dict(torch_state)
    torch_state['conv1.weight'] = tensor
    return torch_state


def surgery_depth_only(torch_state):
    """depthnet.py:211-213: slice the RGB conv1 to its first input channel."""
    torch_state = dict(torch_state)
    torch_state['conv1.weight'] = _to_numpy(torch_state['conv1.weight'])[:, :1]
    return torch_state


def surgery_depth_host(torch_state):
    """depthnet.py:215-217: replicate a 1-channel depth conv1 to 3 channels,
    scaled by 1/3."""
    torch_state = dict(torch_state)
    w = _to_numpy(torch_state['conv1.weight'])
    torch_state['conv1.weight'] = np.repeat(w / 3.0, 3, axis=1)
    return torch_state


def surgery_fusion_manual_update(torch_state, manual_source=None):
    """fusionnet.py:243-262: seed the depth branch — bn2 <- bn1,
    layer5 <- layer1, layer6 <- layer2, conv2 <- conv1[:, :1].

    `manual_source` is the state the depth-branch keys are copied FROM;
    the reference separates it from the main body: with -depth_host the
    manual_update source is host_path['model'] (a trained depth model)
    while the trunk body still comes from model_path
    (fusionnet.py:270-276, partial_fusionnet.py:299-305)."""
    torch_state = dict(torch_state)
    if manual_source is None:
        manual_source = torch_state
    additions = {}
    for key, value in manual_source.items():
        if key.startswith('bn1'):
            additions[key.replace('bn1', 'bn2', 1)] = value
        elif key.startswith('layer1'):
            additions[key.replace('layer1', 'layer5', 1)] = value
        elif key.startswith('layer2'):
            additions[key.replace('layer2', 'layer6', 1)] = value
    additions['conv2.weight'] = _to_numpy(
        manual_source['conv1.weight'])[:, :1]
    additions.update(torch_state)  # existing keys win, as in the reference
    return additions


def load_torch_file(path):
    """Load a .pth file; returns the raw object (state_dict or
    {'state':..., 'model':...})."""
    if torch is None:
        raise RuntimeError('torch is required for .pth IO')
    return torch.load(path, map_location='cpu', weights_only=False)


def save_torch_file(obj, path):
    if torch is None:
        raise RuntimeError('torch is required for .pth IO')
    torch.save(obj, path)


def load_pretrained(template_variables, args, variant, report=None):
    """The full -pretrain / -depth_host warm-start path for a given model
    variant, mirroring resnet.py:213-262, depthnet.py:203-229,
    fusionnet.py:265-297, partial_depthnet.py:232-257."""
    if variant in ('depth', 'partial_depth') and getattr(args, 'depth_host', False):
        toy = load_torch_file(args.host_path)['model']
    else:
        toy = load_torch_file(args.model_path)
        if isinstance(toy, dict) and 'model' in toy and 'state' in toy:
            toy = toy['model']

    toy = {k: _to_numpy(v) for k, v in toy.items()}

    if variant == 'rgb' and getattr(args, 'extra_channel', False):
        flat = traverse_util.flatten_dict(template_variables)
        model_conv1 = np.asarray(
            flat[('params', 'conv1', 'kernel')]).transpose(3, 2, 0, 1)
        toy = surgery_extra_channel(toy, model_conv1)
    if variant in ('depth', 'partial_depth'):
        if getattr(args, 'depth_host', False):
            toy = surgery_depth_host(toy)
        elif getattr(args, 'depth_only', False):
            toy = surgery_depth_only(toy)
    if variant in ('fusion', 'partial_fusion'):
        manual_src = toy
        if getattr(args, 'depth_host', False):
            manual_src = {k: _to_numpy(v) for k, v in
                          load_torch_file(args.host_path)['model'].items()}
        toy = surgery_fusion_manual_update(toy, manual_src)

    return variables_from_torch(template_variables, toy, report=report)
