"""Loss functions matching torch's nn.<X>Loss semantics (reduction='mean').

The reference instantiates its criterion by name from the -criterion flag
(`nn.__dict__[args.criterion + 'Loss']`, train.py:52, depth_train.py:104);
the launch scripts use SmoothL1. Masked variants replicate the reference's
`spec.view(-1, 3)[valid]` row-selection followed by mean over the selected
elements (train.py:174): a mean over (valid rows x coordinate dims).
"""

import jax
import jax.numpy as jnp


def smooth_l1(pred, target):
    """torch SmoothL1Loss, beta=1: 0.5 d^2 if |d| < 1 else |d| - 0.5."""
    d = pred - target
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def mse(pred, target):
    d = pred - target
    return d * d


def l1(pred, target):
    return jnp.abs(pred - target)


_CRITERIA = {'SmoothL1': smooth_l1, 'MSE': mse, 'L1': l1}


def get_criterion(name):
    if name not in _CRITERIA:
        raise KeyError(f'criterion {name!r} not supported '
                       f'(have {sorted(_CRITERIA)})')
    return _CRITERIA[name]


def masked_mean_loss(criterion, pred, target, valid):
    """mean(criterion(pred[valid], target[valid])) over coordinate elements of
    valid rows.

    pred/target: (B, J, D); valid: (B, J) in {0, 1}.
    """
    elem = criterion(pred, target)                       # (B, J, D)
    w = valid.astype(elem.dtype)[..., None]
    denom = jnp.maximum(jnp.sum(w) * elem.shape[-1], 1.0)
    return jnp.sum(elem * w) / denom


def bce_with_logits(logits, target):
    """torch F.binary_cross_entropy_with_logits, elementwise."""
    return (jnp.maximum(logits, 0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
