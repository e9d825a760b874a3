"""Reference-exact BatchNorm: torch BatchNorm2d running-stat bookkeeping.

flax's `nn.BatchNorm` folds the BIASED batch variance into `running_var`;
torch folds the UNBIASED one — `var * n / (n - 1)` with `n = batch *
spatial` elements per channel (reference resnet.py:141-148 uses torch
BatchNorm2d; the correction lives in ATen's batch_norm update). The
normalization itself uses the biased variance in BOTH frameworks, so
train-mode outputs, gradients and losses are identical either way — only
the eval-mode statistics differ, by ~1/n per step, compounding along
training.

That difference is not cosmetic: the f64 distill convergence twin agreed to
1.1e-05 in every one of 300 train losses yet differed 5.9 mm in eval-mode
MPJPE before this module existed — near an overfit minimum the volumetric
softmax is sharply peaked and a ~1% running_var offset moves decoded
eval coordinates by millimetres. `ReferenceBatchNorm` replicates torch's
update so the eval path matches the reference too.

Drop-in for this repo's `nn.BatchNorm(use_running_average=..., momentum=0.9,
epsilon=..., name=...)` call sites: param ('scale'/'bias') and batch_stats
('mean'/'var') names, shapes and inits are identical, so checkpoints
(models/convert.py) are unaffected. Stats math runs in float32 (or the
promoted input dtype under x64), matching flax's half-dtype handling.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class ReferenceBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones_init(), (c,))
        bias = self.param('bias', nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        dtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(dtype)
        if self.use_running_average or self.is_initializing():
            mean = ra_mean.value.astype(dtype)
            var = ra_var.value.astype(dtype)
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            # biased batch variance normalizes (same as flax/torch) ...
            var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            n = 1
            for a in red:
                n *= x.shape[a]
            # ... the UNBIASED one feeds the running stats (torch semantics)
            unbiased = var * (n / (n - 1)) if n > 1 else var
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * unbiased)

        mul = scale.astype(dtype) * jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean) * mul + bias.astype(dtype)
        return y.astype(x.dtype)
