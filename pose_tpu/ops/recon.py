"""Least-squares camera-space root reconstruction ("tracking").

Re-implements utils.get_recon_cam (utils.py:335-371, differentiable train-time
version) and utils.get_deter_cam (utils.py:296-332, eval version) as one jnp
function — on TPU the same jitted math serves both paths, and it is
differentiable by construction.

Given predicted 2D pixels and root-relative 3D, solve for the absolute root
translation r from the projective constraints: per joint with normalized image
coords x̃, A_j = [I₂ | −x̃_j], b_j = x̃_j·z_j − xy_j, then r = (AᵀA)⁻¹Aᵀb.

The reference's versions reference an undefined `valid` in their assertions
(utils.py:311-312, :350-351 — a latent NameError); the assertions are dropped
here (documented divergence, SURVEY.md §7 item 5).
"""

import jax
import jax.numpy as jnp

# small-matrix math must run exact fp32 (default matmul precision may use
# bf16 MXU passes, which costs millimetres here)
_HI = jax.lax.Precision.HIGHEST


def recon_root(spec_mat, relat_cam, intrinsics):
    """
    Args:
        spec_mat: (B, J, 2) estimated image coordinates
        relat_cam: (B, J, 3) root-relative camera coordinates
        intrinsics: (B, 3, 3) camera intrinsics

    Returns:
        (B, J, 3) absolute camera coordinates (relat_cam + root).
    """
    dim_batch, dim_joint = spec_mat.shape[:2]

    unproject = jnp.transpose(jnp.linalg.inv(intrinsics), (0, 2, 1))

    augment = jnp.ones((dim_batch, dim_joint, 1), spec_mat.dtype)
    normalized = jnp.concatenate([spec_mat, augment], axis=-1)
    normalized = jnp.einsum('bij,bjk->bik', normalized, unproject, precision=_HI)[:, :, :2]

    eye = jnp.tile(jnp.eye(2, dtype=spec_mat.dtype), (dim_joint, 1))
    A = jnp.broadcast_to(eye, (dim_batch, dim_joint * 2, 2))
    A = jnp.concatenate([A, -normalized.reshape(dim_batch, -1, 1)], axis=-1)

    b = (normalized * relat_cam[:, :, 2:]
         - relat_cam[:, :, :2]).reshape(dim_batch, -1, 1)

    At = jnp.transpose(A, (0, 2, 1))
    gram = jnp.einsum('bij,bjk->bik', At, A, precision=_HI)                  # (B, 3, 3)
    rhs = jnp.einsum('bij,bjk->bik', At, b, precision=_HI)                   # (B, 3, 1)
    refer = jnp.linalg.solve(gram, rhs)                       # (B, 3, 1)

    return relat_cam + jnp.transpose(refer, (0, 2, 1))


# Aliases keeping the reference's two entry-point names (train./eval paths):
get_recon_cam = recon_root
get_deter_cam = recon_root
