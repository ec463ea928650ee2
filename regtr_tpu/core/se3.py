"""SE(3) rigid-transform operations and the weighted Kabsch solver (JAX).

Poses are stored as (..., 3, 4) matrices (rotation | translation), the same
convention as the reference implementation (see /root/reference/src/utils/
se3_torch.py:1-154 for the behavioral contract).  All functions support
arbitrary leading batch dimensions and are jit/vmap/grad friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def se3_init(rot=None, trans=None):
    """Build a (..., 3, 4) pose from rotation (..., 3, 3) and/or translation.

    Translation may be (..., 3, 1) or (..., 3).  Missing rotation defaults to
    identity; missing translation defaults to zero.
    """
    if rot is None and trans is None:
        raise ValueError("need rotation and/or translation")
    if trans is not None and trans.shape[-1] != 1:
        trans = trans[..., None]
    if rot is not None and trans is not None:
        return jnp.concatenate([rot, trans], axis=-1)
    if rot is None:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=trans.dtype), trans.shape[:-2] + (3, 3))
        return jnp.concatenate([eye, trans], axis=-1)
    zeros = jnp.zeros(rot.shape[:-1] + (1,), dtype=rot.dtype)
    return jnp.concatenate([rot, zeros], axis=-1)


def se3_identity(batch_shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(
        jnp.eye(3, 4, dtype=dtype), tuple(batch_shape) + (3, 4)
    )


def se3_cat(a, b):
    """Compose two SE(3) transforms: result = a ∘ b."""
    rot_a, trans_a = a[..., :3, :3], a[..., :3, 3:4]
    rot_b, trans_b = b[..., :3, :3], b[..., :3, 3:4]
    rot = rot_a @ rot_b
    trans = rot_a @ trans_b + trans_a
    return jnp.concatenate([rot, trans], axis=-1)


def se3_inv(pose):
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    irot = jnp.swapaxes(rot, -1, -2)
    itrans = -irot @ trans
    return jnp.concatenate([irot, itrans], axis=-1)


def se3_transform(pose, xyz):
    """Apply pose ([..., 3, 4]) to points ([..., N, 3]) -> ([..., N, 3]).

    Leading dims of pose and xyz must broadcast (pose ([*], 3, 4) against
    xyz ([*], N, 3)).
    """
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return jnp.einsum("...ij,...nj->...ni", rot, xyz) + jnp.swapaxes(trans, -1, -2)


def se3_rot_trans(pose):
    return pose[..., :3, :3], pose[..., :3, 3]


def se3_compare(a, b):
    """Rotation (deg) and translation errors between two poses."""
    combined = se3_cat(a, se3_inv(b))
    trace = combined[..., 0, 0] + combined[..., 1, 1] + combined[..., 2, 2]
    rot_err_deg = jnp.degrees(
        jnp.arccos(jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0))
    )
    trans_err = jnp.linalg.norm(combined[..., :, 3], axis=-1)
    return {"rot_deg": rot_err_deg, "trans": trans_err}


def _svd_3x3(cov):
    """Batched SVD of 3x3 covariance matrices.

    jnp.linalg.svd handles batching; fp32 is sufficient here because the
    covariances are built from weight-normalized centered coordinates.
    """
    return jnp.linalg.svd(cov, full_matrices=True)


def compute_rigid_transform(a, b, weights=None):
    """Weighted Kabsch/Procrustes: find T = (R|t) with T*a ≈ b.

    Args:
        a: ([*,] N, 3) source points.
        b: ([*,] N, 3) target points (same shape as a).
        weights: ([*,] N) non-negative weights, or None for uniform.
            Padded/invalid rows should carry weight 0 — they then drop out of
            the solution exactly.

    Returns:
        ([*,] 3, 4) transform.

    Mirrors the semantics of the reference solver
    (/root/reference/src/utils/se3_torch.py:108-154): weight normalization
    clamped at 1e-6, det-based reflection fix via sign flip of the last
    right-singular vector.
    """
    if weights is None:
        weights = jnp.ones(a.shape[:-1], dtype=a.dtype)
    w = weights[..., None]
    w_sum = jnp.clip(jnp.sum(w, axis=-2, keepdims=True), _EPS, None)
    w_norm = w / w_sum
    centroid_a = jnp.sum(a * w_norm, axis=-2, keepdims=True)
    centroid_b = jnp.sum(b * w_norm, axis=-2, keepdims=True)
    a_c = a - centroid_a
    b_c = b - centroid_b
    cov = jnp.swapaxes(a_c, -2, -1) @ (b_c * w_norm)

    u, _, vh = _svd_3x3(cov)
    v = jnp.swapaxes(vh, -2, -1)
    ut = jnp.swapaxes(u, -2, -1)
    rot_pos = v @ ut
    v_neg = v.at[..., :, 2].multiply(-1.0)
    rot_neg = v_neg @ ut
    det = jnp.linalg.det(rot_pos)
    rot = jnp.where((det > 0)[..., None, None], rot_pos, rot_neg)

    translation = (
        -rot @ jnp.swapaxes(centroid_a, -2, -1)
        + jnp.swapaxes(centroid_b, -2, -1)
    )
    return jnp.concatenate([rot, translation], axis=-1)


# --- SO(3)/SE(3) exponential and logarithm maps (used by augmentation and
# --- evaluation metrics; mirrors /root/reference/src/cvhelpers/lie/) ---------

def so3_hat(omega):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(mat):
    return jnp.stack(
        [mat[..., 2, 1], mat[..., 0, 2], mat[..., 1, 0]], axis=-1
    )


def so3_exp(omega):
    """Rodrigues' formula, (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    axis = omega / theta
    k = so3_hat(axis)
    theta = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + jnp.sin(theta) * k + (1.0 - jnp.cos(theta)) * (k @ k)


def so3_log(rot):
    """(..., 3, 3) -> (..., 3) rotation vector."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip(0.5 * (trace - 1.0), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = so3_vee(rot - jnp.swapaxes(rot, -1, -2))
    scale = jnp.where(
        theta[..., None] < 1e-6,
        0.5,
        theta[..., None] / (2.0 * jnp.sin(theta[..., None])),
    )
    return scale * vee
