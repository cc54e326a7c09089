"""Rotation representation conversions (pure jnp, broadcastable).

Conventions deliberately match the ones the reference pipeline relies on
(pytorch3d.transforms as used from `interdiff/model/diffusion_smpl.py:4`,
`interdiff/model/diffusion_skeleton.py:3`, `interdiff/model/correction_skeleton.py:4`):

  * quaternions are **wxyz** (real part first).  The skeleton dataset stores
    **xyzw** (scipy convention); use :func:`quat_xyzw_to_wxyz` /
    :func:`quat_wxyz_to_xyzw` at the boundary, mirroring the explicit swizzle
    at `interdiff/model/diffusion_skeleton.py:225`.
  * the 6-D rotation representation is the first two **rows** of the rotation
    matrix (Zhou et al.), matching ``pytorch3d.transforms.matrix_to_rotation_6d``.
  * ``matrix_to_quaternion`` reproduces pytorch3d's best-conditioned-branch
    selection (largest |component| is made positive) so downstream quaternion
    signs match the reference bit-for-bit in exact arithmetic.
  * ``matrix_to_axis_angle`` goes through quaternions, so the returned angle
    can exceed pi exactly like pytorch3d (unlike scipy, which wraps).

All functions take arrays with arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# quaternion order helpers
# ---------------------------------------------------------------------------

def quat_xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    """(x, y, z, w) -> (w, x, y, z); cf. `interdiff/model/diffusion_skeleton.py:225`."""
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def quat_wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    """(w, x, y, z) -> (x, y, z, w); cf. `interdiff/model/correction_skeleton.py:133`."""
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion
# ---------------------------------------------------------------------------

def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle -> quaternion (wxyz), pytorch3d semantics incl. Taylor guard."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x, with second-order Taylor expansion near 0 (pytorch3d exact form)
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return jnp.concatenate([jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    """Quaternion (wxyz) -> axis-angle, pytorch3d semantics (angle may exceed pi)."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return quaternions[..., 1:] / sin_half_over_angle


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """Unit quaternion (wxyz) -> rotation matrix [..., 3, 3]."""
    r, i, j, k = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(x, 0)) with a safe gradient: ``sqrt(maximum(x, 0))`` would
    evaluate sqrt AT 0 for clamped entries, whose inf backward factor turns
    any zero cotangent into NaN (hit when differentiating through
    matrix_to_quaternion of optimizer-perturbed non-orthonormal matrices —
    the post-hoc refinement path).  The double-where routes gradients only
    through the positive branch."""
    positive = x > 0
    safe_x = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe_x), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion (wxyz).

    Reproduces pytorch3d's numerically-stable branch selection: four candidate
    quaternions are formed (one per squared component) and the candidate whose
    defining component has the largest magnitude is returned; that component
    is positive by construction.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = (m[..., n] for n in range(9))

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    # Select by GATHER, not one-hot multiply: the unselected candidates can
    # carry inf local gradients (d sqrt/dx at ~0) and 0 * inf = NaN would
    # poison the backward pass; a gather routes zero cotangent around them
    # entirely (pytorch3d's boolean-mask indexing has the same property).
    best = jnp.argmax(q_abs, axis=-1)
    idx = best[..., None, None]
    idx = jnp.broadcast_to(idx, best.shape + (1, 4))
    return jnp.take_along_axis(quat_candidates, idx, axis=-2)[..., 0, :]


# ---------------------------------------------------------------------------
# axis-angle <-> matrix
# ---------------------------------------------------------------------------

def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (quaternion route)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (quaternion route)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6-D representation (Zhou et al.; rows convention)
# ---------------------------------------------------------------------------

def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> first two rows flattened [..., 6]."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6-D rep [..., 6] -> rotation matrix [..., 3, 3] via Gram-Schmidt (rows)."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# ---------------------------------------------------------------------------
# SMPL-specific Rodrigues quirk
# ---------------------------------------------------------------------------

def batch_rodrigues_smpl(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix replicating libsmpl's exact arithmetic.

    The reference (`libsmpl/smplpytorch/pytorch/rodrigues_layer.py:41-52`)
    computes ``angle = ||aa + 1e-8||`` — the scalar 1e-8 is added to every
    component *before* the norm — then normalises by that angle and goes
    through an (already unit) quaternion that is re-normalised in ``quat2mat``.
    We replicate the +1e-8 bias so SMPL forward kinematics agree with the
    reference to float32 round-off even at zero pose.
    """
    biased = axis_angle + 1e-8
    angle = jnp.linalg.norm(biased, axis=-1, keepdims=True)
    axis = axis_angle / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return quaternion_to_matrix(quat)
