"""Evaluation metrics, both tracks — contracts from
`interdiff/eval_smpl_short.py:24-81` and
`interdiff/train_diffusion_skeleton.py:65-87`.

All batch-first: time is axis 1.  Callers slice to future frames before
calling (the reference passes `[args.past_len:]` slices).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from interdiff_tpu.geometry.normals import vertex_normals
from interdiff_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
)
from interdiff_tpu.ops.signed_distance import (
    signed_nearest,
    signed_nearest_pruned,
)


def quat_min_error(q_pred: jax.Array, q_gt: jax.Array, *,
                   ord: int = 1) -> jax.Array:
    """Sign-invariant quaternion error min(|q-q̂|, |q+q̂|) over the last axis
    (L1 for the SMPL track `eval_smpl_short.py:68-70`, L2 for the skeleton
    track `train_diffusion_skeleton.py:78-80`)."""
    e1 = jnp.linalg.norm(q_pred - q_gt, ord=ord, axis=-1)
    e2 = jnp.linalg.norm(q_pred + q_gt, ord=ord, axis=-1)
    return jnp.minimum(e1, e2)


def smpl_metrics(
    obj_pred: jax.Array,  # [B, T, 6] axis-angle(3) + trans(3)
    body_jtr: jax.Array,  # [B, T, J, 3]
    body: jax.Array,  # [B, T, D] (last 3 = trans)
    obj_gt: jax.Array,  # [B, T, 6]
    body_jtr_gt: jax.Array,
    body_gt: jax.Array,
    verts: jax.Array,  # [B, T, V, 3]
    faces: jax.Array,  # [F, 3]
    obj_points: jax.Array,  # [B, P, 3] canonical template xyz
    *, nn_chunk: Optional[int] = 512,
    nn_prune_delta: Optional[float] = None,
) -> Dict[str, jax.Array]:
    """Per-sample metric dict [B] (`eval_smpl_short.py:24-81`)."""
    B, T = obj_pred.shape[:2]

    rot = axis_angle_to_matrix(obj_pred[..., :3])  # [B,T,3,3]
    obj_points_pred = (jnp.einsum("btij,bpj->btpi", rot, obj_points)
                       + obj_pred[..., None, 3:])

    # the reference computes a full bidirectional chamfer here
    # (`eval_smpl_short.py:37-40`) but consumes only the o2h *sign*; the
    # fused signed-NN (ops/signed_distance.signed_nearest) produces exactly
    # that in one sweep — the 6890-query verts->obj direction and all four
    # argmin gathers of point2point_signed are dropped.  The DEFAULT is
    # the reference-faithful FULL sweep: the vertex-pseudonormal sign test
    # the reference's metric is defined by reports negative (penetrating)
    # signs for some points far OUTSIDE a posed body (concave folds), and
    # those far-field artifact signs are part of the metric's semantics —
    # on the real staged sequence the full-sweep penetrate is 0.1809 vs
    # 0.0295 with delta=0.25 pruning (the pruned value is closer to the
    # geometric truth: the stand-in body's max interior-to-vertex distance
    # ~0.17 m makes a true inside point beyond 0.25 m of every vertex
    # impossible — but changing the number 6x silently is not parity).
    # Pass nn_prune_delta (e.g. 0.25) to opt into the pruned accelerator.
    v_flat = verts.reshape(B * T, -1, 3)
    normals = vertex_normals(v_flat, faces)
    queries = obj_points_pred.reshape(B * T, -1, 3)
    if nn_prune_delta is not None:
        _, o2h_dot = signed_nearest_pruned(
            queries, v_flat, normals, delta=nn_prune_delta, chunk=nn_chunk)
    else:
        _, o2h_dot = signed_nearest(queries, v_flat, normals, chunk=nn_chunk)
    penetrate = jnp.mean((o2h_dot < 0).reshape(B, T, -1)
                         .astype(jnp.float32), axis=(1, 2))

    global_mpjpe = jnp.linalg.norm(body_jtr - body_jtr_gt, axis=-1
                                   ).mean(axis=(1, 2))
    local = body_jtr - body_jtr[:, :, 0:1]
    local_gt = body_jtr_gt - body_jtr_gt[:, :, 0:1]
    local_mpjpe = jnp.linalg.norm(local - local_gt, axis=-1).mean(axis=(1, 2))

    body_translation = jnp.linalg.norm(
        body[..., -3:] - body_gt[..., -3:], axis=-1).mean(axis=1)
    obj_translation = jnp.linalg.norm(
        obj_pred[..., -3:] - obj_gt[..., -3:], axis=-1).mean(axis=1)

    q_pred = axis_angle_to_quaternion(obj_pred[..., :3])
    q_gt = axis_angle_to_quaternion(obj_gt[..., :3])
    obj_rot_error = quat_min_error(q_pred, q_gt, ord=1).mean(axis=1)

    return {
        "global_mpjpe": global_mpjpe,
        "local_mpjpe": local_mpjpe,
        "body_translation": body_translation,
        "obj_translation": obj_translation,
        "obj_rot_error": obj_rot_error,
        "penetrate": penetrate,
    }


def skeleton_metrics(
    body_pred: jax.Array,  # [B, T, J, 3]
    body_gt: jax.Array,
    obj_pred: jax.Array,  # [B, T, P, 3]
    obj_gt: jax.Array,
    pose_pred: jax.Array,  # [B, T, 7]
    pose_gt: jax.Array,
    *, start: int = 10,
) -> Dict[str, jax.Array]:
    """Scalar metric dict over frames ``start:``
    (`train_diffusion_skeleton.py:65-87`)."""
    s = start
    mpjpe_h = jnp.linalg.norm(body_pred[:, s:] - body_gt[:, s:], axis=-1).mean()
    mpjpe_o = jnp.linalg.norm(obj_pred[:, s:] - obj_gt[:, s:], axis=-1).mean()
    translation_error = jnp.linalg.norm(
        pose_pred[:, s:, :3] - pose_gt[:, s:, :3], axis=-1).mean()
    rotation_error = quat_min_error(
        pose_pred[:, s:, -4:], pose_gt[:, s:, -4:], ord=2).mean()
    return {
        "mpjpe_h": mpjpe_h,
        "mpjpe_o": mpjpe_o,
        "translation_error": translation_error,
        "rotation_error": rotation_error,
    }


def smooth_seam(x: jax.Array, future_len: int) -> jax.Array:
    """C1-continuity fix at the past/future seam (`eval_smpl_short.py:217-223`):
    shift all future frames by the extrapolation residual.  Batch-first, time
    axis 1."""
    F = future_len
    delta = 2 * x[:, -F - 1] - x[:, -F - 2] - x[:, -F]
    return x.at[:, -F:].add(delta[:, None])
