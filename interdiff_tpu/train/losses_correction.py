"""Correction-network training losses — contracts from
`interdiff/train_correction_smpl.py:59-185` (8 pose-MSE terms + contact +
penetration with epoch annealing) and `train_correction_skeleton.py:84-126`
(the same 8 pose terms in quaternion space).

Batch-first: obj_pred/obj_gt [B, T, C].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from interdiff_tpu.geometry.rotations import rotation_6d_to_matrix
from interdiff_tpu.ops.signed_distance import (
    nearest_neighbor,
    safe_sqrt,
    signed_nearest,
)


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


@dataclass(frozen=True)
class CorrectionLossWeights:
    """Defaults = `train_correction_smpl.py:306-319` argparse (identical to
    the shipped correction.ckpt hparams)."""

    obj_rot: float = 0.1
    obj_nonrot: float = 0.1
    past: float = 0.5
    v: float = 1.0
    contact: float = 1.0
    penetration: float = 0.1
    use_annealing: bool = True
    second_stage: int = 20


def pose_terms(obj_pred: jax.Array, obj_gt: jax.Array, *, past_len: int,
               w: CorrectionLossWeights) -> Dict[str, jax.Array]:
    """The 8 shared pose-MSE terms (velocities here use real gt deltas)."""
    p = past_len
    rot, rot_g = obj_pred[..., :-3], obj_gt[..., :-3]
    tr, tr_g = obj_pred[..., -3:], obj_gt[..., -3:]
    d = lambda x: x[:, 1 : p + 1] - x[:, :p]
    df = lambda x: x[:, p:] - x[:, p - 1 : -1]
    return {
        "obj_rot_past": _mse(rot[:, :p], rot_g[:, :p]) * w.obj_rot * w.past,
        "obj_nonrot_past": _mse(tr[:, :p], tr_g[:, :p]) * w.obj_nonrot * w.past,
        "obj_rot_v_past": _mse(d(rot), d(rot_g)) * w.v * w.obj_rot * w.past,
        "obj_nonrot_v_past": _mse(d(tr), d(tr_g)) * w.v * w.obj_nonrot * w.past,
        "obj_rot_future": _mse(rot[:, p:], rot_g[:, p:]) * w.obj_rot,
        "obj_nonrot_future": _mse(tr[:, p:], tr_g[:, p:]) * w.obj_nonrot,
        "obj_rot_v_future": _mse(df(rot), df(rot_g)) * w.v * w.obj_rot,
        "obj_nonrot_v_future": _mse(df(tr), df(tr_g)) * w.v * w.obj_nonrot,
    }


def contact_penetration_terms(
    obj_pred: jax.Array,  # [B, T, 9] rot6d + trans
    obj_points: jax.Array,  # [B, P, >=3] canonical template
    human_verts: jax.Array,  # [B, T, V, 7] xyz | normals | contact label
    *, nn_chunk: Optional[int] = 512,
) -> Tuple[jax.Array, jax.Array]:
    """(loss_contact, loss_penetration) (`train_correction_smpl.py:103-156`).

    contact: mean |h2o| over labelled-contact verts farther than 0.02 m;
    penetration: mean |o2h| weighted 20 on object points inside the body.
    """
    B, T = obj_pred.shape[:2]
    rot = rotation_6d_to_matrix(obj_pred[..., :6])  # [B,T,3,3]
    pts = (jnp.einsum("btij,bpj->btpi", rot, obj_points[..., :3])
           + obj_pred[..., None, 6:9])

    # the reference's bidirectional `point2point_signed` call
    # (`train_correction_smpl.py:131`) is split into its two genuinely-used
    # halves: the o2h direction needs distance AND pseudonormal sign (one
    # fused signed-NN sweep), the h2o direction is consumed only through
    # |h2o| (y_normals=None upstream), i.e. a plain NN distance — neither
    # needs the argmin gathers of the general routine, and both carry the
    # custom-VJP gradient back to the predicted object pose
    hv = human_verts.reshape(B * T, -1, 7)
    pts_flat = pts.reshape(B * T, -1, 3)
    o2h_sq, o2h_dot = signed_nearest(
        pts_flat, hv[..., :3], hv[..., 3:6], chunk=nn_chunk)
    # safe_sqrt: the clamped sq formulation hits exactly 0 for touching
    # geometry and grad(sqrt)(0)=inf would NaN the training step
    o2h_signed = safe_sqrt(o2h_sq) * jnp.sign(o2h_dot)
    h2o_sq, _ = nearest_neighbor(hv[..., :3], pts_flat, chunk=nn_chunk)
    h2o = safe_sqrt(h2o_sq)

    contact_label = hv[..., 6]
    v_contact = jnp.logical_and(h2o > 0.02,
                                contact_label > 0.5).astype(jnp.float32)
    loss_contact = jnp.mean(h2o * v_contact)

    w_pen = jnp.where(o2h_signed < 0, 20.0, 0.0)
    loss_penetration = jnp.mean(jnp.abs(o2h_signed) * w_pen)
    return loss_contact, loss_penetration


def correction_smpl_losses(
    obj_pred: jax.Array, obj_gt: jax.Array, *, past_len: int,
    obj_points: jax.Array, human_verts: jax.Array, epoch: jax.Array,
    weights: CorrectionLossWeights = CorrectionLossWeights(),
    nn_chunk: Optional[int] = 512,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full SMPL correction loss (`calc_loss_contact`, `:103-185`)."""
    w = weights
    terms = pose_terms(obj_pred, obj_gt, past_len=past_len, w=w)
    loss_contact, loss_pen = contact_penetration_terms(
        obj_pred, obj_points, human_verts, nn_chunk=nn_chunk)
    if w.use_annealing:
        anneal = jnp.clip(epoch.astype(jnp.float32) / w.second_stage, 0.0, 1.0)
    else:
        anneal = jnp.asarray(1.0)
    terms["contact"] = anneal ** 2 * loss_contact * w.contact
    terms["penetration"] = anneal ** 2 * loss_pen * w.penetration
    return sum(terms.values()), terms


def correction_skeleton_losses(
    obj_pred: jax.Array, obj_gt: jax.Array, *, past_len: int,
    weights: CorrectionLossWeights = CorrectionLossWeights(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Skeleton correction loss: 8 quaternion-space pose terms
    (`train_correction_skeleton.py:84-126`); obj layout [quat(4) | trans(3)]
    via `[..., :-3]` / `[..., -3:]` slicing, same as the reference."""
    terms = pose_terms(obj_pred, obj_gt, past_len=past_len, w=weights)
    return sum(terms.values()), terms
