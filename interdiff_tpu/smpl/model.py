"""SMPL / SMPL-H linear-blend-skinning forward kinematics, pure JAX.

Behavioural contract: `interdiff/libsmpl/smplpytorch/pytorch/smpl_layer.py:72-175`
(shape blendshapes -> pose blendshapes from (R - I) of the non-root joints ->
FK down the kinematic tree -> rest-pose removal -> LBS), returning
``(verts, joints, v_posed, naked)`` with the translation added at the end.

TPU-native redesign of the hot spots:

  * the reference runs FK as a Python loop appending [B,4,4] tensors
    (`smpl_layer.py:117-131`) — the single biggest CPU sink in the whole
    pipeline (SURVEY.md §3.1).  Here FK walks the tree *by depth level*:
    joints at the same depth compose with their parents in one batched
    einsum, so the 52-joint SMPL-H chain needs only ``max_depth`` (~15)
    sequential 4x4 matmul rounds and everything is one fused XLA program.
  * skinning is a single [V,J] x [B,J,12] matmul on the MXU instead of the
    [B,4,4,J] x [J,V] broadcast product.
  * everything vmaps over flattened T*B bodies; callers batch whole clips.
"""

from __future__ import annotations

from typing import List, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Body geometry is parity-critical (<1e-3 MPJPE vs the torch reference):
# force full-f32 matmuls regardless of the backend's default (TPU default
# precision runs f32 einsums through bf16 MXU passes).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from interdiff_tpu.geometry.rotations import axis_angle_to_matrix


def _depth_levels(parents: np.ndarray) -> List[np.ndarray]:
    """Group joint indices by depth in the kinematic tree (root = level 0)."""
    J = len(parents)
    depth = np.zeros(J, dtype=np.int64)
    for j in range(1, J):
        depth[j] = depth[parents[j]] + 1
    return [np.where(depth == d)[0] for d in range(depth.max() + 1)]


@struct.dataclass
class SmplModel:
    """Static model tensors (float32 on device; loaded from float64)."""

    v_template: jax.Array  # [V, 3]
    shapedirs: jax.Array  # [V, 3, num_betas]
    posedirs: jax.Array  # [V, 3, 9*(J-1)]
    j_regressor: jax.Array  # [J, V]
    weights: jax.Array  # [V, J]
    parents: np.ndarray = struct.field(pytree_node=False)  # [J] int
    faces: np.ndarray = struct.field(pytree_node=False)  # [F, 3] int
    levels: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, v_template, shapedirs, posedirs, j_regressor, weights,
               parents, faces) -> "SmplModel":
        parents = np.asarray(parents, dtype=np.int64)
        parents[0] = 0  # pkl stores 2**32-1 / -1 for the root
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            v_template=f32(v_template),
            shapedirs=f32(shapedirs),
            posedirs=f32(posedirs),
            j_regressor=f32(j_regressor),
            weights=f32(weights),
            parents=parents,
            faces=np.asarray(faces, dtype=np.int32),
            levels=tuple(tuple(int(j) for j in lvl)
                         for lvl in _depth_levels(parents)),
        )

    @property
    def num_joints(self) -> int:
        return int(self.j_regressor.shape[0])

    @property
    def num_verts(self) -> int:
        return int(self.v_template.shape[0])


def smpl_forward(model: SmplModel, pose_axisang: jax.Array,
                 betas: jax.Array, trans: jax.Array,
                 *, offsets: jax.Array | None = None, scale: float = 1.0):
    """LBS forward. pose_axisang [B, 3*J], betas [B, num_betas], trans [B, 3].

    Returns ``(verts [B,V,3], joints [B,J,3], v_posed [B,V,3], naked [B,V,3])``
    — same quadruple as the reference ``SMPL_Layer.forward``.
    """
    B = pose_axisang.shape[0]
    J = model.num_joints

    rots = axis_angle_to_matrix(pose_axisang.reshape(B, J, 3))  # [B,J,3,3]

    # shape blendshapes (`smpl_layer.py:96-103`)
    v_shaped = model.v_template + _einsum(
        "vdk,bk->bvd", model.shapedirs, betas)
    joints0 = _einsum("jv,bvd->bjd", model.j_regressor, v_shaped)

    # pose blendshapes from (R - I) of the non-root joints (`:105-107`)
    eye = jnp.eye(3, dtype=rots.dtype)
    pose_map = (rots[:, 1:] - eye).reshape(B, -1)  # [B, 9*(J-1)]
    naked = v_shaped + _einsum("vdp,bp->bvd", model.posedirs, pose_map)
    v_posed = naked if offsets is None else naked + offsets

    # FK by depth level: R_g/t_g accumulate global rotation/translation.
    rel_t = joints0 - joints0[:, np.asarray(model.parents)]  # [B,J,3]
    rel_t = rel_t.at[:, 0].set(joints0[:, 0])

    R_g = jnp.broadcast_to(eye, (B, J, 3, 3))
    t_g = jnp.zeros((B, J, 3), dtype=rots.dtype)
    R_g = R_g.at[:, 0].set(rots[:, 0])
    t_g = t_g.at[:, 0].set(rel_t[:, 0])
    for level in model.levels[1:]:
        idx = np.asarray(level)
        par = np.asarray(model.parents)[idx]
        Rp, tp = R_g[:, par], t_g[:, par]
        R_g = R_g.at[:, idx].set(_einsum("bjxy,bjyz->bjxz", Rp, rots[:, idx]))
        t_g = t_g.at[:, idx].set(
            _einsum("bjxy,bjy->bjx", Rp, rel_t[:, idx]) + tp)

    joints = t_g  # [B,J,3] global joint positions

    # rest-pose removal (`:135-144`): T'_j = [R_g | t_g - R_g @ j0]
    t_skin = t_g - _einsum("bjxy,bjy->bjx", R_g, joints0)

    # LBS on the MXU: weights [V,J] x per-joint affine [B,J,12]
    affine = jnp.concatenate(
        [R_g.reshape(B, J, 9), t_skin], axis=-1)  # [B,J,12]
    blended = _einsum("vj,bjc->bvc", model.weights, affine)
    R_v = blended[..., :9].reshape(B, -1, 3, 3)
    t_v = blended[..., 9:]
    verts = _einsum("bvxy,bvy->bvx", R_v, v_posed) + t_v

    if scale != 1.0:
        verts = verts * scale
        joints = joints * scale
    verts = verts + trans[:, None]
    joints = joints + trans[:, None]
    return verts, joints, v_posed, naked
