"""Skeleton-track MDM denoiser (flax), contract from
`interdiff/model/diffusion_skeleton.py`.

State layout per frame (106 = 21*3 + 12*3 + 7):
  [body joints (63) | object keypoints (36) | object pose (3 trans + 4 quat
  **xyzw**, as stored by the HO-GCN dataset)].

The decoder re-derives the 12 object keypoints rigidly from the predicted
7-D pose at every denoiser call (`diffusion_skeleton.py:218-248`), so the
keypoint block of the prediction is always consistent with the pose block.

TPU-native notes: everything is batch-first [B, T, .]; the whole forward is
jit-friendly (static shapes, no python branching on traced values); the
classifier-free condition mask threads a PRNG key instead of torch bernoulli.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from interdiff_tpu.geometry.rotations import (
    quat_xyzw_to_wxyz,
    quaternion_to_matrix,
)
from interdiff_tpu.models.layers import (
    PositionalEncoding,
    TimestepEmbedder,
    TransformerStack,
    mdm_stack_kinds,
)


def rigid_keypoints_from_pose(pose: jax.Array,
                              zero_pose_obj: jax.Array) -> jax.Array:
    """`calc_obj_pred` (`diffusion_skeleton.py:218-229`), batch-first.

    pose: [B, T, 7] = [trans(3), quat xyzw(4)]; zero_pose_obj: [B, P, 3].
    Returns keypoints [B, T, P, 3] = R(q) @ zero_pose + trans.
    """
    trans = pose[..., :3]
    quat = quat_xyzw_to_wxyz(pose[..., 3:7])
    rot = quaternion_to_matrix(quat)  # [B, T, 3, 3]
    return (jnp.einsum("btij,bpj->btpi", rot, zero_pose_obj)
            + trans[:, :, None, :])


class MDMSkeleton(nn.Module):
    """MDM denoiser for the skeleton (HO-GCN) track.

    Defaults mirror `train_diffusion_skeleton.py:355-366`: d_model 256,
    4 heads, ff 256, gelu, dropout 0, 8 encoder + 8 decoder layers with the
    first/last vanilla and the middle six QaN, cross-attention decoder
    (`latent_usage='memory'`).
    """

    num_joints: int = 21
    num_points: int = 12
    embed_dim: int = 256
    num_heads: int = 4
    ff_size: int = 256
    num_layers: int = 8
    dropout: float = 0.0
    activation: str = "gelu"
    past_len: int = 10
    cond_mask_prob: float = 0.0
    latent_usage: str = "memory"

    @property
    def body_dim(self) -> int:
        return self.num_joints * 3

    @property
    def points_dim(self) -> int:
        return self.num_points * 3

    @property
    def state_dim(self) -> int:
        return self.body_dim + self.points_dim + 7

    def setup(self):
        E = self.embed_dim
        self.bodyEmbedding = nn.Dense(E, name="bodyEmbedding")
        self.shapeEmbedding = nn.Dense(E, name="shapeEmbedding")
        self.objEmbedding = nn.Dense(E, name="objEmbedding")
        self.positional = PositionalEncoding(E, self.dropout, name="positional")
        self.embedTimeStep = TimestepEmbedder(E, name="embedTimeStep")
        self.encoder = TransformerStack(
            E, self.num_heads, self.ff_size,
            mdm_stack_kinds(self.num_layers, cross=False),
            self.dropout, self.activation, name="encoder")
        self.decoder = TransformerStack(
            E, self.num_heads, self.ff_size,
            mdm_stack_kinds(self.num_layers,
                            cross=self.latent_usage == "memory"),
            self.dropout, self.activation, name="decoder")
        self.bodyFinalLinear = nn.Dense(self.body_dim, name="bodyFinalLinear")
        self.objFinalLinear = nn.Dense(7, name="objFinalLinear")

    # -- conditioning ------------------------------------------------------
    def encode(self, body_gt: jax.Array, obj_gt: jax.Array,
               pose_gt: jax.Array, zero_pose_obj: jax.Array, *,
               deterministic: bool = True):
        """`_get_embeddings` (`diffusion_skeleton.py:194-215`), batch-first.

        body_gt [B,T,21,3], obj_gt [B,T,12,3], pose_gt [B,T,7],
        zero_pose_obj [B,12,3] -> (cond memory [B, past_len, E],
        gt state [B, T, state_dim]).
        """
        B, T = body_gt.shape[:2]
        body_flat = body_gt.reshape(B, T, self.body_dim)
        obj_flat = obj_gt.reshape(B, T, self.points_dim)
        gt = jnp.concatenate([body_flat, obj_flat, pose_gt], axis=-1)

        shape_emb = self.shapeEmbedding(
            zero_pose_obj.reshape(B, 1, self.points_dim))
        emb = (self.bodyEmbedding(body_flat[:, : self.past_len])
               + self.objEmbedding(obj_flat[:, : self.past_len])
               + shape_emb)
        emb = self.positional(emb, deterministic=deterministic)
        memory = self.encoder(emb, deterministic=deterministic)
        return memory, gt

    def mask_cond(self, cond: jax.Array, *, force_mask: bool = False,
                  train: bool = False) -> jax.Array:
        """Classifier-free guidance mask (`diffusion_skeleton.py:184-192`)."""
        if force_mask:
            return jnp.zeros_like(cond)
        if train and self.cond_mask_prob > 0.0:
            key = self.make_rng("cond_mask")
            mask = jax.random.bernoulli(
                key, self.cond_mask_prob, (cond.shape[0], 1, 1))
            return cond * (1.0 - mask.astype(cond.dtype))
        return cond

    # -- denoising ---------------------------------------------------------
    def denoise(self, x: jax.Array, timesteps: jax.Array,
                zero_pose_obj: jax.Array, cond: Optional[jax.Array] = None, *,
                force_mask: bool = False, train: bool = False) -> jax.Array:
        """One denoiser call: x [B, T, state_dim], t [B] -> x0 prediction.

        Mirrors `forward`/`_decode` (`diffusion_skeleton.py:231-257`) minus
        the reference's [B,1,C,T] packing, which lives in the engine adapter.
        """
        deterministic = not train
        t_emb = self.embedTimeStep(timesteps)  # [B, 1, E]

        body = x[..., : self.body_dim]
        # object keypoints block (x[..., body:body+points]) is *not* consumed
        # by the decoder input in the reference either — only body + obj
        # keypoints are embedded; pose is dropped (`diffusion_skeleton.py:236-239`)
        obj = x[..., self.body_dim : self.body_dim + self.points_dim]

        h = self.bodyEmbedding(body) + self.objEmbedding(obj) + t_emb
        h = self.positional(h, deterministic=deterministic)
        if cond is None:
            # null condition == zeroed memory (the classifier-free branch)
            cond = jnp.zeros((x.shape[0], 1, self.embed_dim), x.dtype)
        else:
            cond = self.mask_cond(cond, force_mask=force_mask, train=train)
        h = self.decoder(h, cond, deterministic=deterministic)

        body_pred = self.bodyFinalLinear(h)
        pose_pred = self.objFinalLinear(h)
        obj_pred = rigid_keypoints_from_pose(pose_pred, zero_pose_obj)
        B, T = body_pred.shape[:2]
        return jnp.concatenate(
            [body_pred, obj_pred.reshape(B, T, self.points_dim), pose_pred],
            axis=-1)

    def __call__(self, x, timesteps, zero_pose_obj, cond=None, *,
                 force_mask: bool = False, train: bool = False):
        return self.denoise(x, timesteps, zero_pose_obj, cond,
                            force_mask=force_mask, train=train)

    def init_forward(self, body_gt: jax.Array, obj_gt: jax.Array,
                     pose_gt: jax.Array, zero_pose_obj: jax.Array,
                     timesteps: jax.Array) -> jax.Array:
        """encode + denoise in one pass, for full-tree initialization."""
        memory, gt = self.encode(body_gt, obj_gt, pose_gt, zero_pose_obj)
        return self.denoise(gt, timesteps, zero_pose_obj, memory)
