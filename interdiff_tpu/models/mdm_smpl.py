"""SMPL-track MDM denoiser (flax), contract from
`interdiff/model/diffusion_smpl.py:8-249`.

State layout per frame (args.smpl_dim=132 default -> 144 channels):
  [body rot6d (132 = 22 joints x 6) | body trans (3) | obj rot6d (6) |
   obj trans (3)]
with the body block = smpl_dim+3 = 135 and the object block = 9.

Conditioning (`_get_embeddings`, ref `:195-223`): the first ``past_len``
frames embedded (body + obj + a single point-cloud token broadcast over
time), positional encoding, 8-layer encoder -> memory.  The denoiser is an
8-layer decoder with cross-attention to that memory (``latent_usage ==
'memory'``) or an encoder-only stack otherwise; layers 1 and 8 are vanilla
transformer layers, 2-7 are QaN layers.

TPU-native notes: batch-first [B, T, C] (the reference's [B, 1, C, T]
packing and permutes, ref `:239-246`, are layout noise we drop); the whole
forward is jit/scan-safe; classifier-free masking threads a PRNG key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from interdiff_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    matrix_to_rotation_6d,
)
from interdiff_tpu.models.layers import (
    PositionalEncoding,
    TimestepEmbedder,
    TransformerStack,
    mdm_stack_kinds,
)
from interdiff_tpu.models.pointnet import PointNet2Encoder


def smpl_gt_from_raw(body_pose_aa: jax.Array, body_trans: jax.Array,
                     obj_angles_aa: jax.Array, obj_trans: jax.Array) -> jax.Array:
    """Build the 144-channel gt state from raw dataset tensors, batch-first.

    body_pose_aa [B,T,66] (axis-angle, 22 joints), body_trans [B,T,3],
    obj_angles_aa [B,T,3], obj_trans [B,T,3] -> [B,T,144]
    (ref `diffusion_smpl.py:211-214`).
    """
    B, T = body_pose_aa.shape[:2]
    body6d = matrix_to_rotation_6d(
        axis_angle_to_matrix(body_pose_aa.reshape(B, T, -1, 3))).reshape(B, T, -1)
    obj6d = matrix_to_rotation_6d(
        axis_angle_to_matrix(obj_angles_aa.reshape(B, T, -1, 3))).reshape(B, T, -1)
    return jnp.concatenate([body6d, body_trans, obj6d, obj_trans], axis=-1)


class MDMSmpl(nn.Module):
    """MDM denoiser for the SMPL (BEHAVE) track.

    Defaults mirror `train_diffusion_smpl.py:538-604`: smpl_dim 132, d_model
    256, 4 heads, ff 1024, gelu, dropout 0, 8+8 layers, past 10 / future 25,
    PointNet++ object encoder (``use_pointnet2``).
    """

    smpl_dim: int = 132
    embed_dim: int = 256
    num_heads: int = 4
    ff_size: int = 1024
    num_layers: int = 8
    dropout: float = 0.0
    activation: str = "gelu"
    past_len: int = 10
    future_len: int = 25
    cond_mask_prob: float = 0.0
    latent_usage: str = "memory"
    use_pointnet2: bool = True
    # FPS variant for the point-cloud encoder: >1 = grouped-parallel
    # `hierarchical_fps` (lower latency, the measured default); 1 = exact
    # CUDA `furthest_point_sample` semantics — REQUIRED when loading
    # diffusion weights trained with the reference's pointnet2_ops so the
    # selected keypoints match the training-time selection order
    fps_groups: int = 16
    # compute dtype for the transformer stacks (params stay f32; set
    # jnp.bfloat16 for MXU-native inference — outputs are cast back to f32
    # so the DDPM math keeps full precision)
    dtype: Optional[jnp.dtype] = None

    @property
    def body_dim(self) -> int:
        return self.smpl_dim + 3  # 135

    @property
    def state_dim(self) -> int:
        return self.body_dim + 9  # 144

    def setup(self):
        E = self.embed_dim
        self.bodyEmbedding = nn.Dense(E, name="bodyEmbedding")
        self.objEmbedding = nn.Dense(E, name="objEmbedding")
        if self.use_pointnet2:
            self.pcEmbedding = PointNet2Encoder(
                c_in=1, c_out=E, num_keypoints=1,
                fps_groups=self.fps_groups, name="pcEmbedding")
        else:
            self.pcEmbedding = nn.Dense(E, name="pcEmbedding")
        self.positional = PositionalEncoding(E, self.dropout, name="positional")
        self.embedTimeStep = TimestepEmbedder(E, dtype=self.dtype,
                                              name="embedTimeStep")
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
        self.objFinalLinear = nn.Dense(9, name="objFinalLinear")

    # -- conditioning --------------------------------------------------------
    def encode(self, gt: jax.Array, obj_points: jax.Array, *,
               deterministic: bool = True,
               train_encoder: bool = False) -> jax.Array:
        """Conditioning memory from the gt state + object point cloud.

        gt [B,T,144] (build with :func:`smpl_gt_from_raw`), obj_points
        [B,P,>=3] (xyz used; the PointNet feature channel is ||xyz||, ref
        `diffusion_smpl.py:207-209`) -> memory [B, past_len, E].

        ``train_encoder=True`` runs the PointNet++ BatchNorms in TRAIN mode
        (batch statistics + running-stat updates — the reference trains
        `PointnetSAModuleMSG`'s BN under Lightning training,
        `interdiff/model/layers.py:118-139`); the caller must then apply
        with ``mutable=["batch_stats"]`` (see
        `train/trainer.py::make_smpl_train_step(bn_train_mode=True)`).
        """
        B = gt.shape[0]
        if self.dtype is not None:
            gt = gt.astype(self.dtype)
            obj_points = obj_points.astype(self.dtype)
        body = gt[..., : self.body_dim]
        obj = gt[..., self.body_dim :]

        xyz = obj_points[..., :3]
        if self.use_pointnet2:
            pc = jnp.concatenate(
                [xyz, jnp.linalg.norm(xyz, axis=-1, keepdims=True)], axis=-1)
            pc_emb = self.pcEmbedding(
                pc[:, None], train=train_encoder).reshape(
                    B, 1, self.embed_dim)
        else:
            # Linear fallback over [xyz | normals] (ref flag use_pointnet2=0)
            pc_emb = self.pcEmbedding(obj_points[..., :6]).mean(
                axis=1, keepdims=True)

        emb = (self.bodyEmbedding(body[:, : self.past_len])
               + self.objEmbedding(obj[:, : self.past_len]) + pc_emb)
        emb = self.positional(emb, deterministic=deterministic)
        return self.encoder(emb, deterministic=deterministic)

    def mask_cond(self, cond: jax.Array, *, force_mask: bool = False,
                  train: bool = False) -> jax.Array:
        """Classifier-free guidance mask (`diffusion_smpl.py:185-193`)."""
        if force_mask:
            return jnp.zeros_like(cond)
        if train and self.cond_mask_prob > 0.0:
            key = self.make_rng("cond_mask")
            mask = jax.random.bernoulli(
                key, self.cond_mask_prob, (cond.shape[0], 1, 1))
            return cond * (1.0 - mask.astype(cond.dtype))
        return cond

    # -- denoising -----------------------------------------------------------
    def denoise(self, x: jax.Array, timesteps: jax.Array,
                cond: Optional[jax.Array] = None, *,
                force_mask: bool = False, train: bool = False) -> jax.Array:
        """One denoiser call (`forward`/`_decode`, ref `:225-246`):
        x [B,T,144], t [B] -> x0 prediction [B,T,144]."""
        deterministic = not train
        out_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
            if cond is not None:
                cond = cond.astype(self.dtype)
        t_emb = self.embedTimeStep(timesteps)  # [B,1,E]
        body = x[..., : self.body_dim]
        obj = x[..., self.body_dim :]
        h = self.bodyEmbedding(body) + self.objEmbedding(obj) + t_emb
        h = self.positional(h, deterministic=deterministic)
        if cond is None:
            # null condition == zeroed memory (the classifier-free branch)
            cond = jnp.zeros((x.shape[0], 1, self.embed_dim), x.dtype)
        else:
            cond = self.mask_cond(cond, force_mask=force_mask, train=train)
        h = self.decoder(h, cond, deterministic=deterministic)
        body_pred = self.bodyFinalLinear(h)
        obj_pred = self.objFinalLinear(h)
        return jnp.concatenate([body_pred, obj_pred],
                               axis=-1).astype(out_dtype)

    def __call__(self, x, timesteps, cond=None, *, force_mask: bool = False,
                 train: bool = False):
        return self.denoise(x, timesteps, cond, force_mask=force_mask,
                            train=train)

    def init_forward(self, gt: jax.Array, obj_points: jax.Array,
                     timesteps: jax.Array) -> jax.Array:
        """Runs encode + denoise so ``model.init(..., method='init_forward')``
        creates the FULL parameter tree (encoder, point-cloud encoder and
        decoder) in one pass."""
        memory = self.encode(gt, obj_points)
        return self.denoise(gt, timesteps, memory)
