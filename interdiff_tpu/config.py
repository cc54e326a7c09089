"""One typed configuration shared by every entry point.

The reference duplicates ~40 argparse flags across its 9 entry scripts and
lets them drift (dropout 0 in train vs 0.1 in eval, `weight_past` 1 vs 0.5 —
SURVEY.md §5); effective values actually come from checkpoint hparams.  Here
each track has a single dataclass with the training-time defaults, and the
eval drift is explicit via `replace()` at the call site.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class DiffusionConfig:
    """`create_gaussian_diffusion` (`model/diffusion_smpl.py:251-284`)."""

    noise_schedule: str = "cosine"
    diffusion_steps: int = 1000
    timestep_respacing: str = ""  # e.g. "100" or "ddim50"
    sigma_small: bool = True
    predict_xstart: bool = True
    rescale_timesteps: bool = False

    def build(self):
        from interdiff_tpu.diffusion.gaussian import GaussianDiffusion

        return GaussianDiffusion.create_named(
            schedule_name=self.noise_schedule, steps=self.diffusion_steps,
            timestep_respacing=self.timestep_respacing or None,
            predict_xstart=self.predict_xstart, sigma_small=self.sigma_small,
            rescale_timesteps=self.rescale_timesteps)


@dataclass(frozen=True)
class SmplTrackConfig:
    """`train_diffusion_smpl.py:538-604` defaults."""

    smpl_dim: int = 132
    embedding_dim: int = 256
    num_heads: int = 4
    ff_size: int = 1024
    activation: str = "gelu"
    dropout: float = 0.0
    num_layers: int = 8
    latent_usage: str = "memory"
    use_pointnet2: bool = True
    # 1 = exact CUDA furthest_point_sample order (use when loading
    # reference-trained diffusion weights); >1 = grouped-parallel FPS
    fps_groups: int = 16
    past_len: int = 10
    future_len: int = 25
    cond_mask_prob: float = 0.0
    diffusion: DiffusionConfig = DiffusionConfig()

    def build_model(self):
        from interdiff_tpu.models.mdm_smpl import MDMSmpl

        return MDMSmpl(
            smpl_dim=self.smpl_dim, embed_dim=self.embedding_dim,
            num_heads=self.num_heads, ff_size=self.ff_size,
            num_layers=self.num_layers, dropout=self.dropout,
            activation=self.activation, past_len=self.past_len,
            future_len=self.future_len, cond_mask_prob=self.cond_mask_prob,
            latent_usage=self.latent_usage,
            use_pointnet2=self.use_pointnet2, fps_groups=self.fps_groups)


@dataclass(frozen=True)
class SkeletonTrackConfig:
    """`train_diffusion_skeleton.py:354-383` defaults (ff 256)."""

    num_joints: int = 21
    num_points: int = 12
    embedding_dim: int = 256
    num_heads: int = 4
    ff_size: int = 256
    activation: str = "gelu"
    dropout: float = 0.0
    num_layers: int = 8
    latent_usage: str = "memory"
    past_len: int = 10
    future_len: int = 25  # train default; eval ckpts use 10
    cond_mask_prob: float = 0.0
    diffusion: DiffusionConfig = DiffusionConfig()

    def build_model(self):
        from interdiff_tpu.models.mdm_skeleton import MDMSkeleton

        return MDMSkeleton(
            num_joints=self.num_joints, num_points=self.num_points,
            embed_dim=self.embedding_dim, num_heads=self.num_heads,
            ff_size=self.ff_size, num_layers=self.num_layers,
            dropout=self.dropout, activation=self.activation,
            past_len=self.past_len, cond_mask_prob=self.cond_mask_prob,
            latent_usage=self.latent_usage)


@dataclass(frozen=True)
class CorrectionConfig:
    """`train_correction_smpl.py:286-330` / `correction.ckpt` hparams."""

    track: str = "smpl"  # or "skeleton"
    num_nodes: int = 67  # markers (smpl) / joints (skeleton)
    dct: int = 10  # n_pre; skeleton hardcodes 20
    past_len: int = 10
    future_len: int = 25  # skeleton: 10
    dropout: float = 0.0

    def build_model(self):
        from interdiff_tpu.models.correction import (
            ObjProjectorSkeleton,
            ObjProjectorSmpl,
        )

        if self.track == "smpl":
            return ObjProjectorSmpl(
                num_markers=self.num_nodes, n_pre=self.dct,
                past_len=self.past_len, future_len=self.future_len,
                dropout=self.dropout)
        return ObjProjectorSkeleton(
            num_joints=self.num_nodes, past_len=self.past_len,
            future_len=self.future_len, dropout=self.dropout)


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-4
    l2_norm: float = 0.0
    batch_size: int = 32
    max_epochs: int = 1000
    seed: int = 233
    check_val_every_n_epoch: int = 50
    second_stage: int = 20
    results_dir: str = "./results"
    data_axis: str = "data"  # mesh axis for pjit data parallelism


@dataclass(frozen=True)
class EvalConfig:
    diverse_samples: int = 10
    batch_size: int = 32
    render_interval: int = 100
    mode: str = "correction"  # or "no_correction"


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
