"""Skeleton-track evaluation (`interdiff/eval_skeleton.py`,
`eval_skeleton_no_correction.py`): reverse diffusion with inpainting, plus
(optionally) the skeleton ObjProjector injected at t<=500 every 50 steps.

TPU-native notes: the reference computes joint-object contact with a Python
T x B double loop (`eval_skeleton.py:29-31`, flagged in SURVEY.md §3.4 as
the obvious vectorization target) — here it is one masked argmin; and the
whole sampling loop is a single jitted `lax.scan` like the SMPL track.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion, Inpaint
from interdiff_tpu.models.correction import ObjProjectorSkeleton
from interdiff_tpu.models.mdm_skeleton import (
    MDMSkeleton,
    rigid_keypoints_from_pose,
)


@dataclass(frozen=True)
class SkeletonEvalConfig:
    past_len: int = 10
    future_len: int = 10
    num_joints: int = 21
    num_points: int = 12
    correction_t_max: int = 500
    correction_every: int = 50

    @property
    def seq_len(self) -> int:
        return self.past_len + self.future_len


def body_obj_contact(body: jax.Array, obj: jax.Array,
                     threshold: float = 0.1) -> jax.Array:
    """Vectorised `body_obj_to_contact` (`eval_skeleton.py:19-32`):
    body [B,T,J,3], obj [B,T,P,3] -> one-hot [B,T,J] marking the joint
    nearest to the object iff within ``threshold``."""
    d = jnp.linalg.norm(body[:, :, :, None] - obj[:, :, None], axis=-1)
    min_d = d.min(axis=3)  # [B,T,J]
    nearest = jnp.argmin(min_d, axis=2)  # [B,T]
    J = body.shape[2]
    onehot = jax.nn.one_hot(nearest, J, dtype=body.dtype)
    within = jnp.take_along_axis(min_d, nearest[..., None],
                                 axis=2)[..., 0] < threshold
    return onehot * within[..., None].astype(body.dtype)


def make_skeleton_sampler(
    cfg: SkeletonEvalConfig,
    model: MDMSkeleton,
    diffusion: GaussianDiffusion,
    *,
    projector: Optional[ObjProjectorSkeleton] = None,
    projector_params: Any = None,
    use_correction: bool = False,
    reuse_memory: bool = False,
    sampler: str = "ddpm",
) -> Callable:
    """Build ``sample(params, key, skeleton, obj_points, poses,
    zero_pose_obj) -> x [B,T,106]`` (`eval_skeleton.py:115-145`).  jit the
    result; passing params per call lets one compiled sampler serve
    validation across training steps.

    ``reuse_memory=True`` appends a ``memory`` argument (from
    ``model.apply(..., method=encode)[0]``) so best-of-N evaluation encodes
    once.  ``sampler``: 'ddpm' | 'ddim' | 'plms'.
    """
    bd, od = cfg.num_joints * 3, cfg.num_points * 3

    def _run(params, key, skeleton, obj_points, poses, zero_pose_obj,
             memory, gt, noise=None, step_noise=None):

        def model_fn(x, ts):
            return model.apply(params, x, ts, zero_pose_obj, memory)

        denoised_fn = None
        if use_correction:
            pose_gt = gt[..., bd + od :]

            def correct(x, t_scalar):
                B, T = x.shape[:2]
                body = x[..., :bd]
                # (contact is computed but unused by the skeleton projector,
                # mirroring `eval_skeleton.py:99-101`)
                trans_gt, quat_gt = pose_gt[..., :3], pose_gt[..., 3:7]
                quat_p, trans_p = projector.apply(
                    projector_params, quat_gt, trans_gt,
                    body.reshape(B, T, -1, 3),
                    method=ObjProjectorSkeleton.sample)
                pose_proj = jnp.concatenate([trans_p, quat_p], axis=-1)
                obj_proj = rigid_keypoints_from_pose(
                    pose_proj, zero_pose_obj).reshape(B, T, od)
                x_corr = jnp.concatenate([body, obj_proj, pose_proj], axis=-1)
                frac = t_scalar.astype(jnp.float32) / 1000.0
                return frac * x + (1.0 - frac) * x_corr

            def denoised_fn(x, t):
                t0 = t[0]
                active = jnp.logical_and(t0 <= cfg.correction_t_max,
                                         t0 % cfg.correction_every == 0)
                return jax.lax.cond(active, lambda x: correct(x, t0),
                                    lambda x: x, x)

        mask = jnp.zeros_like(gt, dtype=bool).at[:, : cfg.past_len].set(True)
        key, k_noise = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_noise, gt.shape, gt.dtype)
        kwargs = dict(noise=noise, inpaint=Inpaint(mask, gt),
                      denoised_fn=denoised_fn)
        if sampler == "ddim":
            return diffusion.ddim_sample_loop(model_fn, key, **kwargs)
        if sampler == "plms":
            return diffusion.plms_sample_loop(model_fn, key, **kwargs)
        return diffusion.p_sample_loop(model_fn, key, step_noise=step_noise,
                                       **kwargs)

    if reuse_memory:
        def sample_mem(params, key, skeleton, obj_points, poses,
                       zero_pose_obj, memory, gt, noise=None,
                       step_noise=None):
            return _run(params, key, skeleton, obj_points, poses,
                        zero_pose_obj, memory, gt, noise=noise,
                        step_noise=step_noise)

        return sample_mem

    def sample(params, key, skeleton, obj_points, poses, zero_pose_obj,
               noise=None, step_noise=None):
        memory, gt = model.apply(params, skeleton, obj_points, poses,
                                 zero_pose_obj, method=MDMSkeleton.encode)
        return _run(params, key, skeleton, obj_points, poses, zero_pose_obj,
                    memory, gt, noise=noise, step_noise=step_noise)

    return sample


def split_skeleton_state(x: jax.Array, cfg: SkeletonEvalConfig
                         ) -> Dict[str, jax.Array]:
    """State [B,T,106] -> dict of body [B,T,J,3], obj [B,T,P,3], pose [B,T,7]."""
    B, T = x.shape[:2]
    bd, od = cfg.num_joints * 3, cfg.num_points * 3
    return {
        "body": x[..., :bd].reshape(B, T, cfg.num_joints, 3),
        "obj": x[..., bd : bd + od].reshape(B, T, cfg.num_points, 3),
        "pose": x[..., bd + od :],
    }


def rollout_batch(x: jax.Array, zero_pose_obj: jax.Array,
                  cfg: SkeletonEvalConfig) -> Dict[str, jax.Array]:
    """Autoregressive re-batching (`eval_skeleton.py:71-80` `get_batch`):
    last ``past_len`` predicted frames become the new past, padded to the
    full window by repeating the final frame."""
    parts = split_skeleton_state(x, cfg)
    T = x.shape[1]
    p = cfg.past_len

    def repack(a):
        tail = a[:, -p:]
        pad = jnp.repeat(a[:, -1:], T - p, axis=1)
        return jnp.concatenate([tail, pad], axis=1)

    return {
        "skeleton": repack(parts["body"]),
        "obj_points": repack(parts["obj"]),
        "poses": repack(parts["pose"]),
        "zero_pose_obj": zero_pose_obj,
    }
