"""SMPL-track short-term evaluation — the signature InterDiff inference
path (`interdiff/eval_smpl_short.py`): 1000-step reverse diffusion with
past-frame inpainting and the physics-informed `ObjProjector` injected as a
``denoised_fn`` at t<=500, every 50 steps.

TPU-native redesign (the BASELINE.json north star): the reference runs a
Python loop over 1000 steps, dropping to CPU-side control flow at every
step and running chamfer/FK CUDA kernels in the 10 corrected steps.  Here
the ENTIRE loop — denoiser, correction subgraph (SMPL LBS over T*B bodies,
vertex normals, brute-force signed distance, DCT ST-GCNN projector, blend,
per-sample gating) — is one jitted ``lax.scan``; the correction branch sits
behind ``lax.cond`` so the other 990 steps pay nothing for it.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from interdiff_tpu.data.constants import MARKERSET_SSM67_SMPLH
from interdiff_tpu.diffusion.gaussian import GaussianDiffusion, Inpaint
from interdiff_tpu.geometry.normals import vertex_normals
from interdiff_tpu.geometry.rotations import (
    matrix_to_axis_angle,
    rotation_6d_to_matrix,
)
from interdiff_tpu.models.correction import ObjProjectorSmpl
from interdiff_tpu.models.mdm_smpl import MDMSmpl
from interdiff_tpu.ops.signed_distance import (
    nearest_neighbor,
    signed_nearest,
    signed_nearest_pruned,
)
from interdiff_tpu.smpl.model import SmplModel, smpl_forward


@dataclass(frozen=True)
class SmplEvalConfig:
    past_len: int = 10
    future_len: int = 25
    smpl_dim: int = 132
    correction_t_max: int = 500  # active only at t <= 500 (`:85`)
    correction_every: int = 50  # ... and t % 50 == 0
    nn_chunk: Optional[int] = 512
    # AABB segment pruning of the gate's object->body signed-NN sweep
    # (`ops/signed_distance.signed_nearest_pruned`): bit-identical gate
    # decisions as long as delta exceeds the body's max interior-to-vertex
    # distance (~0.17 m for SMPL-scale bodies).  None disables (full sweep).
    nn_prune_delta: Optional[float] = 0.25

    @property
    def seq_len(self) -> int:
        return self.past_len + self.future_len


def pad_idx(cfg: SmplEvalConfig) -> np.ndarray:
    return np.concatenate([np.arange(cfg.past_len),
                           np.full(cfg.future_len, cfg.past_len - 1)])


def make_correction_denoised_fn(
    cfg: SmplEvalConfig,
    smpl: SmplModel,
    projector: ObjProjectorSmpl,
    projector_params: Any,
    *,
    gt: jax.Array,  # [B, T, 144] inpainted motion (canonical gt state)
    hand_pose: jax.Array,  # [B, T, 90] gt hand poses
    betas: jax.Array,  # [B, T, 10]
    obj_points: jax.Array,  # [B, P, 3] canonical template xyz
    markers_idx: Optional[np.ndarray] = None,  # override for tiny test meshes
) -> Callable:
    """Build the jittable physics-informed `denoised_fn`
    (`eval_smpl_short.py:84-130`)."""
    D = cfg.smpl_dim + 3  # body block
    idx = pad_idx(cfg)
    markers_idx = jnp.asarray(MARKERSET_SSM67_SMPLH
                              if markers_idx is None else markers_idx)

    body_gt6 = gt[..., :D]
    obj_gt9 = gt[..., D:]
    hand_padded = hand_pose[:, idx]  # future hands = repeat last past

    def correct(x: jax.Array, t_scalar: jax.Array) -> jax.Array:
        B, T = x.shape[:2]
        body = x[..., :D]
        obj = x[..., D:]

        obj_rot = rotation_6d_to_matrix(obj[..., :6].reshape(B, T, 6))
        body_aa = matrix_to_axis_angle(
            rotation_6d_to_matrix(body[..., :-3].reshape(B, T, -1, 6))
        ).reshape(B, T, -1)
        pose_full = jnp.concatenate([body_aa, hand_padded], axis=-1)

        verts, _, _, _ = smpl_forward(
            smpl, pose_full.reshape(B * T, -1), betas.reshape(B * T, -1),
            body[..., -3:].reshape(B * T, 3))
        markers = verts[:, markers_idx].reshape(B, T, -1, 3)

        obj_points_pred = (jnp.einsum("btij,bpj->btpi", obj_rot, obj_points)
                           + obj[..., None, -3:])

        # penetration gating (`:107-110`) consumes only future frames
        # (`loss_dist_o[args.past_len:]`), so the expensive obj->verts NN +
        # normals run on the future slice only; the verts->obj direction of
        # the reference's bidirectional call is unused here and dropped.
        Tf = T - cfg.past_len
        verts_bt = verts.reshape(B, T, -1, 3)
        verts_fut = verts_bt[:, cfg.past_len:].reshape(B * Tf, -1, 3)
        obj_fut = obj_points_pred[:, cfg.past_len:].reshape(B * Tf, -1, 3)
        # fused NN + inside/outside test: one Pallas sweep returns both the
        # squared distance and the pseudonormal dot at the argmin — no
        # argmin-index gathers (they cost more than the NN itself on v5e)
        normals_fut = vertex_normals(verts_fut, np.asarray(smpl.faces))
        if cfg.nn_prune_delta is not None:
            # segment-pruned sweep: within delta the gate terms are
            # bit-identical to the full sweep; beyond delta the pair is
            # forced to the TRUE (positive) sign, so w/loss_dist_o differ
            # from the full sweep exactly where its far-field pseudonormal
            # sign is an artifact (winding-verified outside — see
            # scripts/diag_penetrate_signs.py and PARITY.md): pruning
            # both accelerates the sweep 1.4-4.8x and suppresses the
            # spurious far-field penetration forces those artifacts
            # would inject into the correction blend
            o2h_sq, o2h_dot = signed_nearest_pruned(
                obj_fut, verts_fut, normals_fut,
                delta=cfg.nn_prune_delta, chunk=cfg.nn_chunk)
        else:
            o2h_sq, o2h_dot = signed_nearest(
                obj_fut, verts_fut, normals_fut, chunk=cfg.nn_chunk)
        o2h_signed = (jnp.sqrt(o2h_sq) * jnp.sign(o2h_dot)
                      ).reshape(B, Tf, -1)

        w = jnp.where(o2h_signed < 0, 20.0, 0.0)  # (`:107-110`)
        loss_dist_o = jnp.abs(o2h_signed) * w  # [B, Tf, P]

        # marker <-> object-point distances: the reference materialises a
        # [T,B,P,M] norm tensor twice; min-over-P per marker is just a
        # 67-query nearest-neighbour against the 2048 points, and the
        # gather+renorm of the nearest point is redundant — the NN already
        # returns the squared distance
        md2, _ = nearest_neighbor(
            markers.reshape(B * T, -1, 3),
            obj_points_pred.reshape(B * T, -1, 3), chunk=cfg.nn_chunk)
        marker_d = jnp.sqrt(jnp.maximum(md2, 0.0)).reshape(B, T, -1)
        distance = marker_d.min(axis=2).mean(axis=1)  # [B]
        good = jnp.logical_and(
            loss_dist_o.mean(axis=(1, 2)) < 0.002,
            distance < 0.02)
        condition = jnp.logical_not(good)  # [B] True -> apply correction

        contact_label = marker_d < 0.02  # [B, T, M]
        contact = contact_label[:, cfg.past_len:].sum(axis=1)  # [B, M]

        # projector consumes the *gt* object stream (future frames padded
        # inside sample()) + denoised markers (`:125`)
        obj_proj = projector.apply(
            projector_params, jnp.concatenate(
                [obj_gt9[..., :6], obj_gt9[..., 6:]], axis=-1),
            markers, contact.astype(jnp.float32),
            method=ObjProjectorSmpl.sample)

        x_corr = jnp.concatenate([body, obj_proj], axis=-1)
        frac = t_scalar.astype(jnp.float32) / 1000.0
        x_blend = frac * x + (1.0 - frac) * x_corr
        return jnp.where(condition[:, None, None], x_blend, x)

    def denoised_fn(x: jax.Array, t: jax.Array) -> jax.Array:
        t0 = t[0]
        active = jnp.logical_and(t0 <= cfg.correction_t_max,
                                 t0 % cfg.correction_every == 0)
        return jax.lax.cond(active, lambda x: correct(x, t0), lambda x: x, x)

    return denoised_fn


def make_sampler(
    cfg: SmplEvalConfig,
    model: MDMSmpl,
    diffusion: GaussianDiffusion,
    *,
    smpl: Optional[SmplModel] = None,
    projector: Optional[ObjProjectorSmpl] = None,
    projector_params: Any = None,
    use_correction: bool = False,
    markers_idx: Optional[np.ndarray] = None,
    reuse_memory: bool = False,
    sampler: str = "ddpm",
) -> Callable:
    """Build ``sample(params, key, gt, obj_points6, hand_pose, betas) ->
    x [B,T,144]`` — `sample_once` / `sample_once_proj`
    (`eval_smpl_short.py:133-215`).  jit the result; it compiles to a single
    scan, and params-per-call lets validation reuse one compilation.

    ``reuse_memory=True`` changes the signature to
    ``sample(params, key, gt, obj_points6, hand_pose, betas, memory)`` —
    the conditioning encoder is deterministic, so best-of-N evaluation
    computes the memory ONCE (via ``model.apply(..., method=encode)``) and
    amortises the point-cloud encoder across the N diverse samples (it
    dominates the single-sample latency; see perf notes in README).

    ``sampler``: 'ddpm' (ancestral, the reference default), 'ddim', 'plms'.
    """

    def _run(params, key, gt, obj_points6, hand_pose, betas, memory,
             noise=None, step_noise=None):
        def model_fn(x, ts):
            return model.apply(params, x, ts, memory)

        mask = jnp.zeros_like(gt, dtype=bool).at[:, : cfg.past_len].set(True)
        denoised_fn = None
        if use_correction:
            denoised_fn = make_correction_denoised_fn(
                cfg, smpl, projector, projector_params, gt=gt,
                hand_pose=hand_pose, betas=betas,
                obj_points=obj_points6[..., :3], markers_idx=markers_idx)

        key, k_noise = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_noise, gt.shape, gt.dtype)
        kwargs = dict(noise=noise, inpaint=Inpaint(mask, gt),
                      denoised_fn=denoised_fn)
        if sampler == "ddim":
            return diffusion.ddim_sample_loop(model_fn, key, **kwargs)
        if sampler == "plms":
            del kwargs["denoised_fn"]  # PLMS applies it inside p_mean_variance
            return diffusion.plms_sample_loop(model_fn, key,
                                              denoised_fn=denoised_fn,
                                              **kwargs)
        return diffusion.p_sample_loop(model_fn, key, step_noise=step_noise,
                                       **kwargs)

    if reuse_memory:
        return _run

    def sample(params, key, gt, obj_points6, hand_pose, betas,
               noise=None, step_noise=None):
        memory = model.apply(params, gt, obj_points6, method=MDMSmpl.encode)
        return _run(params, key, gt, obj_points6, hand_pose, betas, memory,
                    noise=noise, step_noise=step_noise)

    return sample


def postprocess_sample(
    cfg: SmplEvalConfig, smpl: SmplModel, x: jax.Array, hand_pose: jax.Array,
    betas: jax.Array,
) -> Dict[str, jax.Array]:
    """Sampled state -> axis-angle body/object, SMPL verts/joints
    (`eval_smpl_short.py:155-178`): body_pred [B,T,159] (66 aa + 90 hand +
    3 trans), obj_pred [B,T,6] (aa + trans), verts, jtr, pelvis."""
    B, T = x.shape[:2]
    D = cfg.smpl_dim + 3
    body, obj = x[..., :D], x[..., D:]
    body_aa = matrix_to_axis_angle(
        rotation_6d_to_matrix(body[..., :-3].reshape(B, T, -1, 6))
    ).reshape(B, T, -1)
    obj_aa = matrix_to_axis_angle(rotation_6d_to_matrix(obj[..., :6]))
    hand = hand_pose[:, pad_idx(cfg)]
    body_pred = jnp.concatenate([body_aa, hand, body[..., -3:]], axis=-1)
    verts, jtr, _, _ = smpl_forward(
        smpl, body_pred[..., :-3].reshape(B * T, -1),
        betas.reshape(B * T, -1), body_pred[..., -3:].reshape(B * T, 3))
    obj_pred = jnp.concatenate([obj_aa, obj[..., -3:]], axis=-1)
    return {
        "body_pred": body_pred,
        "obj_pred": obj_pred,
        "verts": verts.reshape(B, T, -1, 3),
        "jtr": jtr.reshape(B, T, -1, 3),
        "pelvis": jtr.reshape(B, T, -1, 3)[:, :, 0],
    }


def state_to_axis_angle(cfg: SmplEvalConfig, x: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """Sampled/gt state [B,T,144] -> (body aa+trans [B,T,69],
    obj aa+trans [B,T,6]) without FK or hand padding — the representation
    `calc_val_loss` scores (`train_diffusion_smpl.py:185-260`)."""
    B, T = x.shape[:2]
    D = cfg.smpl_dim + 3
    body, obj = x[..., :D], x[..., D:]
    body_aa = matrix_to_axis_angle(
        rotation_6d_to_matrix(body[..., :-3].reshape(B, T, -1, 6))
    ).reshape(B, T, -1)
    obj_aa = matrix_to_axis_angle(rotation_6d_to_matrix(obj[..., :6]))
    return (jnp.concatenate([body_aa, body[..., -3:]], axis=-1),
            jnp.concatenate([obj_aa, obj[..., -3:]], axis=-1))
