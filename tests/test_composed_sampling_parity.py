"""COMPOSED full-pipeline sampling parity — the BASELINE.json north star.

Every piece has long been pinned separately (the engine step-for-step with a
toy denoiser in test_reference_parity.py, the MDM forwards at production
size in test_reference_mdm_forward.py); this file composes them: the ACTUAL
reference torch `MDM` runs inside the ACTUAL reference
`SpacedDiffusion.p_sample_loop` (`eval_smpl_short.py:133-215`,
`respace.py:94-129`, `gaussian_diffusion.py:598-736`) with past-frame
inpainting at a 25-step respacing, while our converted-weights `MDMSmpl` /
`MDMSkeleton` runs inside our single-`lax.scan` production sampler
(`eval/smpl_short.make_sampler`, `eval/skeleton.make_skeleton_sampler`) with
the same init + per-step noise — and the final trajectories must agree at
1e-4 with MPJPE-family metrics deviating <1e-3.  A sign/order bug that
cancels in single-step tests but compounds over the scan dies here.

Both tracks run at production topology (d_model 256, 8+8 layers); the
skeleton track is the riskier composition (its per-layer `calc_obj_pred`
rigid re-derivation runs inside every denoiser call,
`diffusion_skeleton.py:217-229`).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import test_reference_mdm_forward as H  # noqa: E402  (harness: stubs + pairs)

import diffusion.gaussian_diffusion as ref_gd  # noqa: E402  (reference)
from diffusion.respace import SpacedDiffusion, space_timesteps  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: E402
from interdiff_tpu.eval.metrics import skeleton_metrics, smpl_metrics  # noqa: E402
from interdiff_tpu.eval.skeleton import (  # noqa: E402
    SkeletonEvalConfig,
    make_skeleton_sampler,
    split_skeleton_state,
)
from interdiff_tpu.eval.smpl_short import (  # noqa: E402
    SmplEvalConfig,
    make_sampler,
    postprocess_sample,
)
from interdiff_tpu.models.mdm_smpl import smpl_gt_from_raw  # noqa: E402

B = 2
RESPACING = "25"
STEPS = 1000


def _ref_diffusion():
    """Exactly `create_gaussian_diffusion` (`diffusion_smpl.py:251-284`)
    but respaced to 25 steps, as the eval CLIs allow."""
    betas = ref_gd.get_named_beta_schedule("cosine", STEPS, 1.0)
    return SpacedDiffusion(
        use_timesteps=space_timesteps(STEPS, [int(RESPACING)]),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.START_X,
        model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
        loss_type=ref_gd.LossType.MSE,
        rescale_timesteps=False)


def _our_diffusion():
    return GaussianDiffusion.create_named(
        schedule_name="cosine", steps=STEPS, timestep_respacing=RESPACING,
        predict_xstart=True, sigma_small=True)


def _shared_noise(rng, shape, n_steps):
    """(init, per-step) noise in OUR batch-first layout [B, T, C]."""
    init = rng.standard_normal(shape).astype(np.float32)
    steps = rng.standard_normal((n_steps,) + shape).astype(np.float32)
    return init, steps


def _to_ref(x):
    """[B, T, C] -> reference packing [B, 1, C, T]."""
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)[:, None]))


def _from_ref(x):
    return x.squeeze(1).permute(0, 2, 1).numpy()


def _inpaint_kwargs(gt_r, past_len):
    mask = torch.ones_like(gt_r, dtype=torch.bool)
    mask[:, :, :, past_len:] = False
    return {"inpainted_motion": gt_r, "inpainting_mask": mask}


def test_composed_smpl_sampling(monkeypatch):
    rng = np.random.default_rng(40)
    torch.manual_seed(233)
    ref = H.ref_mdm_smpl.MDM(H._smpl_args())
    ref.pcEmbedding = torch.nn.Linear(4, H.E)  # shipped-broken 6ch path
    ref.eval()
    variables = H.convert_mdm_smpl(H._sd(ref))
    ours = H.MDMSmpl(use_pointnet2=False)

    T = H.PAST + H.FUT
    body_pose = rng.standard_normal((T, B, 66)).astype(np.float32)
    body_trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_angles = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_xyz = rng.standard_normal((B, 1, 3)).astype(np.float32)

    # ---- reference: _get_embeddings -> SpacedDiffusion.p_sample_loop ------
    data = {
        "frames": [{"smplfit_params": {
                        "pose": torch.from_numpy(body_pose[t]),
                        "trans": torch.from_numpy(body_trans[t])},
                    "objfit_params": {
                        "angle": torch.from_numpy(obj_angles[t]),
                        "trans": torch.from_numpy(obj_trans[t])}}
                   for t in range(T)],
        "obj_points": torch.from_numpy(obj_xyz),
    }
    ref_diff = _ref_diffusion()
    init, step_noise = _shared_noise(rng, (B, T, 144), ref_diff.num_timesteps)

    with torch.no_grad():
        embedding, gt_ref = ref._get_embeddings(data)
        gt_r = gt_ref.permute(1, 2, 0).unsqueeze(1).contiguous()
        model_kwargs = {"y": {"cond": embedding,
                              **_inpaint_kwargs(gt_r, H.PAST)}}
        seq = iter(step_noise)
        monkeypatch.setattr(
            ref_gd.th, "randn_like",
            lambda a: _to_ref(next(seq)))
        ref_final = ref_diff.p_sample_loop(
            ref, tuple(gt_r.shape), noise=_to_ref(init),
            clip_denoised=False, model_kwargs=model_kwargs, device="cpu")
    ref_x = _from_ref(ref_final)  # [B, T, 144]

    # ---- ours: production make_sampler scan with the same noise -----------
    cfg = SmplEvalConfig(past_len=H.PAST, future_len=H.FUT)
    gt = smpl_gt_from_raw(
        jnp.asarray(body_pose.transpose(1, 0, 2)),
        jnp.asarray(body_trans.transpose(1, 0, 2)),
        jnp.asarray(obj_angles.transpose(1, 0, 2)),
        jnp.asarray(obj_trans.transpose(1, 0, 2)))
    obj_points4 = np.concatenate(
        [obj_xyz, np.linalg.norm(obj_xyz, axis=-1, keepdims=True)], axis=-1)
    hand = jnp.zeros((B, T, 90), jnp.float32)
    betas = jnp.zeros((B, T, 10), jnp.float32)

    sample = make_sampler(cfg, ours, _our_diffusion())
    our_x = sample(variables, jax.random.PRNGKey(0), gt,
                   jnp.asarray(obj_points4), hand, betas,
                   noise=jnp.asarray(init),
                   step_noise=jnp.asarray(step_noise))
    our_x = np.asarray(our_x)

    np.testing.assert_allclose(our_x, ref_x, atol=1e-4)

    # ---- MPJPE-family metrics deviate <1e-3 (the BASELINE sentence) -------
    # FK via the synthetic watertight body (pinned vs torch in test_smpl.py);
    # feeding BOTH trajectories through the same pinned pipeline isolates
    # the sampling deviation, which is what the north star bounds.
    from interdiff_tpu.cli.common import synthetic_smpl_body

    smpl = synthetic_smpl_body(np.random.default_rng(0), num_verts=128)
    faces = np.asarray(smpl.faces)

    def metric_dict(x):
        post = postprocess_sample(cfg, smpl, jnp.asarray(x), hand, betas)
        post_gt = postprocess_sample(cfg, smpl, gt, hand, betas)
        return smpl_metrics(
            post["obj_pred"], post["jtr"], post["body_pred"],
            post_gt["obj_pred"], post_gt["jtr"], post_gt["body_pred"],
            post["verts"], jnp.asarray(faces),
            jnp.asarray(obj_xyz), nn_chunk=None)

    m_ours = metric_dict(our_x)
    m_ref = metric_dict(ref_x)
    for k in m_ours:
        np.testing.assert_allclose(
            np.asarray(m_ours[k]), np.asarray(m_ref[k]), atol=1e-3,
            err_msg=f"metric {k} deviates")


def test_composed_skeleton_sampling(monkeypatch):
    rng = np.random.default_rng(41)
    torch.manual_seed(234)
    ref = H.ref_mdm_skel.MDM(H._skel_args())
    ref.eval()
    variables = H.convert_mdm_skeleton(H._sd(ref))
    ours = H.MDMSkeleton()

    T = 2 * H.PAST
    body_gt = rng.standard_normal((T, B, 21, 3)).astype(np.float32)
    obj_gt = rng.standard_normal((T, B, 12, 3)).astype(np.float32)
    pose_gt = rng.standard_normal((T, B, 7)).astype(np.float32)
    zero_pose = rng.standard_normal((B, 12, 3)).astype(np.float32)

    ref_diff = _ref_diffusion()
    init, step_noise = _shared_noise(rng, (B, T, 106), ref_diff.num_timesteps)

    with torch.no_grad():
        embedding, gt_ref = ref._get_embeddings(
            torch.from_numpy(body_gt), torch.from_numpy(obj_gt),
            torch.from_numpy(pose_gt), torch.from_numpy(zero_pose))
        gt_r = gt_ref.permute(1, 2, 0).unsqueeze(1).contiguous()
        model_kwargs = {
            "y": {"cond": embedding, **_inpaint_kwargs(gt_r, H.PAST)},
            "zero_pose_obj": torch.from_numpy(zero_pose),  # (`eval_skeleton.py:125`)
        }
        seq = iter(step_noise)
        monkeypatch.setattr(
            ref_gd.th, "randn_like",
            lambda a: _to_ref(next(seq)))
        ref_final = ref_diff.p_sample_loop(
            ref, tuple(gt_r.shape), noise=_to_ref(init),
            clip_denoised=False, model_kwargs=model_kwargs, device="cpu")
    ref_x = _from_ref(ref_final)  # [B, T, 106]

    cfg = SkeletonEvalConfig(past_len=H.PAST, future_len=H.PAST)
    sample = make_skeleton_sampler(cfg, ours, _our_diffusion())
    our_x = sample(variables, jax.random.PRNGKey(0),
                   jnp.asarray(body_gt.transpose(1, 0, 2, 3)),
                   jnp.asarray(obj_gt.transpose(1, 0, 2, 3)),
                   jnp.asarray(pose_gt.transpose(1, 0, 2)),
                   jnp.asarray(zero_pose),
                   noise=jnp.asarray(init),
                   step_noise=jnp.asarray(step_noise))
    our_x = np.asarray(our_x)

    np.testing.assert_allclose(our_x, ref_x, atol=1e-4)

    # skeleton MPJPE family (`train_diffusion_skeleton.py:65-87`) on both
    # trajectories vs gt must agree <1e-3
    gt_np = _from_ref(gt_r)
    p_ours = split_skeleton_state(jnp.asarray(our_x), cfg)
    p_ref = split_skeleton_state(jnp.asarray(ref_x), cfg)
    p_gt = split_skeleton_state(jnp.asarray(gt_np), cfg)
    m_ours = skeleton_metrics(p_ours["body"], p_gt["body"], p_ours["obj"],
                              p_gt["obj"], p_ours["pose"], p_gt["pose"],
                              start=cfg.past_len)
    m_ref = skeleton_metrics(p_ref["body"], p_gt["body"], p_ref["obj"],
                             p_gt["obj"], p_ref["pose"], p_gt["pose"],
                             start=cfg.past_len)
    for k in m_ours:
        np.testing.assert_allclose(
            np.asarray(m_ours[k]), np.asarray(m_ref[k]), atol=1e-3,
            err_msg=f"metric {k} deviates")
