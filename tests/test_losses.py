"""Training-loss semantics tests: the 16-term SMPL pyramid including the
reference's zero-target velocity quirk (`train_diffusion_smpl.py:91-99`),
the 13-term skeleton loss, correction pose terms, and val losses."""

import numpy as np
import jax.numpy as jnp

from interdiff_tpu.train.losses import (
    SkeletonLossWeights,
    SmplLossWeights,
    skeleton_diffusion_losses,
    smpl_diffusion_losses,
    smpl_val_losses,
)
from interdiff_tpu.train.losses_correction import (
    CorrectionLossWeights,
    correction_skeleton_losses,
    pose_terms,
)


def test_smpl_losses_perfect_prediction_quirk(rng):
    """pred == gt: position terms vanish, but the faithful velocity terms do
    NOT (they regress pred velocity to a zero target + penalise pred
    acceleration — the reference's intentional-looking smoothness quirk)."""
    B, T = 2, 35
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    loss, terms = smpl_diffusion_losses(gt, gt, past_len=10)
    for k in ("body_rot_past", "body_nonrot_past", "obj_rot_past",
              "obj_nonrot_past", "body_rot_future", "obj_nonrot_future"):
        np.testing.assert_allclose(np.asarray(terms[k]), 0.0, atol=1e-6,
                                   err_msg=k)
    # the quirky velocity terms stay positive even at a perfect prediction
    assert float(terms["body_rot_v_past"].sum()) > 1e-3
    assert float(terms["obj_nonrot_v_future"].sum()) > 1e-4

    # per-sample shape
    assert loss.shape == (B,)


def test_smpl_losses_faithful_flag(rng):
    """faithful=False switches to real gt-velocity matching: the first
    velocity component vanishes at pred == gt (only the acceleration
    penalty remains)."""
    B, T = 2, 35
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    _, quirk = smpl_diffusion_losses(gt, gt, past_len=10, faithful=True)
    _, fixed = smpl_diffusion_losses(gt, gt, past_len=10, faithful=False)
    assert (float(fixed["body_rot_v_past"].sum())
            < float(quirk["body_rot_v_past"].sum()))


def test_smpl_loss_weights_scale():
    B, T = 1, 35
    gt = jnp.zeros((B, T, 144))
    pred = jnp.ones((B, T, 144))
    w1 = SmplLossWeights()
    w2 = SmplLossWeights(smplx_rot=2.0)
    _, t1 = smpl_diffusion_losses(pred, gt, past_len=10, weights=w1)
    _, t2 = smpl_diffusion_losses(pred, gt, past_len=10, weights=w2)
    np.testing.assert_allclose(np.asarray(t2["body_rot_future"]),
                               2 * np.asarray(t1["body_rot_future"]),
                               rtol=1e-6)


def test_skeleton_losses_perfect_prediction(rng):
    B, T = 2, 20
    gt_np = rng.standard_normal((B, T, 106)).astype(np.float32)
    # unit quaternions in the pose block so the reg term vanishes
    q = gt_np[..., -4:]
    gt_np[..., -4:] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    gt = jnp.asarray(gt_np)
    loss, terms = skeleton_diffusion_losses(gt, gt, past_len=10)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_correction_pose_terms_zero_at_identity(rng):
    B, T = 2, 35
    gt = jnp.asarray(rng.standard_normal((B, T, 9)).astype(np.float32))
    terms = pose_terms(gt, gt, past_len=10, w=CorrectionLossWeights())
    for k, v in terms.items():
        np.testing.assert_allclose(float(v), 0.0, atol=1e-6, err_msg=k)


def test_smpl_val_losses_rotation_space(rng):
    """val loss measures in rotation-matrix space: adding 2*pi to an
    axis-angle leaves the rotation-matrix terms ~0."""
    B, T = 2, 35
    body = rng.standard_normal((B, T, 69)).astype(np.float32) * 0.3
    obj = rng.standard_normal((B, T, 6)).astype(np.float32) * 0.3
    loss0, terms0 = smpl_val_losses(jnp.asarray(body), jnp.asarray(body),
                                    jnp.asarray(obj), jnp.asarray(obj),
                                    past_len=10)
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-6)

    body2 = body.copy()
    aa = body2[:, :, :3]
    norm = np.linalg.norm(aa, axis=-1, keepdims=True) + 1e-9
    body2[:, :, :3] = aa / norm * (norm + 2 * np.pi)  # same rotation
    _, terms2 = smpl_val_losses(jnp.asarray(body2), jnp.asarray(body),
                                jnp.asarray(obj), jnp.asarray(obj),
                                past_len=10)
    np.testing.assert_allclose(float(terms2["body_rot_future"]), 0.0,
                               atol=1e-4)
