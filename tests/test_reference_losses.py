"""Differential goldens for the training losses: identical (pred, target)
pairs through our `train/losses*.py` and the RUNNABLE reference trainer code.

The torch side is the reference's own `LitInteraction.forward_backward`
(`reference/interdiff/train_diffusion_smpl.py:60-166`, 16 terms incl. the
zero-target "velocity" quirk; `train_diffusion_skeleton.py:89-160`, 13
terms) and `calc_loss_contact` (`train_correction_smpl.py:103-185`, 8 pose
terms + contact/penetration with epoch annealing) — executed on CPU with the
diffusion engine and schedule sampler replaced by stubs that hand back fixed
(pred, gt) and uniform weights, and the chamfer CUDA extension replaced by a
`torch.cdist` argmin (`tools.point2point_signed`'s only use of it is the
nearest-neighbour indices, `tools.py:45-55`).  Everything else — the slicing,
the self-referential velocity targets, the weighting pyramid, the sign
conventions — is the reference's own code, so any drift in our 16/13/10-term
weights or quirks fails here term-by-term.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import vendor_local_attention as _vla  # noqa: E402  (tests dir)
import vendor_pytorch3d_transforms as _vp3d  # noqa: E402


def _ensure_module(name: str) -> types.ModuleType:
    """Get-or-register a stub module (robust to pytest file ordering:
    other reference-parity tests register overlapping stubs)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def _matrix_to_axis_angle(matrix):
    """pytorch3d matrix->axis-angle (via quaternion), needed only so the
    reference trainer modules import; the exercised loss code never calls
    it."""
    q = _vp3d.matrix_to_quaternion(matrix)
    norms = torch.norm(q[..., 1:], p=2, dim=-1, keepdim=True)
    half_angles = torch.atan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = angles.abs() < eps
    sin_half_over_angle = torch.empty_like(angles)
    sin_half_over_angle[~small] = torch.sin(half_angles[~small]) / angles[~small]
    sin_half_over_angle[small] = 0.5 - (angles[small] ** 2) / 48
    return q[..., 1:] / sin_half_over_angle


class _CdistChamfer(torch.nn.Module):
    """`chamfer_distance.ChamferDistance` stand-in: bidirectional argmin via
    torch.cdist.  `tools.point2point_signed` consumes only the index
    outputs (`tools.py:49-55`)."""

    def forward(self, x, y, x_normals=None, y_normals=None):
        d = torch.cdist(x, y)  # [N, P1, P2]
        dx, xidx = d.min(dim=2)
        dy, yidx = d.min(dim=1)
        return dx ** 2, dy ** 2, xidx.int(), yidx.int()


# --- sys.modules stubs so the reference trainer modules import on CPU ------
_la = _ensure_module("local_attention")
_la.LocalAttention = _vla.LocalAttention

_tv = _ensure_module("torchvision")
_tv_ops = _ensure_module("torchvision.ops")
_tv_ops.stochastic_depth = lambda x, p, mode, training=True: x
_tv.ops = _tv_ops

_p2 = _ensure_module("pointnet2_ops")
_p2m = _ensure_module("pointnet2_ops.pointnet2_modules")
if not hasattr(_p2m, "PointnetSAModuleMSG"):
    _p2m.PointnetSAModuleMSG = type("PointnetSAModuleMSG", (), {})
_p2.pointnet2_modules = _p2m

_p3 = _ensure_module("pytorch3d")
_p3t = _ensure_module("pytorch3d.transforms")
for _name in ("axis_angle_to_matrix", "matrix_to_rotation_6d",
              "quaternion_to_matrix", "rotation_6d_to_matrix",
              "matrix_to_quaternion"):
    setattr(_p3t, _name, getattr(_vp3d, _name))
_p3t.matrix_to_axis_angle = _matrix_to_axis_angle
_p3.transforms = _p3t
_p3l = _ensure_module("pytorch3d.loss")
_p3o = _ensure_module("pytorch3d.ops")
_p3o.cot_laplacian = lambda *a, **k: None
_p3s = _ensure_module("pytorch3d.structures")
_p3s.Meshes = type("Meshes", (), {})
_p3.loss, _p3.ops, _p3.structures = _p3l, _p3o, _p3s

_hbp = _ensure_module("human_body_prior")
_hbp_tools = _ensure_module("human_body_prior.tools")
_hbp_tgm = _ensure_module("human_body_prior.tools.tgm_conversion")
_hbp.tools = _hbp_tools
_hbp_tools.tgm_conversion = _hbp_tgm

_chd = _ensure_module("chamfer_distance")
_chd.ChamferDistance = _CdistChamfer

_ensure_module("smplx")

_pl = _ensure_module("pytorch_lightning")


class _LightningModuleStub:
    def log(self, *a, **k):
        pass

    def save_hyperparameters(self, *a, **k):
        pass


_pl.LightningModule = _LightningModuleStub
_pl.seed_everything = lambda *a, **k: None
_pl_prof = _ensure_module("pytorch_lightning.profiler")
_pl_prof.SimpleProfiler = type("SimpleProfiler", (), {})
_pl_prof.AdvancedProfiler = type("AdvancedProfiler", (), {})
_pl_log = _ensure_module("pytorch_lightning.loggers")
_pl.profiler, _pl.loggers = _pl_prof, _pl_log

_psb = _ensure_module("psbody")
_psb_mesh = _ensure_module("psbody.mesh")
_psb_mesh.Mesh = type("Mesh", (), {})
_psb.mesh = _psb_mesh

_rnd = _ensure_module("render")
_rnd_mv = _ensure_module("render.mesh_viz")
_rnd_mv.visualize_body_obj = lambda *a, **k: None
_rnd_vh = _ensure_module("render.viz_helper")
_rnd_vh.visualize_skeleton = lambda *a, **k: None
_rnd_vh.visualize_skeleton_pred_gt = lambda *a, **k: None
_rnd.mesh_viz, _rnd.viz_helper = _rnd_mv, _rnd_vh

# the heavy dataset modules (SMPL pkls, chumpy, full BEHAVE) are not on the
# loss path — stub their imported names
_dss = _ensure_module("data.dataset_smpl")
_dss.Dataset = type("Dataset", (), {})
_dss.OBJECT_PATH = ""
_dss.MODEL_PATH = ""
_dsk = _ensure_module("data.dataset_skeleton")
_dsk.get_datasets = lambda *a, **k: None
for _n in ("libsmpl", "libsmpl.smplpytorch", "libsmpl.smplpytorch.pytorch"):
    _ensure_module(_n)
_sl = _ensure_module("libsmpl.smplpytorch.pytorch.smpl_layer")
_sl.SMPL_Layer = type("SMPL_Layer", (), {})

REF = "/root/reference/interdiff"
if REF not in sys.path:
    sys.path.append(REF)

import train_correction_smpl as ref_corr  # noqa: E402  (reference)
import train_diffusion_skeleton as ref_skel  # noqa: E402
import train_diffusion_smpl as ref_smpl  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.train.losses import (  # noqa: E402
    SkeletonLossWeights,
    SmplLossWeights,
    skeleton_diffusion_losses,
    smpl_diffusion_losses,
)
from interdiff_tpu.train.losses_correction import (  # noqa: E402
    CorrectionLossWeights,
    correction_smpl_losses,
)

PAST = 10


class _StubSampler:
    """UniformSampler stand-in: fixed timesteps, unit weights
    (`diffusion/resample.py:42-55` yields weights==1 for uniform)."""

    def __init__(self, t):
        self._t = t

    def sample(self, n, device):
        return self._t, torch.ones(n)


class _StubDiffusion:
    """Engine stand-in: `training_losses` returns the fixed (pred, gt)
    pair, exactly the modified-return contract of the reference engine
    (`gaussian_diffusion.py:1368`)."""

    num_timesteps = 1000

    def __init__(self, pred, gt):
        self._out = (pred, gt)

    def training_losses(self, model, batch, t, model_kwargs=None):
        return self._out


def _bare_lit(module, args, pred, gt, t):
    """A LitInteraction carcass: real bound loss methods, stubbed engine."""
    lit = module.LitInteraction.__new__(module.LitInteraction)
    lit.args = args
    lit.schedule_sampler = _StubSampler(t)
    lit.diffusion = _StubDiffusion(pred, gt)
    lit.ddp_model = None
    lit.log_loss_dict = lambda *a, **k: None
    return lit


def _capture_terms(lit):
    captured = {}
    lit.log_loss_dict = (
        lambda diffusion, ts, losses, loss: captured.update(losses))
    return captured


def test_smpl_diffusion_loss_terms_match_reference(rng):
    """All 16 weighted terms + the scalar, incl. the zero-target velocity
    quirk (`train_diffusion_smpl.py:91-115`: gt-minus-itself targets +
    prediction-acceleration penalties)."""
    B, T, C = 4, PAST + 25, 144
    args = SimpleNamespace(smpl_dim=132, past_len=PAST,
                           weight_smplx_rot=1.0, weight_smplx_nonrot=0.2,
                           weight_obj_rot=0.1, weight_obj_nonrot=0.2,
                           weight_past=1.0, weight_v=0.2)
    pred = rng.standard_normal((B, T, C)).astype(np.float32)
    gt = rng.standard_normal((B, T, C)).astype(np.float32)
    t = torch.from_numpy(rng.integers(0, 1000, B))

    # engine contract: [B, 1, C, T]
    as_engine = lambda a: torch.from_numpy(a.transpose(0, 2, 1)[:, None].copy())
    lit = _bare_lit(ref_smpl, args, as_engine(pred), as_engine(gt), t)
    captured = _capture_terms(lit)
    ref_loss, *_ = lit.forward_backward(torch.from_numpy(pred), cond=None)

    ours_loss, ours_terms = smpl_diffusion_losses(
        jnp.asarray(pred), jnp.asarray(gt), past_len=PAST,
        weights=SmplLossWeights(smplx_rot=1.0, smplx_nonrot=0.2, obj_rot=0.1,
                                obj_nonrot=0.2, past=1.0, v=0.2))
    assert set(captured) == set(ours_terms)
    for k, v in captured.items():
        np.testing.assert_allclose(np.asarray(ours_terms[k]),
                                   v.detach().numpy(), atol=1e-5,
                                   err_msg=f"term {k}")
    np.testing.assert_allclose(float(jnp.mean(ours_loss)),
                               float(ref_loss), rtol=1e-5)


def test_skeleton_diffusion_loss_terms_match_reference(rng):
    """All 13 weighted terms (`train_diffusion_skeleton.py:101-160`) incl.
    the QuaterNet quaternion-norm regulariser; these velocity terms use
    real gt deltas, unlike the SMPL track."""
    B, T, C = 4, 2 * PAST, 106
    args = SimpleNamespace(num_joints=21, num_points=12, past_len=PAST,
                           weight_body=2.0, weight_obj=1.0,
                           weight_obj_rot=1.0, weight_obj_nonrot=1.0,
                           weight_quat_reg=0.01, weight_v=1.0,
                           weight_past=0.5)
    pred = rng.standard_normal((B, T, C)).astype(np.float32)
    gt = rng.standard_normal((B, T, C)).astype(np.float32)
    t = torch.from_numpy(rng.integers(0, 1000, B))

    as_engine = lambda a: torch.from_numpy(a.transpose(0, 2, 1)[:, None].copy())
    lit = _bare_lit(ref_skel, args, as_engine(pred), as_engine(gt), t)
    captured = _capture_terms(lit)
    ref_loss, *_ = lit.forward_backward(torch.from_numpy(pred), cond=None)

    ours_loss, ours_terms = skeleton_diffusion_losses(
        jnp.asarray(pred), jnp.asarray(gt), past_len=PAST,
        weights=SkeletonLossWeights(past=0.5, body=2.0, obj=1.0, obj_rot=1.0,
                                    obj_nonrot=1.0, quat_reg=0.01, v=1.0))
    assert set(captured) == set(ours_terms)
    for k, v in captured.items():
        np.testing.assert_allclose(np.asarray(ours_terms[k]),
                                   v.detach().numpy(), atol=1e-5,
                                   err_msg=f"term {k}")
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-5)


@pytest.mark.parametrize("epoch", [0, 7, 40])
def test_correction_loss_terms_match_reference(rng, epoch):
    """`calc_loss_contact` (`train_correction_smpl.py:103-185`): 8 pose MSE
    terms + contact (|h2o| on labelled far verts) + penetration (|o2h|
    weighted 20 inside) with the epoch**2/second_stage annealing — through
    the reference's own `tools.point2point_signed` (chamfer backed by
    torch.cdist)."""
    T, B, V, P = 12, 2, 128, 64
    args = SimpleNamespace(past_len=PAST, weight_obj_rot=0.1,
                           weight_obj_nonrot=0.1, weight_past=0.5,
                           weight_v=1.0, weight_contact=1.0,
                           weight_penetration=0.1, use_annealing=True,
                           second_stage=20)
    lit = ref_corr.LitInteraction.__new__(ref_corr.LitInteraction)
    lit.args = args
    lit.current_epoch = epoch
    lit.device = torch.device("cpu")

    # plausible geometry: unit-ish rotations, points near the verts
    aa = rng.standard_normal((T, B, 3)).astype(np.float32)
    rot6d = _vp3d.matrix_to_rotation_6d(
        _vp3d.axis_angle_to_matrix(torch.from_numpy(aa))).numpy()
    trans = 0.1 * rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_pred = np.concatenate([rot6d, trans], -1)
    obj_gt = obj_pred + 0.05 * rng.standard_normal(obj_pred.shape).astype(
        np.float32)
    obj_points = rng.standard_normal((B, P, 6)).astype(np.float32) * 0.3
    verts = rng.standard_normal((T, B, V, 3)).astype(np.float32) * 0.4
    normals = rng.standard_normal((T, B, V, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    label = (rng.random((T, B, V)) < 0.2).astype(np.float32)
    human_verts = np.concatenate([verts, normals, label[..., None]], -1)

    batch = {"obj_points": torch.from_numpy(obj_points),
             "frames": [{"human_verts": torch.from_numpy(human_verts[t])}
                        for t in range(T)]}
    with torch.no_grad():
        ref_loss, _, ref_weighted = lit.calc_loss_contact(
            torch.from_numpy(obj_pred), torch.from_numpy(obj_gt), batch)

    ours_loss, ours_terms = correction_smpl_losses(
        jnp.asarray(obj_pred.transpose(1, 0, 2)),
        jnp.asarray(obj_gt.transpose(1, 0, 2)), past_len=PAST,
        obj_points=jnp.asarray(obj_points[..., :3]),
        human_verts=jnp.asarray(human_verts.transpose(1, 0, 2, 3)),
        epoch=jnp.asarray(epoch),
        weights=CorrectionLossWeights(obj_rot=0.1, obj_nonrot=0.1, past=0.5,
                                      v=1.0, contact=1.0, penetration=0.1,
                                      use_annealing=True, second_stage=20))
    assert set(ref_weighted) == set(ours_terms)
    for k, v in ref_weighted.items():
        np.testing.assert_allclose(np.asarray(ours_terms[k]),
                                   v.detach().numpy(), atol=1e-5,
                                   err_msg=f"term {k} (epoch {epoch})")
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-5,
                               atol=1e-6)


# tgm (human_body_prior) stub for `tools.rotvec_to_rotmat` — axis-angle ->
# 4x4 homogeneous rotation via the vendored pytorch3d math (both equal
# cv2.Rodrigues; our jax side's convention parity is pinned separately in
# tests/test_rotations.py)
def _tgm_angle_axis_to_rotation_matrix(aa):
    R = _vp3d.axis_angle_to_matrix(aa)
    out = torch.zeros((aa.shape[0], 4, 4), dtype=R.dtype)
    out[:, :3, :3] = R
    out[:, 3, 3] = 1.0
    return out


_hbp_tgm.angle_axis_to_rotation_matrix = _tgm_angle_axis_to_rotation_matrix

import train_correction_skeleton as ref_corr_skel  # noqa: E402  (reference)

from interdiff_tpu.eval.metrics import skeleton_metrics  # noqa: E402
from interdiff_tpu.train.losses import smpl_val_losses  # noqa: E402
from interdiff_tpu.train.losses_correction import (  # noqa: E402
    correction_skeleton_losses,
)


def test_smpl_val_loss_terms_match_reference(rng):
    """`calc_val_loss` (`train_diffusion_smpl.py:185-260`): the 16 scalar
    validation terms scored in rotation-MATRIX space on sampled axis-angle
    predictions (velocities here use real gt deltas, unlike training)."""
    T, B, nJ = PAST + 25, 3, 22
    args = SimpleNamespace(past_len=PAST, weight_smplx_rot=1.0,
                           weight_smplx_nonrot=0.2, weight_obj_rot=0.1,
                           weight_obj_nonrot=0.2, weight_past=1.0,
                           weight_v=0.2)
    lit = ref_smpl.LitInteraction.__new__(ref_smpl.LitInteraction)
    lit.args = args
    body_pred = 0.5 * rng.standard_normal((T, B, 3 * nJ + 3)).astype(np.float32)
    body_gt = 0.5 * rng.standard_normal((T, B, 3 * nJ + 3)).astype(np.float32)
    obj_pred = 0.5 * rng.standard_normal((T, B, 6)).astype(np.float32)
    obj_gt = 0.5 * rng.standard_normal((T, B, 6)).astype(np.float32)

    with torch.no_grad():
        ref_loss, _, ref_weighted = lit.calc_val_loss(
            torch.from_numpy(body_pred), torch.from_numpy(body_gt),
            torch.from_numpy(obj_pred), torch.from_numpy(obj_gt), batch=None)

    ours_loss, ours_terms = smpl_val_losses(
        jnp.asarray(body_pred.transpose(1, 0, 2)),
        jnp.asarray(body_gt.transpose(1, 0, 2)),
        jnp.asarray(obj_pred.transpose(1, 0, 2)),
        jnp.asarray(obj_gt.transpose(1, 0, 2)), past_len=PAST,
        weights=SmplLossWeights(smplx_rot=1.0, smplx_nonrot=0.2, obj_rot=0.1,
                                obj_nonrot=0.2, past=1.0, v=0.2))
    assert set(ref_weighted) == set(ours_terms)
    for k, v in ref_weighted.items():
        np.testing.assert_allclose(np.asarray(ours_terms[k]),
                                   v.detach().numpy(), atol=2e-5,
                                   err_msg=f"val term {k}")
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=2e-5)


def test_skeleton_correction_loss_terms_match_reference(rng):
    """Skeleton correction `calc_loss`
    (`train_correction_skeleton.py:85-126`): the 8 quaternion-space pose
    terms with the shared `[:-3]`/`[-3:]` slicing."""
    T, B = 2 * PAST, 3
    args = SimpleNamespace(past_len=PAST, weight_obj_rot=1.0,
                           weight_obj_nonrot=1.0, weight_past=0.5,
                           weight_v=1.0)
    lit = ref_corr_skel.LitObjInteraction.__new__(
        ref_corr_skel.LitObjInteraction)
    lit.args = args
    obj_pred = rng.standard_normal((T, B, 7)).astype(np.float32)
    obj_gt = rng.standard_normal((T, B, 7)).astype(np.float32)

    with torch.no_grad():
        ref_loss, _, ref_weighted = lit.calc_loss(
            torch.from_numpy(obj_pred), torch.from_numpy(obj_gt))

    ours_loss, ours_terms = correction_skeleton_losses(
        jnp.asarray(obj_pred.transpose(1, 0, 2)),
        jnp.asarray(obj_gt.transpose(1, 0, 2)), past_len=PAST,
        weights=CorrectionLossWeights(obj_rot=1.0, obj_nonrot=1.0, past=0.5,
                                      v=1.0))
    assert set(ref_weighted) == set(ours_terms)
    for k, v in ref_weighted.items():
        np.testing.assert_allclose(np.asarray(ours_terms[k]),
                                   v.detach().numpy(), atol=1e-6,
                                   err_msg=f"term {k}")
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-6)


def test_skeleton_calc_metric_matches_reference(rng):
    """`calc_metric` (`train_diffusion_skeleton.py:65-87`): MPJPE-h/o,
    translation and the sign-invariant quaternion error over frames 10+."""
    T, B = 2 * PAST, 3
    lit = ref_skel.LitInteraction.__new__(ref_skel.LitInteraction)
    lit.args = SimpleNamespace(num_joints=21, num_points=12)
    body_pred = rng.standard_normal((T, B, 21, 3)).astype(np.float32)
    body_gt = rng.standard_normal((T, B, 21, 3)).astype(np.float32)
    obj_pred = rng.standard_normal((T, B, 12, 3)).astype(np.float32)
    obj_gt = rng.standard_normal((T, B, 12, 3)).astype(np.float32)
    pose_pred = rng.standard_normal((T, B, 7)).astype(np.float32)
    pose_gt = rng.standard_normal((T, B, 7)).astype(np.float32)

    with torch.no_grad():
        ref_m = lit.calc_metric(
            torch.from_numpy(body_pred), torch.from_numpy(body_gt),
            torch.from_numpy(obj_pred), torch.from_numpy(obj_gt),
            torch.from_numpy(pose_pred), torch.from_numpy(pose_gt))

    tb = lambda a: jnp.asarray(np.moveaxis(a, 0, 1))
    ours = skeleton_metrics(tb(body_pred), tb(body_gt), tb(obj_pred),
                            tb(obj_gt), tb(pose_pred), tb(pose_gt), start=10)
    assert set(ref_m) == set(ours)
    for k, v in ref_m.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=1e-5,
                                   err_msg=f"metric {k}")


def test_smpl_diverse_test_loss_matches_reference(rng):
    """`calc_loss` (`train_diffusion_smpl.py:262-379`): the diverse-sample
    test loss — 16 mean terms + 16 per-clip-min-over-samples `_min`
    diagnostics, with the future-velocity slice quirk (`[p+1:]-[p:-1]`,
    unlike calc_val_loss)."""
    from interdiff_tpu.train.losses import smpl_diverse_test_losses

    N, T, B, nJ = 4, PAST + 25, 2, 22
    args = SimpleNamespace(past_len=PAST, diverse_samples=N,
                           weight_smplx_rot=1.0, weight_smplx_nonrot=0.2,
                           weight_obj_rot=0.1, weight_obj_nonrot=0.2,
                           weight_past=1.0, weight_v=0.2)
    lit = ref_smpl.LitInteraction.__new__(ref_smpl.LitInteraction)
    lit.args = args
    body_pred = 0.5 * rng.standard_normal((N, T, B, 3 * nJ + 3)).astype(np.float32)
    body_gt = 0.5 * rng.standard_normal((T, B, 3 * nJ + 3)).astype(np.float32)
    obj_pred = 0.5 * rng.standard_normal((N, T, B, 6)).astype(np.float32)
    obj_gt = 0.5 * rng.standard_normal((T, B, 6)).astype(np.float32)

    with torch.no_grad():
        ref_loss, ref_dict, ref_weighted = lit.calc_loss(
            torch.from_numpy(body_pred), torch.from_numpy(body_gt),
            torch.from_numpy(obj_pred), torch.from_numpy(obj_gt), batch=None)

    ours_loss, ours_dict, ours_weighted = smpl_diverse_test_losses(
        jnp.asarray(body_pred.transpose(0, 2, 1, 3)),
        jnp.asarray(body_gt.transpose(1, 0, 2)),
        jnp.asarray(obj_pred.transpose(0, 2, 1, 3)),
        jnp.asarray(obj_gt.transpose(1, 0, 2)), past_len=PAST,
        weights=SmplLossWeights(smplx_rot=1.0, smplx_nonrot=0.2, obj_rot=0.1,
                                obj_nonrot=0.2, past=1.0, v=0.2))
    assert set(ref_dict) == set(ours_dict) and len(ref_dict) == 32
    for k, v in ref_dict.items():
        np.testing.assert_allclose(np.asarray(ours_dict[k]),
                                   v.detach().numpy(), atol=2e-5,
                                   err_msg=f"test-loss term {k}")
    assert set(ref_weighted) == set(ours_weighted)
    for k, v in ref_weighted.items():
        np.testing.assert_allclose(np.asarray(ours_weighted[k]),
                                   v.detach().numpy(), atol=2e-5,
                                   err_msg=f"weighted {k}")
    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=2e-5)
