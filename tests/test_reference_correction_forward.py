"""Reference-forward goldens for the shipped correction checkpoints.

The two checkpoints (`reference/interdiff/checkpoints/correction.ckpt`,
`obj_skeleton.ckpt`) are loaded into the ACTUAL reference `ObjProjector`
modules (`reference/interdiff/model/correction_smpl.py:69-137`,
`correction_skeleton.py:73-134`) — importable once `pointnet2_ops`,
`pytorch3d.transforms`, `local_attention`, `torchvision` and `smplx` are
supplied via sys.modules stubs (vendored math in
tests/vendor_pytorch3d_transforms.py / vendor_local_attention.py) — and both
frameworks run the same fixed inputs through the same weights.

This makes the converted-checkpoint parity claim reference-derived: the
torch side below IS the reference network, not a recorded conversion
(cf. tests/test_golden_correction.py, which pins regressions against the
initial conversion snapshot).
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

# --- sys.modules stubs for the reference's native/pip deps -----------------
_la = types.ModuleType("local_attention")
_la.LocalAttention = _vla.LocalAttention
sys.modules.setdefault("local_attention", _la)

_tv = types.ModuleType("torchvision")
_tv_ops = types.ModuleType("torchvision.ops")
_tv_ops.stochastic_depth = lambda x, p, mode, training=True: x
_tv.ops = _tv_ops
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv_ops)

_p2 = types.ModuleType("pointnet2_ops")
_p2m = types.ModuleType("pointnet2_ops.pointnet2_modules")
_p2m.PointnetSAModuleMSG = type("PointnetSAModuleMSG", (), {})
_p2.pointnet2_modules = _p2m
sys.modules.setdefault("pointnet2_ops", _p2)
sys.modules.setdefault("pointnet2_ops.pointnet2_modules", _p2m)

_p3 = types.ModuleType("pytorch3d")
_p3t = types.ModuleType("pytorch3d.transforms")
for _name in ("axis_angle_to_matrix", "matrix_to_rotation_6d",
              "quaternion_to_matrix", "rotation_6d_to_matrix",
              "matrix_to_quaternion"):
    setattr(_p3t, _name, getattr(_vp3d, _name))
_p3.transforms = _p3t
sys.modules.setdefault("pytorch3d", _p3)
sys.modules.setdefault("pytorch3d.transforms", _p3t)

sys.modules.setdefault("smplx", types.ModuleType("smplx"))  # data.utils:6

REF = "/root/reference/interdiff"
if REF not in sys.path:
    sys.path.append(REF)

import model.correction_skeleton as ref_corr_skel  # noqa: E402  (reference)
import model.correction_smpl as ref_corr_smpl  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.models.correction import (  # noqa: E402
    ObjProjectorSkeleton,
    ObjProjectorSmpl,
)
from interdiff_tpu.utils.checkpoint import (  # noqa: E402
    load_correction_skeleton,
    load_correction_smpl,
    load_lightning_state_dict,
)

SMPL_CKPT = "/root/reference/interdiff/checkpoints/correction.ckpt"
SKEL_CKPT = "/root/reference/interdiff/checkpoints/obj_skeleton.ckpt"


def _load_reference(module, ckpt_path, **extra_args):
    sd, hp = load_lightning_state_dict(ckpt_path)
    args = SimpleNamespace(**hp, **extra_args)
    ref = module.ObjProjector(args)
    state = {k[len("model."):]: torch.from_numpy(v)
             for k, v in sd.items() if k.startswith("model.")}
    missing, unexpected = ref.load_state_dict(state, strict=True), None
    ref.eval()
    return ref


def _random_rot6d(rng, shape):
    aa = rng.standard_normal(shape + (3,)).astype(np.float32)
    m = _vp3d.axis_angle_to_matrix(torch.from_numpy(aa))
    return _vp3d.matrix_to_rotation_6d(m).numpy()


@pytest.mark.parametrize("initialize", [False, True])
def test_smpl_correction_ckpt_reference_forward(rng, initialize):
    """`correction.ckpt` through the reference eval path (argmax marker
    selection / initialize mean) vs our converted flax projector."""
    ref = _load_reference(ref_corr_smpl, SMPL_CKPT, dct=10)
    assert ref.dct_m.shape == (35, 35) and ref.n_pre == 10

    T, B, P = 35, 3, 67
    rot6d = _random_rot6d(rng, (T, B))                       # [T,B,6]
    trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    markers = rng.standard_normal((T, B, P, 3)).astype(np.float32)
    contact = (rng.random((B, P)) < 0.08).astype(np.float32) * \
        rng.integers(1, 5, (B, P))
    contact[0] = 0.0  # exercise the no-contact absolute-node path

    with torch.no_grad():
        ref_out = ref.sample(torch.from_numpy(rot6d), torch.from_numpy(trans),
                             torch.from_numpy(markers),
                             torch.from_numpy(contact),
                             initialize=initialize).numpy()  # [T,B,9]

    variables, _ = load_correction_smpl(SMPL_CKPT)
    obj9 = jnp.asarray(np.concatenate([rot6d, trans], -1).transpose(1, 0, 2))
    ours = ObjProjectorSmpl(past_len=10, future_len=25).apply(
        variables, obj9, jnp.asarray(markers.transpose(1, 0, 2, 3)),
        jnp.asarray(contact), initialize=initialize, train=False,
        method=ObjProjectorSmpl.sample)                      # [B,T,9]
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), ref_out,
                               atol=1e-4)


def test_skeleton_correction_ckpt_reference_forward(rng):
    """`obj_skeleton.ckpt` through the reference forward (absolute-node
    output, xyzw quaternion I/O) vs our converted flax projector."""
    ref = _load_reference(ref_corr_skel, SKEL_CKPT)
    assert ref.n_pre == 20

    T, B, J = 20, 3, 21
    quat_wxyz = _vp3d.axis_angle_to_quaternion(torch.from_numpy(
        rng.standard_normal((T, B, 3)).astype(np.float32))).numpy()
    quat_xyzw = np.concatenate([quat_wxyz[..., 1:], quat_wxyz[..., :1]], -1)
    trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    joints = rng.standard_normal((T, B, J, 3)).astype(np.float32)

    with torch.no_grad():
        ref_q, ref_t = ref.sample(torch.from_numpy(quat_xyzw),
                                  torch.from_numpy(trans),
                                  torch.from_numpy(joints))
        ref_q, ref_t = ref_q.numpy(), ref_t.numpy()          # [T,B,4/3]

    variables, _ = load_correction_skeleton(SKEL_CKPT)
    ours_q, ours_t = ObjProjectorSkeleton(past_len=10, future_len=10).apply(
        variables, jnp.asarray(quat_xyzw.transpose(1, 0, 2)),
        jnp.asarray(trans.transpose(1, 0, 2)),
        jnp.asarray(joints.transpose(1, 0, 2, 3)), train=False,
        method=ObjProjectorSkeleton.sample)                  # [B,T,4/3]
    np.testing.assert_allclose(np.asarray(ours_q).transpose(1, 0, 2), ref_q,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_t).transpose(1, 0, 2), ref_t,
                               atol=1e-4)


def test_smpl_correction_training_multinomial_distribution(rng):
    """The train-time marker pick is torch.multinomial over contact counts
    with +0.5 hand bias (`correction_smpl.py:131-134`); ours uses
    jax.random.categorical(log(weights)) — check the reference's selection
    weights match ours exactly (the sampled index distribution is then
    identical by construction)."""
    from interdiff_tpu.data.constants import hand_bias_vector

    sys.path.append(REF)
    from data.utils import marker2bodypart  # reference table

    P = 67
    contact = (rng.random((4, P)) < 0.1).astype(np.float32) * 3
    hand_marker = (marker2bodypart["left_hand_ids"]
                   + marker2bodypart["right_hand_ids"])
    ref_weights = contact.copy()
    ref_weights[:, hand_marker] += 0.5

    our_weights = contact + np.asarray(hand_bias_vector(P))
    np.testing.assert_allclose(our_weights, ref_weights)
