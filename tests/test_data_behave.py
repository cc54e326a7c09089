"""BEHAVE canonicalization tests: numpy rotation helpers vs scipy, and the
clip canonicalization invariants of `interdiff/data/dataset_smpl.py:106-189`."""

import numpy as np
import pytest

from interdiff_tpu.data.behave import (
    BehaveDataset,
    BehaveSequence,
    canonicalize_clip,
    collate,
    yaw_canonical_rotation,
)
from interdiff_tpu.geometry.rotations_np import (
    matrix_to_rotvec_np,
    rotvec_compose_np,
    rotvec_to_matrix_np,
)


def test_rotvec_roundtrip_vs_scipy(rng):
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    for _ in range(20):
        v = rng.standard_normal(3) * 2
        R = rotvec_to_matrix_np(v)
        R_ref = scipy_rot.Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-10)
        v_back = matrix_to_rotvec_np(R)
        v_ref = scipy_rot.Rotation.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(v_back, v_ref, atol=1e-8)


def test_rotvec_compose_vs_scipy(rng):
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    for _ in range(10):
        v = rng.standard_normal(3)
        R = scipy_rot.Rotation.from_rotvec(rng.standard_normal(3)).as_matrix()
        got = rotvec_compose_np(R, v)
        want = (scipy_rot.Rotation.from_matrix(R)
                * scipy_rot.Rotation.from_rotvec(v)).as_rotvec()
        np.testing.assert_allclose(got, want, atol=1e-6)


def _clip_inputs(rng, T=5, V=6890, P=16):
    return dict(
        poses=rng.standard_normal((T, 156)).astype(np.float32) * 0.3,
        betas=rng.standard_normal((T, 10)).astype(np.float32),
        trans=rng.standard_normal((T, 3)).astype(np.float32),
        pelvis=rng.standard_normal((T, 3)).astype(np.float32),
        obj_angles=rng.standard_normal((T, 3)).astype(np.float32) * 0.5,
        obj_trans=rng.standard_normal((T, 3)).astype(np.float32),
        human_verts=rng.standard_normal((T, V, 6)).astype(np.float32),
        obj_points=rng.standard_normal((P, 6)).astype(np.float32),
        obj_contact_idx=[np.array([0, 2]) for _ in range(T)],
        human_contact_idx=[np.array([1]) for _ in range(T)],
        left_foot=rng.standard_normal((10, 3)).astype(np.float32),
        right_foot=rng.standard_normal((10, 3)).astype(np.float32),
        frame_indices=np.arange(2, 2 + T),
        ground_joint_label_first=10,
    )


def test_canonicalization_invariants(rng):
    inp = _clip_inputs(rng)
    out = canonicalize_clip(**inp)

    # frame-0 pelvis at the origin (pelvis of start frame is the centroid)
    np.testing.assert_allclose(out["pelvis"][0], 0.0, atol=1e-6)

    # yaw alignment: the canonical global orient's first column has no
    # z-component (the rotation was built to zero it)
    R0 = rotvec_to_matrix_np(out["body_pose"][0, :3])
    assert abs(R0[2, 0]) < 1e-5

    # rotation_v is a pure y-rotation: determinant 1, y-axis fixed
    rv = out["rotation_v"]
    np.testing.assert_allclose(rv[:, 1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(rv), 1.0, atol=1e-5)

    # distances are preserved (rigid transform): vert-to-pelvis distances
    d_orig = np.linalg.norm(
        inp["human_verts"][0, :, :3] - inp["pelvis"][0], axis=-1)
    d_canon = np.linalg.norm(
        out["human_verts"][0, :, :3] - out["pelvis"][0], axis=-1)
    np.testing.assert_allclose(d_canon, d_orig, atol=1e-4)

    # contact labels land where directed
    assert out["human_verts"][0, 1, 6] == 1.0
    assert out["obj_points_frames"][0, 0, 6] == 1.0
    assert out["obj_points_frames"][0, 1, 6] == 0.0

    # markers are the SSM-67 rows of the vert array
    from interdiff_tpu.data.constants import MARKERSET_SSM67_SMPLH
    np.testing.assert_allclose(
        out["markers"], out["human_verts"][:, MARKERSET_SSM67_SMPLH])

    # object points rigidity: pairwise distances match the template's
    tpl = inp["obj_points"][:, :3]
    frame = out["obj_points_frames"][2, :, :3]
    d_tpl = np.linalg.norm(tpl[:1] - tpl, axis=-1)
    d_frm = np.linalg.norm(frame[:1] - frame, axis=-1)
    np.testing.assert_allclose(d_frm, d_tpl, atol=1e-4)


def test_dataset_windows_and_collate(rng):
    T_total, V, P = 76, 6890, 16
    # minimal fake sequence; only fields the dataset touches
    seq = BehaveSequence(
        seq_name="Date99_test", gender="male", obj_name="backpack",
        poses=rng.standard_normal((T_total, 156)).astype(np.float32) * 0.2,
        betas=rng.standard_normal((T_total, 10)).astype(np.float32),
        trans=rng.standard_normal((T_total, 3)).astype(np.float32),
        obj_angles=rng.standard_normal((T_total, 3)).astype(np.float32),
        obj_trans=rng.standard_normal((T_total, 3)).astype(np.float32),
        pelvis=rng.standard_normal((T_total, 3)).astype(np.float32),
        left_foot=rng.standard_normal((T_total, 3)).astype(np.float32),
        right_foot=rng.standard_normal((T_total, 3)).astype(np.float32),
        human_verts=rng.standard_normal((T_total, V, 6)).astype(np.float32),
        obj_points=rng.standard_normal((P, 6)).astype(np.float32),
        obj_contact_idx=[np.array([0]) for _ in range(T_total)],
        human_contact_idx=[np.array([0]) for _ in range(T_total)],
        ground_joint_label=np.full((T_total,), 10),
    )
    ds = BehaveDataset([seq], past_len=10, future_len=25, sample_rate=1)
    # 76 // 35 = 2 windows
    assert len(ds) == 2
    clip = ds[0]
    assert clip["body_pose"].shape == (35, 156)
    assert clip["markers"].shape == (35, 67, 7)

    batch = collate([ds[0], ds[1]])
    assert batch["body_pose"].shape == (2, 35, 156)
    assert batch["obj_points_frames"].shape == (2, 35, P, 7)
    assert batch["gender"].shape == (2,)

    # light mode: identical pose streams, no per-vertex tensors built
    ds_light = BehaveDataset([seq], past_len=10, future_len=25,
                             sample_rate=1, fields="light")
    ds.rng = np.random.default_rng(5)
    ds_light.rng = np.random.default_rng(5)
    full, light = ds[0], ds_light[0]
    for k in ("body_pose", "body_trans", "obj_angles", "obj_trans",
              "pelvis", "ground_joint_label", "obj_points"):
        np.testing.assert_array_equal(full[k], light[k])
    for k in ("human_verts", "markers", "obj_points_frames"):
        assert k not in light
