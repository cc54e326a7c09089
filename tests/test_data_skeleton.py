"""Skeleton (HO-GCN) dataset pipeline tests
(`interdiff/data/dataset_skeleton.py`)."""

import numpy as np
import pytest

from interdiff_tpu.data.skeleton import (
    SkeletonClip,
    collate_skeleton,
    extract_clips,
    get_consistent_poses,
    pose_to_keypoints,
    quat_xyzw_to_matrix_np,
    recover_init_obj,
)


def _random_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def test_quat_xyzw_matrix_vs_scipy(rng):
    scipy_rot = pytest.importorskip("scipy.spatial.transform")
    for _ in range(10):
        q = _random_quat(rng)
        np.testing.assert_allclose(
            quat_xyzw_to_matrix_np(q),
            scipy_rot.Rotation.from_quat(q).as_matrix(), atol=1e-10)


def test_recover_init_obj_roundtrip(rng):
    # build points from a known pose, invert, re-apply
    p0 = rng.standard_normal((12, 3))
    q = _random_quat(rng)
    t = rng.standard_normal(3)
    pose = np.concatenate([t, q])
    R = quat_xyzw_to_matrix_np(q)
    pts = p0 @ R.T + t
    rec = recover_init_obj(pts, pose)
    np.testing.assert_allclose(rec, p0, atol=1e-8)

    again = pose_to_keypoints(rec, pose[None])[0]
    np.testing.assert_allclose(again, pts, atol=1e-8)


def test_consistent_poses_fixes_flips(rng):
    q = _random_quat(rng)
    poses = np.zeros((4, 7))
    poses[:, -4:] = q
    poses[2, -4:] = -q  # one flip
    fixed = get_consistent_poses(poses)
    for i in range(3):
        assert np.linalg.norm(fixed[i, -4:] - fixed[i + 1, -4:]) < 1e-8


def test_extract_clips_window_math(rng):
    N = 500
    skeleton = rng.standard_normal((N, 21, 3))
    obj = rng.standard_normal((N, 12, 3))
    poses = np.zeros((N, 7))
    poses[:, -4:] = _random_quat(rng)
    contact = np.ones((N, 1))
    clips = extract_clips(skeleton, obj, poses, contact, seq_name="s",
                          obj_name="box")
    # windows start at 0, 12, 24, ... while start+240 < 500 -> starts 0..252
    assert len(clips) == len(range(0, 260, 12))
    assert clips[0].skeleton.shape == (20, 21, 3)
    assert clips[0].poses.shape == (20, 7)
    assert clips[0].zero_pose_obj.shape == (12, 3)

    batch = collate_skeleton(clips[:3])
    assert batch["skeleton"].shape == (3, 20, 21, 3)
    assert batch["zero_pose_obj"].shape == (3, 12, 3)


def test_unseen_requires_contact(rng):
    N = 400
    skeleton = rng.standard_normal((N, 21, 3))
    obj = rng.standard_normal((N, 12, 3))
    poses = np.zeros((N, 7))
    poses[:, -4:] = np.array([0, 0, 0, 1.0])
    contact = np.zeros((N, 1))
    assert extract_clips(skeleton, obj, poses, contact, unseen=True) == []


def test_load_skeleton_datasets_end_to_end(tmp_path, rng):
    """Full pipeline: per-sequence pickles on disk -> clips -> cached
    ds_*.pkl -> seeded splits (`dataset_skeleton.py:164-210`)."""
    import pickle

    from interdiff_tpu.data.skeleton import load_skeleton_datasets

    def write_seq(dirname, obj_name, n=500):
        d = tmp_path / dirname
        d.mkdir()
        skeleton = rng.standard_normal((n, 21, 3)).tolist()
        contact = np.ones((n, 1)).tolist()
        q = _random_quat(rng)
        t = rng.standard_normal(3)
        p0 = rng.standard_normal((12, 3))
        from interdiff_tpu.data.skeleton import quat_xyzw_to_matrix_np

        R = quat_xyzw_to_matrix_np(q)
        pts = (p0 @ R.T + t)
        poses = np.tile(np.concatenate([t, q]), (n, 1)).tolist()
        objdata = np.tile(pts[None], (n, 1, 1)).tolist()
        with open(d / f"subj_{obj_name}_take1.pkl", "wb") as f:
            pickle.dump([[skeleton, contact, poses, objdata]], f)

    write_seq("seq1", "box1")
    write_seq("seq2", "chair3")  # unseen object

    train, valid, test, unseen = load_skeleton_datasets(str(tmp_path))
    n_seen = len(train) + len(valid) + len(test)
    assert n_seen > 0 and len(unseen) > 0
    assert train[0].skeleton.shape == (20, 21, 3)
    assert train[0].zero_pose_obj.shape == (12, 3)

    # cache files written; second load uses them and reproduces the split
    assert (tmp_path / "ds_seen.pkl").exists()
    train2, _, _, unseen2 = load_skeleton_datasets(str(tmp_path))
    assert len(train2) == len(train) and len(unseen2) == len(unseen)
    np.testing.assert_allclose(train2[0].skeleton, train[0].skeleton)
