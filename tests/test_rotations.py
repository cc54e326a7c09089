import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rot

from interdiff_tpu.geometry import rotations as R


def random_rotvecs(rng, n=64, max_angle=np.pi * 0.98):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0.01, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_axis_angle_to_matrix_matches_scipy(rng):
    aa = random_rotvecs(rng)
    ours = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
    ref = Rot.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quaternion_to_matrix_matches_scipy(rng):
    q_xyzw = Rot.from_rotvec(random_rotvecs(rng)).as_quat()
    q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
    ours = np.asarray(R.quaternion_to_matrix(jnp.asarray(q_wxyz, dtype=jnp.float32)))
    ref = Rot.from_quat(q_xyzw).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_quaternion_roundtrip_and_sign(rng):
    aa = random_rotvecs(rng)
    mats = Rot.from_rotvec(aa).as_matrix().astype(np.float32)
    q = np.asarray(R.matrix_to_quaternion(jnp.asarray(mats)))
    # unit norm, round trip, and pytorch3d sign rule: largest |component| > 0
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    back = np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(back, mats, atol=1e-5)
    biggest = q[np.arange(len(q)), np.abs(q).argmax(axis=-1)]
    assert (biggest > 0).all()


def test_axis_angle_roundtrip_small_angles(rng):
    # exact rotvec round trip is only guaranteed while w stays the dominant
    # quaternion component (pytorch3d's branch selection can otherwise return
    # the equivalent 2*pi - theta / flipped-axis representation)
    aa = random_rotvecs(rng, max_angle=np.pi / 2)
    back = np.asarray(R.matrix_to_axis_angle(R.axis_angle_to_matrix(jnp.asarray(aa))))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_axis_angle_roundtrip_matrix_space(rng):
    # for any angle, the round trip must preserve the rotation itself
    aa = random_rotvecs(rng, max_angle=np.pi * 0.999)
    m1 = R.axis_angle_to_matrix(jnp.asarray(aa))
    m2 = R.axis_angle_to_matrix(R.matrix_to_axis_angle(m1))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


def test_rot6d_conventions(rng):
    aa = random_rotvecs(rng)
    mats = Rot.from_rotvec(aa).as_matrix().astype(np.float32)
    d6 = np.asarray(R.matrix_to_rotation_6d(jnp.asarray(mats)))
    # first two ROWS of the matrix (pytorch3d convention)
    np.testing.assert_allclose(d6, mats[:, :2, :].reshape(-1, 6), atol=0)
    back = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_rot6d_gram_schmidt_projects_noise(rng):
    d6 = rng.normal(size=(32, 6)).astype(np.float32)
    m = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
    eye = np.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(m @ m.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_quat_order_swizzles(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    wxyz = np.asarray(R.quat_xyzw_to_wxyz(jnp.asarray(q)))
    assert (wxyz[:, 0] == q[:, 3]).all() and (wxyz[:, 1:] == q[:, :3]).all()
    back = np.asarray(R.quat_wxyz_to_xyzw(jnp.asarray(wxyz)))
    np.testing.assert_array_equal(back, q)


def test_batch_rodrigues_smpl_matches_standard(rng):
    aa = random_rotvecs(rng)
    a = np.asarray(R.batch_rodrigues_smpl(jnp.asarray(aa)))
    b = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_rodrigues_smpl_zero_pose_finite():
    aa = jnp.zeros((4, 3), dtype=jnp.float32)
    m = np.asarray(R.batch_rodrigues_smpl(aa))
    assert np.isfinite(m).all()
    np.testing.assert_allclose(m, np.eye(3)[None].repeat(4, 0), atol=1e-5)


def test_axis_angle_large_angle_pytorch3d_semantics():
    # pytorch3d's quaternion route can return angles > pi when w < 0;
    # verify our conversion is its own inverse in matrix space regardless.
    aa = np.array([[0.0, 3.5, 0.0]], dtype=np.float32)  # angle > pi
    m = R.axis_angle_to_matrix(jnp.asarray(aa))
    aa_back = R.matrix_to_axis_angle(m)
    m2 = R.axis_angle_to_matrix(aa_back)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)
