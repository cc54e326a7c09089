"""SMPL-H LBS forward tests against an independent numpy re-derivation.

The real model pkls are not in the snapshot (`.MISSING_LARGE_BLOBS`), so the
check uses synthetic model tensors on a small kinematic tree; the numpy
reference below implements the standard LBS equations joint-by-joint, which
is what `interdiff/libsmpl/.../smpl_layer.py:72-175` computes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from interdiff_tpu.smpl.model import SmplModel, smpl_forward


def _synthetic_model(rng, V=40, J=6, num_betas=4):
    parents = np.array([0, 0, 1, 1, 2, 0])[:J]
    v_template = rng.standard_normal((V, 3)) * 0.3
    shapedirs = rng.standard_normal((V, 3, num_betas)) * 0.02
    posedirs = rng.standard_normal((V, 3, 9 * (J - 1))) * 0.01
    j_regressor = rng.random((J, V))
    j_regressor /= j_regressor.sum(1, keepdims=True)
    weights = rng.random((V, J)) ** 3
    weights /= weights.sum(1, keepdims=True)
    faces = np.array([[0, 1, 2], [1, 2, 3]], dtype=np.int32)
    return dict(v_template=v_template, shapedirs=shapedirs,
                posedirs=posedirs, j_regressor=j_regressor,
                weights=weights, parents=parents, faces=faces)


def _rodrigues(v):
    theta = np.linalg.norm(v)
    if theta < 1e-12:
        return np.eye(3)
    k = v / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _numpy_lbs(m, pose, betas, trans):
    V, J = m["v_template"].shape[0], m["j_regressor"].shape[0]
    B = pose.shape[0]
    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, J, 3))
    for b in range(B):
        R = np.stack([_rodrigues(pose[b, 3 * j:3 * j + 3]) for j in range(J)])
        v_shaped = m["v_template"] + m["shapedirs"] @ betas[b]
        j0 = m["j_regressor"] @ v_shaped
        pose_map = (R[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + m["posedirs"] @ pose_map
        # FK with homogeneous transforms
        T = [None] * J
        T[0] = np.eye(4)
        T[0][:3, :3] = R[0]
        T[0][:3, 3] = j0[0]
        for j in range(1, J):
            p = m["parents"][j]
            local = np.eye(4)
            local[:3, :3] = R[j]
            local[:3, 3] = j0[j] - j0[p]
            T[j] = T[p] @ local
        out_j[b] = np.stack([T[j][:3, 3] for j in range(J)]) + trans[b]
        for j in range(J):
            Tj = T[j].copy()
            Tj[:3, 3] -= Tj[:3, :3] @ j0[j]
            T[j] = Tj
        for vi in range(V):
            Tv = sum(m["weights"][vi, j] * T[j] for j in range(J))
            out_v[b, vi] = (Tv @ np.append(v_posed[vi], 1.0))[:3] + trans[b]
    return out_v, out_j


def test_lbs_matches_numpy(rng):
    m = _synthetic_model(rng)
    model = SmplModel.create(**m)
    B = 3
    pose = (rng.standard_normal((B, 3 * 6)) * 0.5).astype(np.float32)
    betas = rng.standard_normal((B, 4)).astype(np.float32)
    trans = rng.standard_normal((B, 3)).astype(np.float32)

    verts, joints, v_posed, naked = smpl_forward(
        model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans))
    ref_v, ref_j = _numpy_lbs(m, pose.astype(np.float64),
                              betas.astype(np.float64),
                              trans.astype(np.float64))
    np.testing.assert_allclose(np.asarray(joints), ref_j, atol=2e-5)
    np.testing.assert_allclose(np.asarray(verts), ref_v, atol=2e-5)


def test_zero_pose_is_shaped_template(rng):
    m = _synthetic_model(rng)
    model = SmplModel.create(**m)
    pose = np.zeros((1, 18), dtype=np.float32)
    betas = np.zeros((1, 4), dtype=np.float32)
    trans = np.zeros((1, 3), dtype=np.float32)
    verts, joints, v_posed, naked = smpl_forward(
        model, jnp.asarray(pose), jnp.asarray(betas), jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(verts)[0], m["v_template"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(naked)[0], m["v_template"], atol=1e-5)


def test_translation_additive(rng):
    m = _synthetic_model(rng)
    model = SmplModel.create(**m)
    pose = (rng.standard_normal((2, 18)) * 0.3).astype(np.float32)
    betas = rng.standard_normal((2, 4)).astype(np.float32)
    t0 = np.zeros((2, 3), dtype=np.float32)
    t1 = rng.standard_normal((2, 3)).astype(np.float32)
    v0, j0, _, _ = smpl_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                                jnp.asarray(t0))
    v1, j1, _, _ = smpl_forward(model, jnp.asarray(pose), jnp.asarray(betas),
                                jnp.asarray(t1))
    np.testing.assert_allclose(np.asarray(v1 - v0),
                               np.repeat(t1[:, None], v0.shape[1], 1),
                               atol=1e-5)
