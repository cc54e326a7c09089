"""Eval metric tests (`interdiff/eval_smpl_short.py:24-81`,
`train_diffusion_skeleton.py:65-87`)."""

import numpy as np
import jax.numpy as jnp

from interdiff_tpu.eval.metrics import (
    quat_min_error,
    skeleton_metrics,
    smooth_seam,
    smpl_metrics,
)


def test_quat_min_error_sign_invariance(rng):
    q = rng.standard_normal((4, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    e = quat_min_error(jnp.asarray(q), jnp.asarray(-q), ord=1)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-6)
    e2 = quat_min_error(jnp.asarray(q), jnp.asarray(q), ord=2)
    np.testing.assert_allclose(np.asarray(e2), 0.0, atol=1e-6)


def test_skeleton_metrics_perfect_prediction(rng):
    B, T, J, P = 2, 20, 21, 12
    body = jnp.asarray(rng.standard_normal((B, T, J, 3)).astype(np.float32))
    obj = jnp.asarray(rng.standard_normal((B, T, P, 3)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((B, T, 7)).astype(np.float32))
    m = skeleton_metrics(body, body, obj, obj, pose, pose)
    for v in m.values():
        np.testing.assert_allclose(float(v), 0.0, atol=1e-6)


def test_skeleton_metrics_known_offset(rng):
    B, T, J, P = 1, 20, 21, 12
    body = jnp.zeros((B, T, J, 3))
    obj = jnp.zeros((B, T, P, 3))
    pose = jnp.zeros((B, T, 7))
    body_p = body + jnp.asarray([3.0, 0, 0])
    m = skeleton_metrics(body_p, body, obj, obj, pose, pose)
    np.testing.assert_allclose(float(m["mpjpe_h"]), 3.0, atol=1e-6)


def test_smooth_seam_c1():
    """After the fix, frame[-F] == 2*frame[-F-1] - frame[-F-2]
    (linear extrapolation -> C1 at the seam), ref `eval_smpl_short.py:217`."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))
    F = 6
    out = np.asarray(smooth_seam(x, F))
    x_np = np.asarray(x)
    np.testing.assert_allclose(out[:, -F],
                               2 * x_np[:, -F - 1] - x_np[:, -F - 2],
                               atol=1e-5)
    # past frames untouched
    np.testing.assert_allclose(out[:, : -F], x_np[:, : -F], atol=1e-7)


def test_smpl_metrics_shapes(rng):
    B, T, J, V, P = 2, 5, 52, 64, 16
    obj = rng.standard_normal((B, T, 6)).astype(np.float32)
    jtr = rng.standard_normal((B, T, J, 3)).astype(np.float32)
    body = rng.standard_normal((B, T, 159)).astype(np.float32)
    verts = rng.standard_normal((B, T, V, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]], dtype=np.int32)
    pts = rng.standard_normal((B, P, 3)).astype(np.float32)
    m = smpl_metrics(jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
                     jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
                     jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts),
                     nn_chunk=None)
    for k in ("global_mpjpe", "local_mpjpe", "body_translation",
              "obj_translation", "obj_rot_error", "penetrate"):
        assert m[k].shape == (B,)
    # identical pred/gt -> all zero except penetrate (geometry-dependent)
    for k in ("global_mpjpe", "local_mpjpe", "body_translation",
              "obj_translation", "obj_rot_error"):
        np.testing.assert_allclose(np.asarray(m[k]), 0.0, atol=1e-5)


def test_smpl_metrics_penetrate_matches_bidirectional(rng):
    """The fused signed-NN penetrate must equal the original bidirectional
    `point2point_signed` formulation (`eval_smpl_short.py:37-40`) it
    replaced: fraction of object points whose signed distance to the body
    is negative."""
    from interdiff_tpu.geometry.normals import vertex_normals
    from interdiff_tpu.geometry.rotations import axis_angle_to_matrix
    from interdiff_tpu.ops.signed_distance import point2point_signed

    B, T, J, V, P = 2, 4, 52, 48, 24
    obj = 0.1 * rng.standard_normal((B, T, 6)).astype(np.float32)
    jtr = rng.standard_normal((B, T, J, 3)).astype(np.float32)
    body = rng.standard_normal((B, T, 159)).astype(np.float32)
    verts = rng.standard_normal((B, T, V, 3)).astype(np.float32)
    # a random closed-ish fan so normals are nontrivial
    faces = np.stack([np.zeros(V - 2), np.arange(1, V - 1),
                      np.arange(2, V)], axis=1).astype(np.int32)
    pts = rng.standard_normal((B, P, 3)).astype(np.float32)

    # nn_prune_delta=None: this test's geometry is RANDOM/open (arbitrary
    # normals), which violates the pruning contract's closed-body
    # precondition - the pruned default is validated separately on closed
    # geometry (tests/test_pallas_nn.py::TestSignedNearestPruned)
    m = smpl_metrics(jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
                     jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
                     jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts),
                     nn_chunk=None, nn_prune_delta=None)
    # with a delta beyond every true distance the pruned path must agree
    # even here (the forcing never fires)
    m_big = smpl_metrics(
        jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
        jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts),
        nn_chunk=None, nn_prune_delta=100.0)
    np.testing.assert_allclose(np.asarray(m_big["penetrate"]),
                               np.asarray(m["penetrate"]), atol=1e-7)

    rot = axis_angle_to_matrix(jnp.asarray(obj[..., :3]))
    opp = (jnp.einsum("btij,bpj->btpi", rot, jnp.asarray(pts))
           + jnp.asarray(obj)[..., None, 3:])
    v_flat = jnp.asarray(verts).reshape(B * T, V, 3)
    normals = vertex_normals(v_flat, faces)
    o2h_signed, _, _, _ = point2point_signed(
        v_flat, opp.reshape(B * T, P, 3), normals, None, chunk=None)
    want = np.mean(
        (np.asarray(o2h_signed) < 0).reshape(B, T, P), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(m["penetrate"]), want, atol=1e-6)


def test_smpl_metrics_default_is_reference_faithful_full_sweep(rng):
    """The penetrate metric's DEFAULT must be the unpruned full sweep —
    metric parity with the reference's vertex-pseudonormal semantics.
    Round-5 measured the pruned sweep changing the protocol number 6x
    (0.18085 full vs 0.02953 pruned: winding-verified far-field artifact
    filtering — scripts/diag_penetrate_signs.py, PARITY.md scope note),
    so pruning stays an explicit opt-in for metrics.  Geometry: queries
    far beyond delta from a small vert cloud with inward-rigged normals,
    so the full sweep reports them negative while the pruned sweep would
    force +1 — the default must match the full sweep."""
    B, T, J, V, P = 1, 2, 52, 48, 16
    obj = np.zeros((B, T, 6), np.float32)
    jtr = rng.standard_normal((B, T, J, 3)).astype(np.float32)
    body = rng.standard_normal((B, T, 159)).astype(np.float32)
    # tiny vert cloud near origin; faces rigged so vertex normals point
    # INWARD w.r.t. faraway queries -> far-field negative signs
    verts = (0.05 * rng.standard_normal((B, T, V, 3))).astype(np.float32)
    faces = np.stack([np.zeros(V - 2), np.arange(2, V),
                      np.arange(1, V - 1)], axis=1).astype(np.int32)
    pts = (rng.standard_normal((B, P, 3)) + 5.0).astype(np.float32)

    kw = dict(nn_chunk=None)
    args = (jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
            jnp.asarray(obj), jnp.asarray(jtr), jnp.asarray(body),
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts))
    m_default = smpl_metrics(*args, **kw)
    m_full = smpl_metrics(*args, nn_prune_delta=None, **kw)
    m_pruned = smpl_metrics(*args, nn_prune_delta=0.25, **kw)
    np.testing.assert_array_equal(np.asarray(m_default["penetrate"]),
                                  np.asarray(m_full["penetrate"]))
    assert np.all(np.asarray(m_pruned["penetrate"]) == 0.0)
    # the discriminating geometry really discriminates: at least some
    # far query tests negative under the full sweep
    assert (np.asarray(m_full["penetrate"]) > 0).any()


def test_state_to_axis_angle_roundtrip(rng):
    """smpl_gt_from_raw -> state_to_axis_angle recovers the axis-angle
    rotations (up to angle wrapping) and the translations exactly."""
    import jax.numpy as jnp

    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig,
        state_to_axis_angle,
    )
    from interdiff_tpu.geometry.rotations import axis_angle_to_matrix
    from interdiff_tpu.models.mdm_smpl import smpl_gt_from_raw

    B, T = 2, 5
    body_aa = rng.standard_normal((B, T, 66)).astype(np.float32) * 0.4
    body_tr = rng.standard_normal((B, T, 3)).astype(np.float32)
    obj_aa = rng.standard_normal((B, T, 3)).astype(np.float32) * 0.4
    obj_tr = rng.standard_normal((B, T, 3)).astype(np.float32)

    x = smpl_gt_from_raw(jnp.asarray(body_aa), jnp.asarray(body_tr),
                         jnp.asarray(obj_aa), jnp.asarray(obj_tr))
    body_out, obj_out = state_to_axis_angle(SmplEvalConfig(), x)
    assert body_out.shape == (B, T, 69) and obj_out.shape == (B, T, 6)
    # rotations compare in matrix space (axis-angle is multivalued)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(
            jnp.asarray(body_out[..., :66]).reshape(B, T, 22, 3))),
        np.asarray(axis_angle_to_matrix(
            jnp.asarray(body_aa).reshape(B, T, 22, 3))), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(obj_out[..., :3])),
        np.asarray(axis_angle_to_matrix(jnp.asarray(obj_aa))), atol=2e-5)
    np.testing.assert_allclose(np.asarray(body_out[..., 66:]), body_tr,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(obj_out[..., 3:]), obj_tr,
                               atol=1e-6)
