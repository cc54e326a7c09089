"""Structure + behaviour tests for the skeleton MDM denoiser."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.models.mdm_skeleton import (
    MDMSkeleton,
    rigid_keypoints_from_pose,
)


def _small_model():
    return MDMSkeleton(embed_dim=32, num_heads=4, ff_size=32, num_layers=4,
                       past_len=3)


def _data(rng, B=2, T=6, J=21, P=12):
    body = rng.standard_normal((B, T, J, 3)).astype(np.float32)
    obj = rng.standard_normal((B, T, P, 3)).astype(np.float32)
    quat = rng.standard_normal((B, T, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pose = np.concatenate(
        [rng.standard_normal((B, T, 3)).astype(np.float32), quat], axis=-1)
    zero_pose = rng.standard_normal((B, P, 3)).astype(np.float32)
    return map(jnp.asarray, (body, obj, pose, zero_pose))


def test_encode_and_denoise_shapes(rng):
    model = _small_model()
    body, obj, pose, zero_pose = _data(rng)
    B, T = body.shape[:2]

    variables = model.init(jax.random.PRNGKey(0), method=model.encode,
                           body_gt=body, obj_gt=obj, pose_gt=pose,
                           zero_pose_obj=zero_pose)
    memory, gt = model.apply(variables, body, obj, pose, zero_pose,
                             method=model.encode)
    assert memory.shape == (B, model.past_len, model.embed_dim)
    assert gt.shape == (B, T, model.state_dim)

    t = jnp.array([3, 977])
    variables2 = model.init(jax.random.PRNGKey(1), gt, t, zero_pose, memory)
    out = model.apply(variables2, gt, t, zero_pose, memory)
    assert out.shape == gt.shape
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_rigid_consistency(rng):
    """Predicted keypoint block must equal the rigid reconstruction of the
    predicted pose block (`diffusion_skeleton.py:244-247`)."""
    model = _small_model()
    body, obj, pose, zero_pose = _data(rng)
    _, gt = None, jnp.concatenate(
        [body.reshape(2, 6, 63), obj.reshape(2, 6, 36), pose], axis=-1)
    t = jnp.array([0, 999])
    variables = model.init(jax.random.PRNGKey(2), gt, t, zero_pose, None)
    out = model.apply(variables, gt, t, zero_pose, None)
    pose_pred = out[..., -7:]
    kpts = out[..., 63:99].reshape(2, 6, 12, 3)
    kpts_rigid = rigid_keypoints_from_pose(pose_pred, zero_pose)
    np.testing.assert_allclose(np.asarray(kpts), np.asarray(kpts_rigid),
                               atol=1e-5)


def test_rigid_keypoints_identity_pose():
    zero_pose = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((1, 12, 3)).astype(np.float32))
    pose = jnp.concatenate([jnp.zeros((1, 4, 3)),
                            jnp.tile(jnp.asarray([[0., 0., 0., 1.]]),
                                     (1, 4, 1)).reshape(1, 4, 4)], axis=-1)
    out = rigid_keypoints_from_pose(pose, zero_pose)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile(np.asarray(zero_pose)[:, None],
                                       (1, 4, 1, 1)), atol=1e-6)


def test_param_count_matches_reference_formula():
    """Parameter census vs an arithmetic count of the torch reference
    (`diffusion_skeleton.py:14-182`) — structural parity check."""
    E, H, FF, L, J, P, NQ = 256, 4, 256, 8, 21, 12, 10
    model = MDMSkeleton(embed_dim=E, num_heads=H, ff_size=FF, num_layers=L)
    rng = np.random.default_rng(0)
    body = jnp.asarray(rng.standard_normal((1, 4, J, 3)).astype(np.float32))
    obj = jnp.asarray(rng.standard_normal((1, 4, P, 3)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((1, 4, 7)).astype(np.float32))
    zero_pose = jnp.asarray(rng.standard_normal((1, P, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), body, obj, pose, zero_pose,
                           jnp.array([1]), method=MDMSkeleton.init_forward)
    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(variables["params"]))

    dense = lambda i, o: i * o + o
    mha = dense(E, 3 * E) + dense(E, E)
    ln = 2 * E
    ff = dense(E, FF) + dense(FF, E)
    enc_vanilla = mha + ff + 2 * ln
    enc_qan = NQ * E + NQ + ff + 2 * ln
    dec_vanilla = 2 * mha + ff + 3 * ln
    dec_qan = NQ * E + NQ + mha + ff + 3 * ln

    n_ref = (dense(J * 3, E) + 2 * dense(P * 3, E)          # embeddings
             + 2 * dense(E, E)                                # timestep MLP
             + 2 * enc_vanilla + (L - 2) * enc_qan            # encoder
             + 2 * dec_vanilla + (L - 2) * dec_qan            # decoder
             + dense(E, J * 3) + dense(E, 7))                 # heads
    assert n_ours == n_ref


def test_mask_cond_force():
    model = _small_model()
    rng = np.random.default_rng(1)
    body, obj, pose, zero_pose = _data(rng)
    gt = jnp.concatenate(
        [body.reshape(2, 6, 63), obj.reshape(2, 6, 36), pose], axis=-1)
    t = jnp.array([5, 5])
    variables = model.init(jax.random.PRNGKey(3), gt, t, zero_pose, None)
    memory = jnp.asarray(rng.standard_normal((2, 3, 32)).astype(np.float32))
    out_masked = model.apply(variables, gt, t, zero_pose, memory,
                             force_mask=True)
    out_zero = model.apply(variables, gt, t, zero_pose,
                           jnp.zeros_like(memory))
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_zero),
                               atol=1e-6)


def test_denoise_jits(rng):
    model = _small_model()
    body, obj, pose, zero_pose = _data(rng)
    gt = jnp.concatenate(
        [body.reshape(2, 6, 63), obj.reshape(2, 6, 36), pose], axis=-1)
    t = jnp.array([1, 2])
    variables = model.init(jax.random.PRNGKey(4), gt, t, zero_pose, None)
    f = jax.jit(lambda v, x, tt: model.apply(v, x, tt, zero_pose, None))
    out = f(variables, gt, t)
    assert out.shape == gt.shape
