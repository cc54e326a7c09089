"""SMPL-track MDM denoiser skeleton tests: shapes, jit, conditioning,
state-layout builder (`interdiff/model/diffusion_smpl.py:195-246`)."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw


def _tiny_model():
    # tiny dims for test speed; topology identical to the real config
    return MDMSmpl(smpl_dim=132, embed_dim=32, num_heads=4, ff_size=64,
                   num_layers=4, past_len=3, future_len=4,
                   use_pointnet2=False)


def test_gt_layout(rng):
    B, T = 2, 7
    body_pose = rng.standard_normal((B, T, 66)).astype(np.float32) * 0.3
    body_trans = rng.standard_normal((B, T, 3)).astype(np.float32)
    obj_aa = rng.standard_normal((B, T, 3)).astype(np.float32) * 0.3
    obj_trans = rng.standard_normal((B, T, 3)).astype(np.float32)
    gt = smpl_gt_from_raw(jnp.asarray(body_pose), jnp.asarray(body_trans),
                          jnp.asarray(obj_aa), jnp.asarray(obj_trans))
    assert gt.shape == (B, T, 144)
    np.testing.assert_allclose(np.asarray(gt[..., 132:135]), body_trans,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt[..., 141:144]), obj_trans,
                               atol=1e-6)
    # zero axis-angle -> identity rotation -> rot6d = [1,0,0,0,1,0]
    gt0 = smpl_gt_from_raw(jnp.zeros((1, 1, 66)), jnp.zeros((1, 1, 3)),
                           jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(gt0[0, 0, :6]),
                               [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_denoiser_forward_and_jit(rng):
    model = _tiny_model()
    B, T = 2, 7
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    obj_points = jnp.asarray(rng.standard_normal((B, 32, 6)).astype(np.float32))
    t = jnp.asarray([3, 500])

    variables = model.init(jax.random.PRNGKey(0), gt, obj_points, t,
                           method=MDMSmpl.init_forward)
    memory = model.apply(variables, gt, obj_points, method=MDMSmpl.encode)
    assert memory.shape == (B, 3, 32)

    out = model.apply(variables, gt, t, memory)
    assert out.shape == (B, T, 144)
    assert np.isfinite(np.asarray(out)).all()

    fn = jax.jit(lambda x, ts, mem: model.apply(variables, x, ts, mem))
    np.testing.assert_allclose(np.asarray(fn(gt, t, memory)),
                               np.asarray(out), atol=1e-5)


def test_force_mask_equals_zero_cond(rng):
    model = _tiny_model()
    B, T = 2, 7
    x = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    t = jnp.asarray([10, 20])
    mem = jnp.asarray(rng.standard_normal((B, 3, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, t, None)
    forced = model.apply(variables, x, t, mem, force_mask=True)
    zeroed = model.apply(variables, x, t, jnp.zeros_like(mem))
    np.testing.assert_allclose(np.asarray(forced), np.asarray(zeroed),
                               atol=1e-6)
