"""The trained checkpoints committed under artifacts/ must stay loadable:
restore the orbax flat save into freshly-initialised model params and run
one denoiser forward."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEL = os.path.join(ROOT, "artifacts", "skeleton_params")


@pytest.mark.skipif(not os.path.isdir(SKEL),
                    reason="artifacts/skeleton_params not present")
def test_skeleton_artifact_restores_and_runs():
    import orbax.checkpoint as ocp

    from interdiff_tpu.config import SkeletonTrackConfig
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton

    track = SkeletonTrackConfig()
    model = track.build_model()
    B, T = 2, track.past_len + track.future_len
    rng = np.random.default_rng(0)
    body = jnp.asarray(rng.standard_normal((B, T, 21, 3)), jnp.float32)
    obj = jnp.asarray(rng.standard_normal((B, T, 12, 3)), jnp.float32)
    quat = rng.standard_normal((B, T, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pose = jnp.asarray(np.concatenate(
        [rng.standard_normal((B, T, 3)), quat], -1), jnp.float32)
    zp = jnp.asarray(rng.standard_normal((B, 12, 3)), jnp.float32)

    template = model.init(jax.random.PRNGKey(0), body, obj, pose, zp,
                          jnp.zeros((B,), jnp.int32),
                          method=MDMSkeleton.init_forward)
    params = ocp.StandardCheckpointer().restore(SKEL, target=template)

    # restored params must differ from the fresh init and produce finite x0
    leaves_t = jax.tree.leaves(template)
    leaves_r = jax.tree.leaves(params)
    assert any(not np.allclose(a, b) for a, b in zip(leaves_t, leaves_r))

    memory, gt_state = model.apply(params, body, obj, pose, zp,
                                   method=MDMSkeleton.encode)
    x0 = model.apply(params, gt_state, jnp.zeros((B,), jnp.int32), zp,
                     cond=memory)
    assert x0.shape == gt_state.shape
    assert np.isfinite(np.asarray(x0)).all()


SMPL = os.path.join(ROOT, "artifacts", "smpl_params")


@pytest.mark.skipif(not os.path.isdir(SMPL),
                    reason="artifacts/smpl_params not present")
def test_smpl_artifact_restores_and_runs():
    import orbax.checkpoint as ocp

    from interdiff_tpu.config import SmplTrackConfig
    from interdiff_tpu.models.mdm_smpl import MDMSmpl

    track = SmplTrackConfig()
    model = track.build_model()
    B, T, P = 2, track.past_len + track.future_len, 64
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((B, P, 6)), jnp.float32)

    template = model.init(jax.random.PRNGKey(0), gt, pts,
                          jnp.zeros((B,), jnp.int32),
                          method=MDMSmpl.init_forward)
    params = ocp.StandardCheckpointer().restore(SMPL, target=template)
    assert any(not np.allclose(a, b)
               for a, b in zip(jax.tree.leaves(template),
                               jax.tree.leaves(params)))

    memory = model.apply(params, gt, pts, method=MDMSmpl.encode)
    x0 = model.apply(params, gt, jnp.zeros((B,), jnp.int32), memory)
    assert x0.shape == (B, T, 144)
    assert np.isfinite(np.asarray(x0)).all()


SMPL_REAL = os.path.join(ROOT, "artifacts", "smpl_real_params")


@pytest.mark.skipif(not os.path.isdir(SMPL_REAL),
                    reason="artifacts/smpl_real_params not present")
def test_smpl_real_data_artifact_restores_and_runs():
    """The checkpoint trained on the REAL shipped BEHAVE sequence."""
    import orbax.checkpoint as ocp

    from interdiff_tpu.config import SmplTrackConfig
    from interdiff_tpu.models.mdm_smpl import MDMSmpl

    track = SmplTrackConfig()
    model = track.build_model()
    B, T, P = 2, track.past_len + track.future_len, 64
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((B, P, 6)), jnp.float32)

    template = model.init(jax.random.PRNGKey(0), gt, pts,
                          jnp.zeros((B,), jnp.int32),
                          method=MDMSmpl.init_forward)
    params = ocp.StandardCheckpointer().restore(SMPL_REAL, target=template)
    assert any(not np.allclose(a, b)
               for a, b in zip(jax.tree.leaves(template),
                               jax.tree.leaves(params)))

    memory = model.apply(params, gt, pts, method=MDMSmpl.encode)
    x0 = model.apply(params, gt, jnp.zeros((B,), jnp.int32), memory)
    assert x0.shape == (B, T, 144)
    assert np.isfinite(np.asarray(x0)).all()
