"""ObjProjector correction-network tests (both tracks).

Checks the DCT padding/inpainting plumbing, marker-selection semantics
(`interdiff/model/correction_smpl.py:122-137`) and the skeleton quaternion
I/O conventions (`correction_skeleton.py:73-80,132-134`)."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.models.correction import (
    ObjProjectorCore,
    ObjProjectorSkeleton,
    ObjProjectorSmpl,
    pad_future_with_last_past,
)
from interdiff_tpu.geometry.rotations import (
    quat_xyzw_to_wxyz,
    quaternion_to_matrix,
    matrix_to_rotation_6d,
)


def test_pad_future_with_last_past():
    x = jnp.arange(7, dtype=jnp.float32)[None, :, None]
    out = np.asarray(pad_future_with_last_past(x, past_len=3))[0, :, 0]
    np.testing.assert_array_equal(out, [0, 1, 2, 2, 2, 2, 2])


def _core_inputs(rng, B=2, T=12, P=5):
    obj9 = rng.standard_normal((B, T, 9)).astype(np.float32)
    markers = rng.standard_normal((B, T, P, 3)).astype(np.float32)
    return jnp.asarray(obj9), jnp.asarray(markers)


def test_core_shapes_and_jit(rng):
    B, T, P = 2, 12, 5
    core = ObjProjectorCore(num_nodes=P, n_pre=4, seq_len=T, past_len=4)
    obj9, markers = _core_inputs(rng, B, T, P)
    variables = core.init(jax.random.PRNGKey(0), obj9, markers)
    out = core.apply(variables, obj9, markers)
    assert out.shape == (B, T, P + 1, 9)
    jit_out = jax.jit(lambda a, b: core.apply(variables, a, b))(obj9, markers)
    np.testing.assert_allclose(np.asarray(jit_out), np.asarray(out), atol=1e-5)


def test_smpl_selection_initialize_and_contact(rng):
    B, T, P = 3, 10, 67
    proj = ObjProjectorSmpl(num_markers=P, n_pre=4, past_len=4, future_len=6)
    obj9 = jnp.asarray(rng.standard_normal((B, T, 9)).astype(np.float32))
    markers = jnp.asarray(rng.standard_normal((B, T, P, 3)).astype(np.float32))
    contact = np.zeros((B, P), dtype=np.float32)
    contact[1, 20] = 3.0  # sample 1 contacts marker 20 (not a hand marker)
    contact = jnp.asarray(contact)

    variables = proj.init(jax.random.PRNGKey(0), obj9, markers, contact)
    results = proj.apply(variables, obj9, markers, contact,
                         method=lambda m, *a, **k: m.core(*a[:2]))
    out_init = proj.apply(variables, obj9, markers, contact, initialize=True)
    np.testing.assert_allclose(np.asarray(out_init),
                               np.asarray(results.mean(axis=2)), atol=1e-6)

    out = proj.apply(variables, obj9, markers, contact)
    # no-contact samples (0, 2) take the absolute node
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(results[0, :, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]),
                               np.asarray(results[2, :, 0]), atol=1e-6)
    # contacting sample takes argmax marker: counts 3.0 beats hand bias 0.5
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(results[1, :, 1 + 20]), atol=1e-6)


def test_smpl_hand_bias_breaks_zero_ties(rng):
    """A single contact on a non-hand marker with count 0.4 loses to the
    0.5 hand bias -> a hand marker is selected (matches reference +0.5)."""
    B, T, P = 1, 10, 67
    proj = ObjProjectorSmpl(num_markers=P, n_pre=4, past_len=4, future_len=6)
    obj9 = jnp.asarray(rng.standard_normal((B, T, 9)).astype(np.float32))
    markers = jnp.asarray(rng.standard_normal((B, T, P, 3)).astype(np.float32))
    contact = np.zeros((B, P), dtype=np.float32)
    contact[0, 5] = 0.4
    variables = proj.init(jax.random.PRNGKey(0), obj9, markers,
                          jnp.asarray(contact))
    results = proj.apply(variables, obj9, markers, jnp.asarray(contact),
                         method=lambda m, *a, **k: m.core(*a[:2]))
    out = proj.apply(variables, obj9, markers, jnp.asarray(contact))
    # argmax of contact + hand bias: first hand marker id 10 (weight 0.5)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(results[0, :, 1 + 10]), atol=1e-6)


def test_skeleton_projector_quat_io(rng):
    B, T, J = 2, 20, 21
    proj = ObjProjectorSkeleton(num_joints=J, past_len=10, future_len=10)
    quat = rng.standard_normal((B, T, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    trans = rng.standard_normal((B, T, 3)).astype(np.float32)
    joints = rng.standard_normal((B, T, J, 3)).astype(np.float32)

    variables = proj.init(jax.random.PRNGKey(0), jnp.asarray(quat),
                          jnp.asarray(trans), jnp.asarray(joints))
    quat_p, trans_p = proj.apply(variables, jnp.asarray(quat),
                                 jnp.asarray(trans), jnp.asarray(joints))
    assert quat_p.shape == (B, T, 4) and trans_p.shape == (B, T, 3)
    # output quaternions are unit (matrix_to_quaternion of a rotation)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(quat_p), axis=-1),
                               1.0, atol=1e-4)
