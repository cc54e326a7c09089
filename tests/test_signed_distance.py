"""Signed-distance op vs numpy brute force (replaces chamfer CUDA,
`interdiff/tools.py:11-76`)."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.geometry.rotations import rotation_6d_to_matrix
from interdiff_tpu.ops.signed_distance import nearest_neighbor, point2point_signed


def _np_signed(x, y, xn, yn):
    B, P1, _ = x.shape
    P2 = y.shape[1]
    d = np.linalg.norm(x[:, :, None] - y[:, None], axis=-1)  # [B,P1,P2]
    xidx = d.argmin(axis=2)  # nearest y per x
    yidx = d.argmin(axis=1)  # nearest x per y  [B,P2]
    x_near = np.take_along_axis(y, xidx[..., None], axis=1)
    y_near = np.take_along_axis(x, yidx[..., None], axis=1)
    x2y = x - x_near
    y2x = y - y_near
    y_nn = np.take_along_axis(xn, yidx[..., None], axis=1)
    x_nn = np.take_along_axis(yn, xidx[..., None], axis=1)
    y2x_s = np.linalg.norm(y2x, axis=-1) * np.sign((y_nn * y2x).sum(-1))
    x2y_s = np.linalg.norm(x2y, axis=-1) * np.sign((x_nn * x2y).sum(-1))
    return y2x_s, x2y_s, yidx, xidx


def test_nearest_neighbor_chunked_equals_dense(rng):
    a = rng.standard_normal((2, 33, 3)).astype(np.float32)
    b = rng.standard_normal((2, 64, 3)).astype(np.float32)
    d0, i0 = nearest_neighbor(jnp.asarray(a), jnp.asarray(b), chunk=None)
    d1, i1 = nearest_neighbor(jnp.asarray(a), jnp.asarray(b), chunk=16)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_point2point_signed_matches_numpy(rng):
    B, P1, P2 = 2, 40, 24
    x = rng.standard_normal((B, P1, 3)).astype(np.float32)
    y = rng.standard_normal((B, P2, 3)).astype(np.float32)
    xn = rng.standard_normal((B, P1, 3)).astype(np.float32)
    yn = rng.standard_normal((B, P2, 3)).astype(np.float32)
    xn /= np.linalg.norm(xn, axis=-1, keepdims=True)
    yn /= np.linalg.norm(yn, axis=-1, keepdims=True)

    got = point2point_signed(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xn),
                             jnp.asarray(yn), chunk=8)
    want = _np_signed(x, y, xn, yn)
    np.testing.assert_allclose(np.asarray(got[0]), want[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), want[1], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got[2]), want[2])
    np.testing.assert_array_equal(np.asarray(got[3]), want[3])


def test_sign_semantics():
    # x = unit square plane of verts with +z normals; y point above -> +,
    # y point below -> -
    xs = np.stack(np.meshgrid(np.linspace(-1, 1, 5), np.linspace(-1, 1, 5)),
                  -1).reshape(-1, 2)
    x = np.concatenate([xs, np.zeros((25, 1))], -1)[None].astype(np.float32)
    xn = np.tile(np.array([0, 0, 1.0], dtype=np.float32), (1, 25, 1))
    y = np.array([[[0.1, 0.1, 0.5], [0.1, 0.1, -0.5]]], dtype=np.float32)
    y2x_s, _, _, _ = point2point_signed(jnp.asarray(x), jnp.asarray(y),
                                        jnp.asarray(xn), None, chunk=None)
    assert np.asarray(y2x_s)[0, 0] > 0
    assert np.asarray(y2x_s)[0, 1] < 0


def test_chunked_nn_non_divisible(rng):
    """chunk that doesn't divide P2 (e.g. 6890 verts, chunk 512) pads
    internally and matches the dense path."""
    a = rng.standard_normal((2, 21, 3)).astype(np.float32)
    b = rng.standard_normal((2, 55, 3)).astype(np.float32)  # 55 % 16 != 0
    d0, i0 = nearest_neighbor(jnp.asarray(a), jnp.asarray(b), chunk=None)
    d1, i1 = nearest_neighbor(jnp.asarray(a), jnp.asarray(b), chunk=16)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_safe_sqrt_zero_gradient_at_clamp():
    from interdiff_tpu.ops.signed_distance import safe_sqrt

    x = jnp.asarray([0.0, 1e-12, 4.0])
    val, grads = jax.vmap(jax.value_and_grad(safe_sqrt))(x)
    np.testing.assert_allclose(np.asarray(val), np.sqrt(np.asarray(x)),
                               rtol=1e-6)
    assert np.isfinite(np.asarray(grads)).all()
    assert float(grads[0]) == 0.0  # subgradient 0 on the clamp boundary


def test_contact_penetration_grads_finite_at_touching_geometry(rng):
    """A query point coinciding exactly with a surface vertex makes the
    clamped squared NN distance 0.0; the losses must still produce finite
    gradients (raw grad(sqrt)(0) = inf would NaN the whole pytree)."""
    from interdiff_tpu.ops.signed_distance import safe_sqrt, signed_nearest

    surf = jnp.asarray(rng.standard_normal((1, 12, 3)).astype(np.float32))
    normals = jnp.asarray(rng.standard_normal((1, 12, 3)).astype(np.float32))
    # first two queries sit exactly on surface vertices (sq -> clamped 0)
    queries = jnp.concatenate(
        [surf[:, :2], jnp.asarray(
            rng.standard_normal((1, 4, 3)).astype(np.float32))], axis=1)

    def loss(q):
        sq, sdot = signed_nearest(q, surf, normals, chunk=None)
        signed = safe_sqrt(sq) * jnp.sign(sdot)
        w = jnp.where(signed < 0, 20.0, 0.0)
        return jnp.mean(jnp.abs(signed) * w) + jnp.mean(safe_sqrt(sq))

    val, g = jax.value_and_grad(loss)(queries)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()

    # and through the real training term with contact-labelled verts ON the
    # object surface (h2o == 0 at labelled contacts)
    from interdiff_tpu.train.losses_correction import (
        contact_penetration_terms,
    )

    B, T, P, V = 1, 2, 8, 6
    obj_pred = jnp.asarray(
        rng.standard_normal((B, T, 9)).astype(np.float32))
    obj_points = jnp.asarray(
        rng.standard_normal((B, P, 3)).astype(np.float32))
    rot = rotation_6d_to_matrix(obj_pred[..., :6])
    pts = (jnp.einsum("btij,bpj->btpi", rot, obj_points)
           + obj_pred[..., None, 6:9])
    hv_xyz = pts[:, :, :V, :].reshape(B, T, V, 3)  # verts ON the object
    hv = jnp.concatenate(
        [hv_xyz,
         jnp.asarray(rng.standard_normal((B, T, V, 3)).astype(np.float32)),
         jnp.ones((B, T, V, 1), jnp.float32)], axis=-1)

    def train_loss(op):
        c, p = contact_penetration_terms(
            op, obj_points=obj_points, human_verts=hv, nn_chunk=None)
        return c + p

    tval, tg = jax.value_and_grad(train_loss)(obj_pred)
    assert np.isfinite(float(tval))
    assert np.isfinite(np.asarray(tg)).all()
