"""PLMS / DDIM-reverse / nn-helper / mesh-loss / viz tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion


def _perfect_model(x0):
    """A 'model' that always predicts the true x0."""
    return lambda x, t: jnp.broadcast_to(x0, x.shape)


def test_plms_loop_recovers_x0(rng):
    diffusion = GaussianDiffusion.create_named(steps=16)
    x0 = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    out = diffusion.plms_sample_loop(_perfect_model(x0), jax.random.PRNGKey(0),
                                     (2, 5, 4), order=2)
    # with an oracle x0-predictor the final sample equals x0 (t=0 returns
    # pred_xstart)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_plms_orders_run(rng):
    diffusion = GaussianDiffusion.create_named(steps=8)
    x0 = jnp.zeros((1, 3, 2))
    for order in (1, 2, 3, 4):
        out = diffusion.plms_sample_loop(
            _perfect_model(x0), jax.random.PRNGKey(order), (1, 3, 2),
            order=order)
        assert np.isfinite(np.asarray(out)).all()


def test_ddim_reverse_roundtrip(rng):
    diffusion = GaussianDiffusion.create_named(steps=8)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 3)).astype(np.float32))
    model = _perfect_model(x0)
    t = jnp.zeros((1,), jnp.int32)
    fwd = diffusion.ddim_reverse_sample(model, x0, t)
    assert np.isfinite(np.asarray(fwd["sample"])).all()


def test_timestep_embedding_and_ema(rng):
    from interdiff_tpu.diffusion.nn import (
        timestep_embedding,
        update_ema,
        zero_params,
    )

    emb = timestep_embedding(jnp.asarray([0, 10, 999]), 16)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(emb[0, :8]), 1.0, atol=1e-6)  # cos 0
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 0.0, atol=1e-6)  # sin 0

    params = {"a": jnp.ones((3,)), "b": {"c": jnp.full((2,), 2.0)}}
    ema = zero_params(params)
    ema = update_ema(ema, params, rate=0.5)
    np.testing.assert_allclose(np.asarray(ema["a"]), 0.5)
    np.testing.assert_allclose(np.asarray(ema["b"]["c"]), 1.0)


def test_mesh_losses(rng):
    from interdiff_tpu.geometry.mesh_losses import (
        edge_length_loss,
        laplacian_loss,
        normal_consistency_loss,
        normal_vector_loss,
        uniform_laplacian_smoothing,
    )

    from interdiff_tpu.geometry.mesh_losses import cotcurv_laplacian_norm

    # flat 3x3 grid; vertex 4 is interior
    xs, ys = np.meshgrid(np.arange(3.0), np.arange(3.0))
    verts = np.stack([xs.ravel(), ys.ravel(),
                      np.zeros(9)], axis=1).astype(np.float32)[None]
    faces = []
    for r in range(2):
        for c in range(2):
            a = r * 3 + c
            faces += [[a, a + 1, a + 3], [a + 1, a + 4, a + 3]]
    faces = np.asarray(faces, dtype=np.int32)
    v = jnp.asarray(verts)

    # flat mesh: interior-vertex cotcurv curvature ~ 0 (boundary verts have
    # boundary error, like pytorch3d); normal consistency 0
    curv = cotcurv_laplacian_norm(v, faces)
    assert float(curv[0, 4]) < 1e-5
    assert float(normal_consistency_loss(v, faces)) < 1e-6
    assert np.isfinite(float(laplacian_loss(v, faces)))

    # identical pred/gt -> edge length loss 0
    assert float(edge_length_loss(v, v, faces)) < 1e-6

    u = uniform_laplacian_smoothing(v, faces)
    assert u.shape == (1, 9)

    # normal_vector_loss: edges of the gt mesh are orthogonal to gt normals
    assert float(normal_vector_loss(v, v, faces)) < 1e-6

    # perturbation increases losses
    v2 = v.at[0, 0, 2].add(0.5)
    assert float(edge_length_loss(v2, v, faces)) > 1e-3
    assert float(normal_consistency_loss(v2, faces)) > 1e-3


def test_skeleton_viz_writes_gif(tmp_path, rng):
    from interdiff_tpu.viz.skeleton_viz import visualize_skeleton

    T = 4
    skeleton = rng.standard_normal((T, 21, 3)).astype(np.float32)
    obj = rng.standard_normal((T, 12, 3)).astype(np.float32)
    path = str(tmp_path / "clip.gif")
    out = visualize_skeleton(skeleton, obj, path, obj_name="chair",
                             past_len=2, fps=4)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_mesh_viz_fallback_writes_gif(tmp_path, rng):
    from interdiff_tpu.viz.mesh_viz import visualize_body_obj

    T, V, P = 3, 60, 20
    verts = rng.standard_normal((T, V, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    obj_verts = rng.standard_normal((T, P, 3)).astype(np.float32)
    path = str(tmp_path / "mesh.gif")
    out = visualize_body_obj(verts, faces, obj_verts, faces, past_len=1,
                             save_path=path, h=64, w=64)
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    assert out.shape == (T, 3, 64, 4 * 64) and out.dtype == np.uint8


def test_masked_l2(rng):
    from interdiff_tpu.diffusion.gaussian import GaussianDiffusion

    B, J, D, T = 2, 3, 4, 5
    a = jnp.asarray(rng.standard_normal((B, J, D, T)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, J, D, T)).astype(np.float32))
    mask = jnp.zeros((B, 1, 1, T)).at[:, :, :, :3].set(1.0)
    out = GaussianDiffusion.masked_l2(a, b, mask)
    want = (np.sum((np.asarray(a - b)[:, :, :, :3]) ** 2, axis=(1, 2, 3))
            / (3 * J * D))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
