"""Tests for the reference's auxiliary public symbols that sit off the main
InterDiff path but are part of its layer surface (SURVEY §2.1 rows 10/15):
NeRF positional embedder, NormalDistDecoder, VertexJointSelector equivalent,
and the get_body_model factory."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.data.constants import (
    SMPLH_JOINT_NAMES,
    SMPLH_VERTEX_INDEX,
    select_extra_joints,
    vertex_joint_selector_ids,
)
from interdiff_tpu.models.layers import NormalDistDecoder, nerf_embedder

from test_smpl_loader import _write_fake_smpl_pkl


def test_nerf_embedder_matches_manual(rng):
    multires, d = 4, 3
    embed, out_dim = nerf_embedder(multires, d)
    assert out_dim == d + 2 * multires * d
    x = jnp.asarray(rng.standard_normal((5, d)).astype(np.float32))
    out = np.asarray(embed(x))
    assert out.shape == (5, out_dim)
    # reference layout: [x, sin(x*f0), cos(x*f0), sin(x*f1), ...] with
    # f = 2**linspace(0, multires-1, multires)
    xs = np.asarray(x)
    np.testing.assert_allclose(out[:, :d], xs, rtol=1e-6)
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    for i, f in enumerate(freqs):
        s = d + 2 * i * d
        np.testing.assert_allclose(out[:, s:s + d], np.sin(xs * f),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[:, s + d:s + 2 * d], np.cos(xs * f),
                                   rtol=1e-5, atol=1e-6)


def test_nerf_embedder_identity_mode():
    embed, out_dim = nerf_embedder(-1, 3)
    assert out_dim == 3
    x = jnp.ones((2, 3))
    np.testing.assert_array_equal(np.asarray(embed(x)), np.ones((2, 3)))


def test_normal_dist_decoder_shapes_and_sigma(rng):
    mod = NormalDistDecoder(num_feat_in=16, latent_dim=8)
    x = jnp.asarray(rng.standard_normal((3, 2, 16)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    mu, sigma = mod.apply(params, x)
    assert mu.shape == (6, 8) and sigma.shape == (6, 8)  # flattens leading
    assert np.all(np.asarray(sigma) > 0)
    # sigma = exp(0.5*logvar): zero-init bias + tiny inputs -> sigma near 1
    mu0, sigma0 = mod.apply(params, jnp.zeros((1, 16)))
    np.testing.assert_allclose(np.asarray(sigma0), 1.0, atol=1e-6)


def test_vertex_joint_selector(rng):
    ids = vertex_joint_selector_ids()
    assert ids.shape == (16,)  # 6 feet keypoints + 10 fingertips
    assert ids[0] == SMPLH_VERTEX_INDEX["LBigToe"]
    assert ids[6] == SMPLH_VERTEX_INDEX["lthumb"]
    assert vertex_joint_selector_ids(use_hands=False).shape == (6,)
    assert vertex_joint_selector_ids(use_feet_keypoints=False).shape == (10,)

    verts = rng.standard_normal((2, 6890, 3)).astype(np.float32)
    joints = rng.standard_normal((2, 52, 3)).astype(np.float32)
    out = select_extra_joints(verts, joints)
    assert out.shape == (2, 68, 3)
    np.testing.assert_array_equal(out[:, :52], joints)
    np.testing.assert_array_equal(out[:, 52], verts[:, ids[0]])
    # jax-array path
    out_j = select_extra_joints(jnp.asarray(verts), jnp.asarray(joints))
    np.testing.assert_allclose(np.asarray(out_j), out)
    # 52 kinematic + 5 face + 6 feet + 10 tips = the published name table
    assert len(SMPLH_JOINT_NAMES) == 73
    assert SMPLH_JOINT_NAMES[52] == "nose"
    assert SMPLH_JOINT_NAMES[57] == "left_big_toe"


def test_get_body_model_factory(tmp_path, rng):
    from interdiff_tpu.smpl.loader import get_body_model

    d = tmp_path / "smplh"
    d.mkdir()
    _write_fake_smpl_pkl(d / "SMPLH_MALE.pkl", rng)
    model = get_body_model(tmp_path, "smplh", "male", num_betas=4)
    assert model.v_template.shape == (30, 3)
    assert model.parents.shape == (5,)


def test_synthetic_body_is_closed_and_signed():
    """The stand-in body (`cli/common.synthetic_smpl_body`) must be a
    watertight oriented surface so signed-distance/penetration metrics
    behave like the real SMPL-H: every edge shared by exactly two faces,
    outward normals (positive distance outside, negative at the center),
    and V=6890 giving exactly the real 13776 faces (2V-4)."""
    import collections

    import numpy as np

    from interdiff_tpu.cli.common import synthetic_smpl_body
    from interdiff_tpu.ops.mesh_distance import signed_distance_to_mesh

    body = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    faces = np.asarray(body.faces)
    verts = np.asarray(body.v_template, np.float32)
    assert faces.shape == (13776, 3)

    cnt = collections.Counter()
    for tri in faces:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            cnt[(min(a, b), max(a, b))] += 1
    assert set(cnt.values()) == {2}

    probes = np.array([[5, 0, 0], [0, 5, 0], [0, 0, 5], [0, 0, 0]],
                      np.float32)
    d, _, _ = signed_distance_to_mesh(probes, verts, faces)
    d = np.asarray(d)
    assert (d[:3] > 0).all() and d[3] < 0
