"""Point-cloud op tests: FPS / ball query vs straightforward numpy loops,
PointNet2Encoder shape + jit checks (replaces the pointnet2_ops CUDA
kernels, `interdiff/model/layers.py:111-175`)."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.ops.pointcloud import (
    ball_query,
    furthest_point_sample,
    gather_points,
    pairwise_sqdist,
    query_and_group,
)
from interdiff_tpu.models.pointnet import PointNet2Encoder


def _numpy_fps(xyz, npoint):
    N = xyz.shape[0]
    idx = [0]
    min_d = np.full(N, np.inf)
    for _ in range(npoint - 1):
        d = np.sum((xyz - xyz[idx[-1]]) ** 2, axis=1)
        min_d = np.minimum(min_d, d)
        idx.append(int(np.argmax(min_d)))
    return np.array(idx)


def test_fps_matches_numpy(rng):
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _numpy_fps(xyz[b], 16))


def test_pairwise_sqdist(rng):
    a = rng.standard_normal((2, 5, 3)).astype(np.float32)
    b = rng.standard_normal((2, 7, 3)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _numpy_ball_query(xyz, new_xyz, radius, nsample):
    B, M, _ = new_xyz.shape
    out = np.zeros((B, M, nsample), dtype=np.int64)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for j in range(xyz.shape[1]):
                if np.sum((xyz[b, j] - new_xyz[b, m]) ** 2) < radius ** 2:
                    if cnt == 0:
                        out[b, m, :] = j
                    out[b, m, cnt] = j
                    cnt += 1
                    if cnt == nsample:
                        break
    return out


def test_ball_query_matches_cuda_semantics(rng):
    xyz = rng.random((2, 50, 3)).astype(np.float32)
    new_xyz = xyz[:, ::10]
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                0.25, 8))
    want = _numpy_ball_query(xyz, new_xyz, 0.25, 8)
    np.testing.assert_array_equal(got, want)


def test_query_and_group_recenters(rng):
    xyz = rng.random((1, 30, 3)).astype(np.float32)
    feats = rng.standard_normal((1, 30, 2)).astype(np.float32)
    new_xyz = xyz[:, :4]
    out = np.asarray(query_and_group(jnp.asarray(xyz), jnp.asarray(new_xyz),
                                     jnp.asarray(feats), 0.3, 6))
    assert out.shape == (1, 4, 6, 5)
    # the center itself is always in-radius; its re-centered xyz is ~0 and
    # must appear in the group (it is the first point scanned only if its
    # index is lowest; check instead that some group member has zero offset)
    d = np.linalg.norm(out[0, :, :, :3], axis=-1)
    assert (d.min(axis=1) < 1e-6).all()


def test_pointnet2_encoder_shapes(rng):
    enc = PointNet2Encoder(c_in=1, c_out=64, num_keypoints=1)
    pc = jnp.asarray(rng.random((2, 1, 256, 4)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), pc)
    out = enc.apply(variables, pc)
    assert out.shape == (2, 1, 1, 64)
    assert np.isfinite(np.asarray(out)).all()

    # jit-compiles cleanly
    fn = jax.jit(lambda p: enc.apply(variables, p))
    np.testing.assert_allclose(np.asarray(fn(pc)), np.asarray(out), atol=1e-5)


def test_hierarchical_fps_coverage(rng):
    from interdiff_tpu.ops.pointcloud import hierarchical_fps

    B, N, npoint, G = 2, 256, 64, 8
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    idx = np.asarray(hierarchical_fps(jnp.asarray(xyz), npoint, G))
    assert idx.shape == (B, npoint)
    for b in range(B):
        # indices valid and unique
        assert len(np.unique(idx[b])) == npoint
        assert idx[b].min() >= 0 and idx[b].max() < N
        # coverage: max distance from any point to the selected set is
        # close to exact-FPS quality (within 2x)
        exact = np.asarray(furthest_point_sample(jnp.asarray(xyz[b:b+1]),
                                                 npoint))[0]
        d_hier = np.linalg.norm(
            xyz[b][:, None] - xyz[b][idx[b]][None], axis=-1).min(1).max()
        d_exact = np.linalg.norm(
            xyz[b][:, None] - xyz[b][exact][None], axis=-1).min(1).max()
        assert d_hier <= 2.0 * d_exact + 1e-6, (d_hier, d_exact)


def test_ball_query_precomputed_d2_identical(rng):
    xyz = rng.random((2, 50, 3)).astype(np.float32)
    new_xyz = xyz[:, ::10]
    d2 = pairwise_sqdist(jnp.asarray(new_xyz), jnp.asarray(xyz))
    a = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.25, 8))
    b = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.25, 8,
                              d2))
    np.testing.assert_array_equal(a, b)


def test_sa_module_identity_fps_when_npoint_equals_n(rng):
    """npoint == N in grouped mode skips the FPS chain: centers ARE the
    input points (original order), and the grouped features match the
    explicit d2-free path run center-by-center."""
    from interdiff_tpu.models.pointnet import SAModuleMSG

    xyz = jnp.asarray(rng.random((2, 32, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 32, 2)).astype(np.float32))
    sa = SAModuleMSG(npoint=32, radii=(0.2, 0.4), nsamples=(4, 8),
                     mlps=((8, 8), (8, 16)), fps_groups=8)
    params = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats = sa.apply(params, xyz, feats)
    np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(xyz))
    assert new_feats.shape == (2, 32, 24)

    # the grouped features equal a manual reconstruction over the same order
    for s, (r, ns) in enumerate(((0.2, 4), (0.4, 8))):
        grouped = query_and_group(xyz, xyz, feats, r, ns)
        from interdiff_tpu.models.pointnet import SharedMLP
        mlp = SharedMLP(((8, 8), (8, 16))[s])
        sub = {"params": params["params"][f"mlp{s}"],
               "batch_stats": params["batch_stats"][f"mlp{s}"]}
        want = jnp.max(mlp.apply(sub, grouped), axis=2)
        np.testing.assert_allclose(
            np.asarray(new_feats[..., s * 8:][..., :(8, 16)[s]]),
            np.asarray(want), atol=1e-5)
