"""Interpret-mode checks for the fully-fused SA-scale kernel
(`ops/pallas_sa.py`): grouping + folded conv/BN/ReLU + neighbour max in
one pass vs the pure-XLA reference on the same folded weights, plus
routing equality through SAModuleMSG and gradient agreement.

Interpret mode does NOT catch Mosaic lowering errors — the chip check is
`scripts/pallas_group_attempt.py --fused_sa`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import interdiff_tpu.ops.pallas_group as pg
from interdiff_tpu.models.pointnet import SAModuleMSG
from interdiff_tpu.ops.pallas_sa import _sa_reference, fused_sa_scale


@pytest.fixture
def force_interpret():
    old = pg._FORCE_PALLAS_INTERPRET
    pg._FORCE_PALLAS_INTERPRET = True
    yield
    pg._FORCE_PALLAS_INTERPRET = old


def _params(rng, chans):
    out = []
    for cin, cout in chans:
        out.append((
            jnp.asarray(rng.standard_normal((cin, cout)), jnp.float32) * 0.3,
            jnp.asarray(1.0 + 0.1 * rng.standard_normal(cout), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32),
        ))
    return tuple(out)


@pytest.mark.parametrize("radius,nsample", [(0.5, 4), (0.25, 8), (2.0, 4)])
def test_fused_sa_matches_reference(force_interpret, radius, nsample):
    rng = np.random.default_rng(0)
    B, N, M, F = 2, 64, 32, 1
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M]
    feats = jnp.asarray(rng.standard_normal((B, N, F)), jnp.float32)
    chans = ((3 + F, 8), (8, 8), (8, 16))
    params = _params(rng, chans)

    got = fused_sa_scale(xyz, new_xyz, feats, params, radius, nsample, True)
    want = _sa_reference(xyz, new_xyz, feats, params, radius, nsample, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_fused_sa_zero_hit_rows(force_interpret):
    """Queries with NO in-radius candidate repeat data row 0 (CUDA
    ball_query semantics) — exercised with a tiny radius."""
    rng = np.random.default_rng(1)
    B, N, M = 1, 32, 16
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M] + 100.0  # far away: zero hits everywhere
    feats = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    params = _params(rng, ((4, 8), (8, 8)))

    got = fused_sa_scale(xyz, new_xyz, feats, params, 0.1, 4, True)
    want = _sa_reference(xyz, new_xyz, feats, params, 0.1, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_fused_sa_no_features(force_interpret):
    rng = np.random.default_rng(2)
    B, N, M = 2, 48, 16
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M]
    params = _params(rng, ((3, 8), (8, 8)))
    got = fused_sa_scale(xyz, new_xyz, None, params, 0.6, 4, True)
    want = _sa_reference(xyz, new_xyz, None, params, 0.6, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_fused_sa_shared_d2(force_interpret):
    """Passing the shared transposed d2 matrix changes nothing."""
    rng = np.random.default_rng(3)
    B, N, M = 2, 64, 32
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M]
    feats = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    params = _params(rng, ((4, 8), (8, 16)))
    d2t = pg.pairwise_sqdist_t(xyz, new_xyz)
    a = fused_sa_scale(xyz, new_xyz, feats, params, 0.5, 4, True, d2t)
    b = fused_sa_scale(xyz, new_xyz, feats, params, 0.5, 4, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_sa_grad_matches_reference(force_interpret):
    """The custom VJP (fused-grouping replay + dense-MLP vjp) gives the
    same parameter AND input gradients as differentiating the reference
    directly."""
    rng = np.random.default_rng(4)
    B, N, M = 1, 32, 16
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M]
    feats = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    params = _params(rng, ((4, 8), (8, 8)))

    def loss_fused(p, f):
        return jnp.sum(fused_sa_scale(xyz, new_xyz, f, p, 0.5, 4, True))

    def loss_ref(p, f):
        return jnp.sum(_sa_reference(xyz, new_xyz, f, p, 0.5, 4, True))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, feats)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, feats)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_sa_grad_with_shared_d2_and_no_features(force_interpret):
    """bwd branches: saved d2t residual (selection replay stays
    bit-consistent) and the features=None path."""
    rng = np.random.default_rng(8)
    B, N, M = 1, 32, 16
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    new_xyz = xyz[:, :M]
    d2t = pg.pairwise_sqdist_t(xyz, new_xyz)
    params = _params(rng, ((3, 8), (8, 8)))

    def loss_fused(p, x):
        return jnp.sum(fused_sa_scale(x, new_xyz, None, p, 0.5, 4, True,
                                      d2t))

    def loss_ref(p, x):
        return jnp.sum(_sa_reference(x, new_xyz, None, p, 0.5, 4, True,
                                     jnp.swapaxes(d2t, 1, 2)))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, xyz)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(params, xyz)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_samodule_routes_fused_sa(force_interpret):
    """SAModuleMSG output with the fused-SA path (interpret) matches the
    unfused XLA path on the SAME parameters."""
    rng = np.random.default_rng(5)
    B, N = 2, 64
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    mod = SAModuleMSG(npoint=32, radii=(0.4, 0.8), nsamples=(4, 8),
                      mlps=((8, 8, 16), (8, 8, 16)))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats)

    nx_fused, feat_fused = mod.apply(variables, xyz, feats)
    pg._FORCE_PALLAS_INTERPRET = False  # off-TPU -> unfused XLA route
    nx_ref, feat_ref = mod.apply(variables, xyz, feats)
    pg._FORCE_PALLAS_INTERPRET = True

    np.testing.assert_array_equal(np.asarray(nx_fused), np.asarray(nx_ref))
    np.testing.assert_allclose(np.asarray(feat_fused), np.asarray(feat_ref),
                               rtol=2e-5, atol=1e-5)


def test_samodule_train_mode_stays_unfused(force_interpret):
    """train=True (batch-stats BN) must NOT route the folded fused path;
    the call still works and matches itself with the gate off."""
    rng = np.random.default_rng(6)
    B, N = 2, 64
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, 1)), jnp.float32)
    mod = SAModuleMSG(npoint=32, radii=(0.4,), nsamples=(4,),
                      mlps=((8, 16),))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats)
    out_a = mod.apply(variables, xyz, feats, train=True,
                      mutable=["batch_stats"])[0][1]
    pg._FORCE_PALLAS_INTERPRET = False
    out_b = mod.apply(variables, xyz, feats, train=True,
                      mutable=["batch_stats"])[0][1]
    pg._FORCE_PALLAS_INTERPRET = True
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=2e-5, atol=1e-5)
