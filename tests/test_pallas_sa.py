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


def test_samodule_routes_fused_sa(force_interpret, monkeypatch):
    """SAModuleMSG output with the fused-SA path (interpret) matches the
    unfused XLA path on the SAME parameters.  Fused-SA is opt-in since the
    round-5 A/B (rank-select measured faster at every routed shape)."""
    monkeypatch.setenv("INTERDIFF_FUSED_SA", "1")
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


def test_samodule_train_mode_stays_unfused(force_interpret, monkeypatch):
    """train=True (batch-stats BN) must NOT route the folded fused path
    even when fused-SA is opted in; the call still works and matches
    itself with the gate off."""
    monkeypatch.setenv("INTERDIFF_FUSED_SA", "1")
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


class TestScopedVmemGuard:
    """VERDICT r4 items 1+3: shape-aware tile_m + structural fallback.

    BENCH_r04 recorded the calibration point: at N=2048, tile_m=512 the
    fused-SA kernel's scoped allocation was 18.52 MB > the 16 MB Mosaic
    limit, compile-crashing every encoder-bearing chip graph at the
    reference eval point count."""

    def test_model_covers_observed_failure(self):
        from interdiff_tpu.ops.pallas_sa import _sa_scoped_bytes

        observed = int(18.52 * 2 ** 20)  # BENCH_r04 failure
        assert _sa_scoped_bytes(2048, 512) >= observed

    def test_tile_choices(self):
        from interdiff_tpu.ops.pallas_sa import pick_tile_m

        # train shape: chip-verified good at 512 — must stay 512
        assert pick_tile_m(1024) == 512
        # reference eval shape: 512 OOMed on chip — must shrink
        assert pick_tile_m(2048) in (128, 256)
        # nothing fits -> None (caller falls back to XLA)
        assert pick_tile_m(1 << 22) is None

    def test_group_tile_choices(self):
        from interdiff_tpu.ops.pallas_group import (
            _group_scoped_bytes,
            _pick_group_tile_m,
        )

        # chip calibration 2026-08-20: 16.04 MB OOM observed at 2048x512
        assert _group_scoped_bytes(2048, 512) >= int(16.04 * 2 ** 20)
        assert _pick_group_tile_m(2048) in (128, 256)
        # train shape chip-verified good at 512 (round-4 train bench)
        assert _pick_group_tile_m(1024) == 512
        assert _pick_group_tile_m(1 << 22) is None

    def test_oversized_shape_falls_back(self, force_interpret, monkeypatch):
        """A shape whose every tile over-budgets must route to the XLA
        reference instead of reaching pallas_call."""
        import interdiff_tpu.ops.pallas_sa as psa

        def boom(*a, **k):
            raise AssertionError("pallas path must not be reached")

        monkeypatch.setattr(psa, "_sa_pallas", boom)
        monkeypatch.setattr(psa, "pick_tile_m", lambda *a, **k: None)
        rng = np.random.default_rng(9)
        xyz = jnp.asarray(rng.standard_normal((1, 32, 3)), jnp.float32)
        params = _params(rng, ((3, 8),))
        out = fused_sa_scale(xyz, xyz[:, :8], None, params, 0.5, 4, True)
        want = _sa_reference(xyz, xyz[:, :8], None, params, 0.5, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=1e-5)

    def test_oversized_group_falls_back(self, force_interpret, monkeypatch):
        import interdiff_tpu.ops.pallas_group as pgm

        def boom(*a, **k):
            raise AssertionError("pallas path must not be reached")

        monkeypatch.setattr(pgm, "_select_sum_pallas", boom)
        monkeypatch.setattr(pgm, "_pick_group_tile_m", lambda n: None)
        rng = np.random.default_rng(10)
        xyz = jnp.asarray(rng.standard_normal((1, 32, 3)), jnp.float32)
        out = pgm.fused_query_group(xyz, xyz[:, :8], None, 0.5, 4, True)
        want = pgm._reference_group(xyz, xyz[:, :8], None, 0.5, 4, True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    def test_small_tile_matches_reference(self, force_interpret,
                                          monkeypatch):
        """tile_m=128 (the shrunken pick) stays correct — interpret-mode
        equality at a tile-boundary-exercising shape."""
        import interdiff_tpu.ops.pallas_sa as psa

        monkeypatch.setattr(psa, "pick_tile_m", lambda *a, **k: 128)
        rng = np.random.default_rng(11)
        B, N, M, F = 1, 64, 160, 1  # M pads to 2 tiles of 128
        xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        new_xyz = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((B, N, F)), jnp.float32)
        params = _params(rng, ((3 + F, 8), (8, 16)))
        got = fused_sa_scale(xyz, new_xyz, feats, params, 0.5, 4, True)
        want = _sa_reference(xyz, new_xyz, feats, params, 0.5, 4, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-5)
