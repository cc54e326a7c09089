"""Pallas nearest-neighbour kernel vs the XLA reference (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.ops.pallas_nn import (
    nearest_neighbor_pallas,
    signed_nearest_pallas,
)
from interdiff_tpu.ops.signed_distance import nearest_neighbor, signed_nearest


def test_pallas_nn_matches_xla(rng):
    B, N, M = 2, 700, 257  # deliberately unaligned sizes
    a = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))
    d_ref, i_ref = nearest_neighbor(a, b, chunk=None, use_pallas=False)
    d_pal, i_pal = nearest_neighbor_pallas(a, b, tile_a=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               atol=1e-4)


def test_pallas_nn_exact_on_duplicates(rng):
    # ties: argmin must pick the first index, matching jnp.argmin
    a = jnp.zeros((1, 8, 3))
    b = jnp.zeros((1, 16, 3))
    d, i = nearest_neighbor_pallas(a, b, tile_a=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), 0)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_signed_nearest_pallas_matches_fallback(rng):
    """The fused NN+pseudonormal-dot kernel must agree with the
    NN + take_along_axis fallback (the formulation it replaces in
    `eval/smpl_short.py`'s penetration gate)."""
    B, N, M = 3, 300, 130  # unaligned on purpose
    a = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))
    d_ref, s_ref = signed_nearest(a, b, n, use_pallas=False)
    _, i_ref = nearest_neighbor(a, b, chunk=None, use_pallas=False)
    d_pal, s_pal, i_pal = signed_nearest_pallas(a, b, n, tile_a=128,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))


def test_signed_nearest_sign_semantics():
    """Inside/outside signs on a known configuration: surface point at
    origin with normal +z; a query above is outside (sdot > 0), below is
    inside (sdot < 0)."""
    b = jnp.asarray([[[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]]])
    n = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]])
    a = jnp.asarray([[[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]]])
    for up in (False, True):
        d, s = (signed_nearest_pallas(a, b, n, tile_a=8, interpret=True)[:2]
                if up else signed_nearest(a, b, n, use_pallas=False))
        np.testing.assert_allclose(np.asarray(d), [[0.25, 0.25]], atol=1e-6)
        assert float(s[0, 0]) > 0 and float(s[0, 1]) < 0


def test_pallas_nn_custom_vjp_matches_xla_grad(rng, monkeypatch):
    """The custom VJP (gradient through the gathered nearest point) must
    match the gradient XLA derives for the dense min/argmin formulation —
    correction training and post-hoc optimization differentiate through
    point2point_signed, whose TPU path is the Pallas kernel."""
    import interdiff_tpu.ops.pallas_nn as pn

    monkeypatch.setattr(pn, "_FORCE_INTERPRET", True)
    B, N, M = 2, 40, 24
    a = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))

    def loss_xla(a, b):
        d, _ = nearest_neighbor(a, b, chunk=None, use_pallas=False)
        return jnp.sum(jnp.sin(d))

    def loss_pal(a, b):
        d, _ = pn.nearest_neighbor_pallas_diff(a, b)
        return jnp.sum(jnp.sin(d))

    ga_ref, gb_ref = jax.grad(loss_xla, argnums=(0, 1))(a, b)
    ga_pal, gb_pal = jax.grad(loss_pal, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_pal), np.asarray(ga_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_pal), np.asarray(gb_ref),
                               atol=1e-4)


def test_signed_pallas_custom_vjp_matches_xla_grad(rng, monkeypatch):
    """Gradients of the fused signed-NN wrapper wrt queries, surface points
    AND normals must match the gradients XLA derives for the unfused
    NN + gather fallback (post-hoc optimization differentiates through all
    three: normals are themselves a function of the SMPL vertices)."""
    import interdiff_tpu.ops.pallas_nn as pn

    monkeypatch.setattr(pn, "_FORCE_INTERPRET", True)
    B, N, M = 2, 40, 24
    a = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32))

    def loss_xla(a, b, n):
        d, s = signed_nearest(a, b, n, use_pallas=False)
        return jnp.sum(jnp.sin(d) + jnp.cos(s))

    def loss_pal(a, b, n):
        d, s = pn.signed_nearest_pallas_diff(a, b, n)
        return jnp.sum(jnp.sin(d) + jnp.cos(s))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(a, b, n)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(a, b, n)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-4)


def test_dispatch_flattens_batch_dims_and_broadcasts_surface(rng,
                                                             monkeypatch):
    """The use_pallas dispatch in ops/signed_distance collapses arbitrary
    leading batch dims to the kernel's single batch axis and broadcasts a
    shared surface cloud; results must match the per-element XLA fallback."""
    import interdiff_tpu.ops.pallas_nn as pn

    monkeypatch.setattr(pn, "_FORCE_INTERPRET", True)
    B1, B2, N, M = 2, 3, 16, 24
    a = jnp.asarray(rng.standard_normal((B1, B2, N, 3)).astype(np.float32))
    b_shared = jnp.asarray(rng.standard_normal((M, 3)).astype(np.float32))
    n_shared = jnp.asarray(rng.standard_normal((M, 3)).astype(np.float32))

    d_ref, i_ref = nearest_neighbor(a, b_shared, chunk=None,
                                    use_pallas=False)
    d_pal, i_pal = nearest_neighbor(a, b_shared, use_pallas=True)
    assert d_pal.shape == (B1, B2, N)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_pal), np.asarray(i_ref))

    sd_ref, ss_ref = signed_nearest(a, b_shared, n_shared, use_pallas=False)
    sd_pal, ss_pal = signed_nearest(a, b_shared, n_shared, use_pallas=True)
    np.testing.assert_allclose(np.asarray(sd_pal), np.asarray(sd_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ss_pal), np.asarray(ss_ref),
                               atol=1e-4)


class TestSignedNearestPruned:
    """Segment-pruned sweep (VERDICT r4 item 4): bit-equal to the full
    kernel wherever true distance < delta, exactly (delta^2, +1, 0)
    beyond, and far segments actually skipped."""

    def _clouds(self, rng, B=2, N=200, M=1100):
        # surface spread along x so distinct segments are near/far
        b = rng.standard_normal((B, M, 3)).astype(np.float32) * 0.1
        b[..., 0] += np.linspace(0.0, 4.0, M, dtype=np.float32)
        # half the queries hover over the first quarter of the surface,
        # half float far above it (true distance > delta)
        a = rng.standard_normal((B, N, 3)).astype(np.float32) * 0.15
        a[..., 0] += rng.uniform(0.0, 1.0, (B, N)).astype(np.float32)
        a[:, : N // 2, 1] += 3.0
        n = rng.standard_normal((B, M, 3)).astype(np.float32)
        return jnp.asarray(a), jnp.asarray(b), jnp.asarray(n)

    def test_bit_equal_within_delta_forced_beyond(self, rng):
        from interdiff_tpu.ops.pallas_nn import (
            signed_nearest_pallas,
            signed_nearest_pruned_pallas,
        )

        a, b, n = self._clouds(rng)
        delta = 0.5
        d_full, s_full, i_full = signed_nearest_pallas(
            a, b, n, interpret=True)
        d_pr, s_pr, i_pr = signed_nearest_pruned_pallas(
            a, b, n, delta=delta, seg=256, interpret=True)
        near = np.asarray(d_full) < delta * delta
        assert near.any() and (~near).any()  # both regimes exercised
        np.testing.assert_array_equal(np.asarray(d_pr)[near],
                                      np.asarray(d_full)[near])
        np.testing.assert_array_equal(np.asarray(s_pr)[near],
                                      np.asarray(s_full)[near])
        np.testing.assert_array_equal(np.asarray(i_pr)[near],
                                      np.asarray(i_full)[near])
        far = ~near
        np.testing.assert_array_equal(np.asarray(d_pr)[far],
                                      delta * delta)
        np.testing.assert_array_equal(np.asarray(s_pr)[far], 1.0)
        np.testing.assert_array_equal(np.asarray(i_pr)[far], 0)

    def test_all_far_forces_everything(self, rng):
        from interdiff_tpu.ops.pallas_nn import signed_nearest_pruned_pallas

        a = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32)
                        + 50.0)
        n = jnp.asarray(rng.standard_normal((1, 512, 3)).astype(np.float32))
        d, s, i = signed_nearest_pruned_pallas(a, b, n, delta=0.25,
                                               seg=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(d), 0.25 * 0.25)
        np.testing.assert_array_equal(np.asarray(s), 1.0)
        np.testing.assert_array_equal(np.asarray(i), 0)

    def test_wrapper_fallback_matches_pallas_contract(self, rng):
        """Off-TPU wrapper path (full sweep + forcing) == pruned kernel."""
        from interdiff_tpu.ops.pallas_nn import signed_nearest_pruned_pallas
        from interdiff_tpu.ops.signed_distance import signed_nearest_pruned

        a, b, n = self._clouds(rng)
        delta = 0.5
        d_w, s_w = signed_nearest_pruned(a, b, n, delta=delta,
                                         use_pallas=False)
        d_k, s_k, _ = signed_nearest_pruned_pallas(a, b, n, delta=delta,
                                                   seg=256, interpret=True)
        np.testing.assert_allclose(np.asarray(d_w), np.asarray(d_k),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_k),
                                   atol=1e-5)

    def test_gate_terms_bit_equal(self, rng):
        """The correction-gate consumer (w / loss_dist_o) is bit-identical
        pruned vs full — the soundness claim the gate relies on.  Needs a
        CLOSED body with outward normals and delta >= its max interior-to-
        vertex distance (here: a 0.4-radius vert sphere, delta 0.5) —
        with arbitrary normals/open geometry the claim does NOT hold,
        which is why the gate documents the delta requirement."""
        from interdiff_tpu.ops.signed_distance import signed_nearest_pruned

        B, N, M = 2, 300, 1100
        dirs = rng.standard_normal((B, M, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        b = jnp.asarray(0.4 * dirs)  # dense sphere: D_int ~ 0.4 < 0.5
        n = jnp.asarray(dirs)  # outward normals
        qdir = rng.standard_normal((B, N, 3)).astype(np.float32)
        qdir /= np.linalg.norm(qdir, axis=-1, keepdims=True)
        radii = np.concatenate([
            rng.uniform(0.0, 0.35, (B, N // 3)),     # inside (penetrating)
            rng.uniform(0.45, 0.8, (B, N // 3)),     # near outside
            rng.uniform(2.0, 3.0, (B, N - 2 * (N // 3))),  # far outside
        ], axis=1).astype(np.float32)
        a = jnp.asarray(qdir * radii[..., None])
        d_f, s_f = signed_nearest(a, b, n, use_pallas=False)
        assert (np.asarray(s_f) < 0).any()  # penetrating regime exercised
        d_p, s_p = signed_nearest_pruned(a, b, n, delta=0.5,
                                         use_pallas=False)

        def gate_terms(sq, sdot):
            signed = jnp.sqrt(jnp.maximum(sq, 0.0)) * jnp.sign(sdot)
            w = jnp.where(signed < 0, 20.0, 0.0)
            return jnp.abs(signed) * w

        np.testing.assert_array_equal(
            np.asarray(gate_terms(d_f, s_f)),
            np.asarray(gate_terms(d_p, s_p)))

    def test_variants_agree_and_auto_seg(self, rng):
        """The three segment-walk formulations (unrolled / fori /
        lanefold) are elementwise-identical on tie-free geometry, at an
        explicit seg and at the auto-chosen one (seg=None -> ceil(M/4)
        rounded to a lane tile).  fori is the production variant: on-chip
        its per-segment argmin + ordered strict-< merge reproduces the
        full-width Mosaic argmin fold order exactly (4/4 chip contract
        runs, 2026-08-20), while lanefold's lane-folded accumulator
        resolves exact score ties differently from Mosaic's vreg order —
        kept as a documented negative result.  Interpret mode (XLA
        argmin) only agrees on TIE-FREE geometry, which random f32 clouds
        are with overwhelming probability."""
        from interdiff_tpu.ops.pallas_nn import signed_nearest_pruned_pallas

        a, b, n = self._clouds(rng)
        ref = None
        for kwargs in ({"seg": 256, "variant": "unrolled"},
                       {"seg": 256, "variant": "fori"},
                       {"seg": 256, "variant": "lanefold"},
                       {"variant": "fori"},  # auto seg
                       {"variant": "lanefold"}):
            out = signed_nearest_pruned_pallas(a, b, n, delta=0.5,
                                               interpret=True, **kwargs)
            if ref is None:
                ref = out
                continue
            for x, y in zip(ref, out):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=str(kwargs))
