"""Pallas row-gather kernel vs the XLA gather (interpret mode on CPU; the
same kernel runs compiled on TPU inside `query_and_group`)."""

import numpy as np
import jax
import jax.numpy as jnp

import interdiff_tpu.ops.pallas_gather as pg
from interdiff_tpu.ops.pallas_gather import (
    _xla_gather_rows,
    gather_rows,
    gather_rows_pallas,
)
from interdiff_tpu.ops.pointcloud import query_and_group


def _rand_case(rng, B, N, C, K):
    data = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
    return data, idx


def test_gather_rows_pallas_exact(rng):
    B, N, C, K = 3, 50, 4, 37  # unaligned everywhere on purpose
    data, idx = _rand_case(rng, B, N, C, K)
    ref = _xla_gather_rows(data, idx)
    out = gather_rows_pallas(data, idx, tile_k=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_pallas_channel_widths(rng):
    for C in (1, 3, 6, 8):
        data, idx = _rand_case(rng, 2, 33, C, 65)
        ref = _xla_gather_rows(data, idx)
        out = gather_rows_pallas(data, idx, tile_k=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_pallas_edge_indices(rng):
    """Repeated indices plus both ends of the row range."""
    N = 17
    data = jnp.asarray(rng.standard_normal((1, N, 4)).astype(np.float32))
    idx = jnp.asarray([[0, N - 1, 0, 5, 5, N - 1, 2]], dtype=jnp.int32)
    ref = _xla_gather_rows(data, idx)
    out = gather_rows_pallas(data, idx, tile_k=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_dispatch_and_vjp(rng, monkeypatch):
    """The public `gather_rows` routed through the kernel must match XLA in
    value AND gradient (the VJP scatters at idx on the XLA path)."""
    monkeypatch.setattr(pg, "_FORCE_PALLAS_INTERPRET", True)
    data, idx = _rand_case(rng, 2, 29, 4, 51)
    ct = jnp.asarray(rng.standard_normal((2, 51, 4)).astype(np.float32))

    def loss_ours(d):
        return jnp.sum(gather_rows(d, idx) * ct)

    def loss_ref(d):
        return jnp.sum(_xla_gather_rows(d, idx) * ct)

    np.testing.assert_array_equal(np.asarray(gather_rows(data, idx)),
                                  np.asarray(_xla_gather_rows(data, idx)))
    g_ours = jax.grad(loss_ours)(data)
    g_ref = jax.grad(loss_ref)(data)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               atol=1e-6)


def test_gather_rows_wide_channels_fall_back(rng, monkeypatch):
    """C > 8 (stage-2 set abstraction) must keep the XLA path even when the
    kernel is forced on — the per-channel unroll is stage-1-sized."""
    monkeypatch.setattr(pg, "_FORCE_PALLAS_INTERPRET", True)
    called = {"pallas": False}
    orig = pg.gather_rows_pallas
    monkeypatch.setattr(
        pg, "gather_rows_pallas",
        lambda *a, **k: called.__setitem__("pallas", True) or orig(*a, **k))
    data, idx = _rand_case(rng, 2, 20, 32, 9)
    out = gather_rows(data, idx)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(_xla_gather_rows(data, idx)))
    assert not called["pallas"]


def test_query_and_group_pallas_matches_fallback(rng, monkeypatch):
    """`query_and_group` through the kernel == the plain XLA path at a
    stage-1-like (xyz + 1 feature) configuration."""
    B, N, M, S = 2, 64, 32, 8
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 1)).astype(np.float32))
    new_xyz = xyz[:, :M]
    ref = query_and_group(xyz, new_xyz, feats, 0.9, S)
    monkeypatch.setattr(pg, "_FORCE_PALLAS_INTERPRET", True)
    out = query_and_group(xyz, new_xyz, feats, 0.9, S)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
