"""Mesh/sharding helper tests + diverse-sample tiling."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.parallel import (
    batch_sharding,
    best_of_n_metrics,
    make_mesh,
    shard_batch,
    tile_for_diverse_samples,
)
from interdiff_tpu.parallel.sample_parallel import split_diverse_samples


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_shard_batch_places_arrays():
    mesh = make_mesh()
    batch = {"a": jnp.arange(16.0).reshape(16, 1),
             "b": jnp.zeros((16, 3, 2))}
    out = shard_batch(batch, mesh)
    assert out["a"].sharding == batch_sharding(mesh)
    np.testing.assert_allclose(np.asarray(out["a"]),
                               np.asarray(batch["a"]))


def test_diverse_sample_tiling_roundtrip(rng):
    B, n = 3, 4
    batch = {"x": jnp.asarray(rng.standard_normal((B, 5)).astype(np.float32))}
    tiled = tile_for_diverse_samples(batch, n)
    assert tiled["x"].shape == (n * B, 5)
    back = split_diverse_samples(tiled["x"], n)
    for i in range(n):
        np.testing.assert_allclose(np.asarray(back[i]),
                                   np.asarray(batch["x"]))


def test_best_of_n_metrics_min():
    n, B = 3, 2
    vals = jnp.asarray([5.0, 1.0, 2.0, 9.0, 4.0, 0.5])  # [n*B]
    out = best_of_n_metrics({"m": vals}, n)
    np.testing.assert_allclose(np.asarray(out["m"]), [2.0, 0.5])


def test_data_parallel_sample_matches_single_device(rng):
    """The full reverse-diffusion scan sharded over the 8-device mesh must
    equal the single-device run (sampling is per-sequence independent, so
    XLA partitions it with zero collectives)."""
    from interdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from interdiff_tpu.eval.smpl_short import SmplEvalConfig, make_sampler
    from interdiff_tpu.models.mdm_smpl import MDMSmpl
    from interdiff_tpu.parallel.sample_parallel import data_parallel_sample

    mesh = make_mesh()
    model = MDMSmpl(embed_dim=32, ff_size=64, num_layers=2,
                    use_pointnet2=False)
    diffusion = GaussianDiffusion.create_named(steps=20,
                                               timestep_respacing="5")
    cfg = SmplEvalConfig()
    sampler = make_sampler(cfg, model, diffusion)

    B, T, P = 16, cfg.seq_len, 32
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    pts = jnp.asarray(rng.standard_normal((B, P, 6)).astype(np.float32))
    hand = jnp.zeros((B, T, 90), jnp.float32)
    betas = jnp.zeros((B, T, 10), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt, pts,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    key = jax.random.PRNGKey(3)

    dp = data_parallel_sample(sampler, mesh, n_args=6)
    x_sharded = dp(params, key, *dp.place_batch((gt, pts, hand, betas)))
    assert x_sharded.sharding == batch_sharding(mesh)  # output stays sharded
    x_single = jax.jit(sampler)(params, key, gt, pts, hand, betas)
    np.testing.assert_allclose(np.asarray(x_sharded), np.asarray(x_single),
                               atol=1e-5)


def test_data_parallel_correction_sampler_matches_single_device(rng):
    """The signature correction-in-scan path (SMPL FK + signed-distance gate
    + projector behind lax.cond inside the sampling scan) sharded over the
    mesh must equal the single-device run — the projector runs in eval mode
    (BatchNorm running stats), so nothing in the scan couples batch rows."""
    from interdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from interdiff_tpu.models.mdm_smpl import MDMSmpl
    from interdiff_tpu.parallel.sample_parallel import data_parallel_sample
    from interdiff_tpu.utils.fixtures import make_tiny_correction_sampler

    mesh = make_mesh()
    model = MDMSmpl(embed_dim=32, ff_size=64, num_layers=2,
                    use_pointnet2=False)
    diffusion = GaussianDiffusion.create_named(steps=20,
                                               timestep_respacing="5")

    B, T, P = 16, model.past_len + model.future_len, 32
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    pts = jnp.asarray(rng.standard_normal((B, P, 6)).astype(np.float32))
    hand = jnp.zeros((B, T, 90), jnp.float32)
    betas = jnp.zeros((B, T, 10), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt, pts,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    sampler = make_tiny_correction_sampler(model, diffusion, gt)
    key = jax.random.PRNGKey(3)

    dp = data_parallel_sample(sampler, mesh, n_args=6)
    x_sharded = dp(params, key, *dp.place_batch((gt, pts, hand, betas)))
    assert x_sharded.sharding == batch_sharding(mesh)
    x_single = jax.jit(sampler)(params, key, gt, pts, hand, betas)
    np.testing.assert_allclose(np.asarray(x_sharded), np.asarray(x_single),
                               atol=1e-5)
    assert np.isfinite(np.asarray(x_sharded)).all()
