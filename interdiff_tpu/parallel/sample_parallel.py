"""Diverse-sample (best-of-N) parallelism.

The reference evaluates best-of-`diverse_samples` by looping `sample_once`
10x per batch in Python (`eval_smpl_short.py:275-296`).  On TPU the N
stochastic samples are independent, so the right layout is to fold N into
the batch axis — one device-saturating call instead of 10 sequential ones —
and min-reduce the per-sample metrics afterwards.  On a mesh, the tiled
batch shards over the data axis like any other batch.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def tile_for_diverse_samples(batch, n: int):
    """Repeat every array's batch dim n times: [B, ...] -> [n*B, ...]
    (sample i of clip b lands at row i*B + b)."""
    return jax.tree.map(lambda x: jnp.tile(
        x, (n,) + (1,) * (x.ndim - 1)), batch)


def split_diverse_samples(x: jax.Array, n: int) -> jax.Array:
    """[n*B, ...] -> [n, B, ...]."""
    return x.reshape((n, -1) + x.shape[1:])


def best_of_n_metrics(metrics: Dict[str, jax.Array], n: int
                      ) -> Dict[str, jax.Array]:
    """Per-sample metric dict over a tiled batch [n*B] -> min over the n
    samples per clip [B] (the reference's `.min(dim=0)` aggregation)."""
    return {k: split_diverse_samples(v, n).min(axis=0)
            for k, v in metrics.items()}


def data_parallel_sample(sample_fn: Callable, mesh: jax.sharding.Mesh, *,
                         n_args: int, replicated_args=(0, 1),
                         data_axis: str = "data",
                         out_sharded: bool = True) -> Callable:
    """jit a sampler/eval fn with the batch axis sharded over the mesh.

    ``sample_fn(params, key, *batch_arrays) -> x``: positions in
    ``replicated_args`` (default: params and PRNG key) are replicated, every
    other argument — and the output when ``out_sharded`` — is sharded on its
    leading (batch) dim over ``data_axis``.  Per-sequence sampling is
    embarrassingly parallel (no cross-batch reductions in the scan), so XLA
    partitions the whole reverse-diffusion loop with zero collectives; the
    result equals the single-device run (pinned by tests/test_parallel.py
    and the driver's `dryrun_multichip`).

    The returned fn carries ``.place_batch(pytree)`` to pre-place host
    arrays with the sharded layout.
    """
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    shd = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(data_axis))
    in_sh = tuple(rep if i in replicated_args else shd
                  for i in range(n_args))
    jitted = jax.jit(sample_fn, in_shardings=in_sh,
                     out_shardings=shd if out_sharded else rep)
    jitted.place_batch = lambda batch: jax.tree.map(
        lambda x: jax.device_put(x, shd), batch)
    return jitted
