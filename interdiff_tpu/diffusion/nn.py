"""NN helpers — parity module for `interdiff/diffusion/nn.py` (196 LoC of
torch utilities, most unused by the live path; SURVEY.md §2 item 4).

  * `timestep_embedding` — sinusoidal embedding (`nn.py:110-128`), note the
    cos-first/sin-second half-split convention (different from the
    positional-table embedding the MDM actually uses).
  * `update_ema` — EMA of parameter pytrees (`nn.py:56-66`).
  * `zero_params` — the `zero_module` analogue for functional params.
  * gradient checkpointing (`nn.py:131-197`) maps to `jax.checkpoint`; the
    alias is exported for discoverability.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from interdiff_tpu.diffusion.losses import mean_flat, sum_flat  # noqa: F401

checkpoint = jax.checkpoint  # the CheckpointFunction equivalent


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embeddings [N] -> [N, dim] (cos | sin halves,
    zero-padded when dim is odd)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def update_ema(ema_params, params, *, rate: float = 0.9999):
    """EMA update over parameter pytrees: ema <- ema*rate + p*(1-rate)."""
    return jax.tree.map(lambda e, p: e * rate + p * (1.0 - rate),
                        ema_params, params)


def zero_params(params):
    """Zero out a parameter pytree (`zero_module`)."""
    return jax.tree.map(jnp.zeros_like, params)


def scale_params(params, scale: float):
    """`scale_module` analogue."""
    return jax.tree.map(lambda p: p * scale, params)
