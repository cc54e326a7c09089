"""Timestep schedule samplers.

Functional JAX redesign of `interdiff/diffusion/resample.py`.  The practical
configuration is uniform sampling (`train_diffusion_smpl.py:43-44` hardcodes
'uniform'); the loss-second-moment importance sampler is provided for
completeness as a pure-state pytree whose cross-replica sync is a
``jax.lax.all_gather`` when used inside ``shard_map`` (replacing the dead
``torch.distributed.all_gather`` at ref `:83-104`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key: jax.Array, batch_size: int) -> Tuple[jax.Array, jax.Array]:
        t = jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), dtype=jnp.float32)
        return t, weights


@struct.dataclass
class LossSecondMomentState:
    """Per-timestep loss history ring buffer: [T, history] plus fill counts."""

    loss_history: jax.Array  # [T, history_per_term] float32
    loss_counts: jax.Array  # [T] int32


class LossSecondMomentResampler:
    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self) -> LossSecondMomentState:
        return LossSecondMomentState(
            loss_history=jnp.zeros((self.num_timesteps, self.history_per_term), jnp.float32),
            loss_counts=jnp.zeros((self.num_timesteps,), jnp.int32),
        )

    def weights(self, state: LossSecondMomentState) -> jax.Array:
        warmed = jnp.all(state.loss_counts == self.history_per_term)
        sq_mean = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
        w = sq_mean / jnp.maximum(jnp.sum(sq_mean), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full((self.num_timesteps,), 1.0 / self.num_timesteps)
        return jnp.where(warmed, w, uniform)

    def sample(self, key: jax.Array, batch_size: int,
               state: LossSecondMomentState) -> Tuple[jax.Array, jax.Array]:
        p = self.weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights.astype(jnp.float32)

    def update(self, state: LossSecondMomentState, ts: jax.Array,
               losses: jax.Array, *, axis_name: str | None = None
               ) -> LossSecondMomentState:
        """Fold a batch of (t, loss) pairs into the history.

        If ``axis_name`` is given (inside ``shard_map``/``pmap``), gathers the
        batch across replicas first so every replica sees the same state.
        """
        if axis_name is not None:
            ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
            losses = jax.lax.all_gather(losses, axis_name).reshape(-1)

        def body(st, pair):
            t, loss = pair
            hist, counts = st.loss_history, st.loss_counts
            cnt = counts[t]
            full = cnt == self.history_per_term
            # shift-left when full, else append at cnt
            shifted = jnp.concatenate([hist[t, 1:], jnp.array([loss])])
            appended = hist[t].at[jnp.minimum(cnt, self.history_per_term - 1)].set(loss)
            new_row = jnp.where(full, shifted, appended)
            hist = hist.at[t].set(new_row)
            counts = counts.at[t].set(jnp.minimum(cnt + 1, self.history_per_term))
            return LossSecondMomentState(hist, counts), None

        state, _ = jax.lax.scan(body, state, (ts, losses))
        return state


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
