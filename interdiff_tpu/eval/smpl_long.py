"""SMPL-track long-term autoregressive evaluation.

The reference's `eval_smpl_long.py` is unreleased/incomplete: it calls
`denormalize` and `correct` which are defined nowhere in the repo
(`eval_smpl_long.py:278,285`; README.md:74 leaves long-term eval unchecked)
and never passes the rollout count into `sample()`.  This module implements
a coherent rollout around the parts that DO exist:

  * `get_batch` re-canonicalization (`eval_smpl_long.py:26-84`): the last
    ``past_len`` predicted frames become the new past window, translated so
    the pelvis of its first frame sits at the origin, with NO yaw
    re-alignment (rotation = identity in the reference's template);
  * our `denormalize`: the inverse of that transform — add the saved
    centroid back to every translation-like quantity of the new chunk;
  * our `correct`: the C1 seam fix-up `smooth_seam` applied at each chunk
    junction (the same fix `eval_smpl_short.py:217-223` applies at the
    past/future seam).

Everything operates on the dense [B, T, 144] state; each chunk is one call
to the jitted short-term sampler.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from interdiff_tpu.eval.metrics import smooth_seam
from interdiff_tpu.eval.smpl_short import SmplEvalConfig, pad_idx


def recanonicalize_state(x: jax.Array, pelvis: jax.Array,
                         cfg: SmplEvalConfig) -> Dict[str, jax.Array]:
    """Predicted state [B,T,144] + pelvis [B,T,3] -> (new gt state with the
    last past_len frames as the past, future = repeat last; centroid [B,3]).
    """
    D = cfg.smpl_dim + 3
    p = cfg.past_len
    tail = x[:, -p:]
    centroid = pelvis[:, -p][:, None]  # pelvis of the new first frame [B,1,3]

    body = tail[..., :D]
    obj = tail[..., D:]
    body = body.at[..., -3:].add(-centroid)
    obj = obj.at[..., -3:].add(-centroid)
    tail = jnp.concatenate([body, obj], axis=-1)

    T = x.shape[1]
    pad = jnp.repeat(tail[:, -1:], T - p, axis=1)
    return {"gt": jnp.concatenate([tail, pad], axis=1),
            "centroid": centroid[:, 0]}


def denormalize_chunk(x: jax.Array, centroid: jax.Array,
                      cfg: SmplEvalConfig) -> jax.Array:
    """Inverse of :func:`recanonicalize_state` for a sampled chunk."""
    D = cfg.smpl_dim + 3
    body = x[..., :D].at[..., -3:].add(centroid[:, None])
    obj = x[..., D:].at[..., -3:].add(centroid[:, None])
    return jnp.concatenate([body, obj], axis=-1)


def rollout(
    sample_fn: Callable,  # jitted: (key, gt, obj_points6, hand, betas) -> x
    pelvis_fn: Callable,  # (x, hand, betas) -> pelvis [B,T,3] (SMPL FK)
    key: jax.Array,
    gt: jax.Array,  # [B, T, 144] first-window conditioning
    obj_points6: jax.Array,
    hand_pose: jax.Array,  # [B, T, 90]
    betas: jax.Array,  # [B, T, 10]
    *,
    num_chunks: int,
    cfg: SmplEvalConfig,
    seam_smooth: bool = True,
) -> jax.Array:
    """-> full trajectory [B, past + (1+num_chunks)*future, 144]."""
    key, k0 = jax.random.split(key)
    x = sample_fn(k0, gt, obj_points6, hand_pose, betas)
    full = x
    idx = pad_idx(cfg)

    # chunk k >= 2 is sampled in chunk (k-1)'s canonical frame, so its
    # global placement is the SUM of every centroid subtracted so far, not
    # just the last one (each recanonicalize_state sees coordinates that
    # were already shifted by all previous recanonicalizations)
    offset = jnp.zeros((x.shape[0], 3), x.dtype)
    for _ in range(num_chunks):
        pelvis = pelvis_fn(x, hand_pose, betas)
        nb = recanonicalize_state(x, pelvis, cfg)
        offset = offset + nb["centroid"]
        # hands/betas for the new window: shift the window like the state
        hand_pose = hand_pose[:, idx]
        betas = betas[:, idx]
        key, kc = jax.random.split(key)
        x = sample_fn(kc, nb["gt"], obj_points6, hand_pose, betas)
        x_global = denormalize_chunk(x, offset, cfg)
        full = jnp.concatenate([full, x_global[:, cfg.past_len :]], axis=1)
        if seam_smooth:
            full = smooth_seam(full, cfg.future_len)

    return full
