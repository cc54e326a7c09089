"""Attention math for the InterDiff transformer blocks (pure jnp).

Two attention flavours exist in the reference denoiser
(`interdiff/model/sublayers.py`):

  * **QaN banded attention** — ``num_queries`` learned queries (unit-normalised
    per head, depth-scaled) attend over the sequence through lucidrains'
    ``LocalAttention(window_size=1, look_backward=1, look_forward=1,
    autopad=True, dim=d_model)`` (`sublayers.py:79-88,180-189`).  With window
    size 1 that is exactly a **tridiagonal band**: position ``t`` sees keys
    ``{t-1, t, t+1}``.  Passing ``dim`` enables the package's rotary position
    embedding, applied to q and k before the band attention, and scores are
    scaled by ``d_model ** -0.5`` on top of the query depth-scaling.
  * **dense multi-head attention** — ``torch.nn.MultiheadAttention`` used for
    decoder cross-attention (`sublayers.py:261,364-370`) and inside the two
    vanilla ``nn.TransformerEncoderLayer``s.

TPU-native design note: sequence lengths here are 20-35 tokens, so the band
is materialised as a dense T x T mask and both flavours run as plain batched
matmuls on the MXU — a scatter/gather windowed implementation (what the CUDA
path effectively does) would be slower and unfuseable on TPU.  All shapes are
batch-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MASK_VALUE = -0.5 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# rotary position embedding (lucidrains local_attention conventions)
# ---------------------------------------------------------------------------

def rotary_cos_sin(seq_len: int, dim: int, dtype=jnp.float32):
    """cos/sin tables of the package's ``SinusoidalEmbeddings``: half-split
    layout, ``freqs = cat((t * inv_freq, t * inv_freq))``."""
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., T, D]; cos/sin: [T, D]."""
    return x * cos + _rotate_half(x) * sin


# ---------------------------------------------------------------------------
# QaN query preprocessing
# ---------------------------------------------------------------------------

def normalize_queries(queries: jax.Array, num_heads: int) -> jax.Array:
    """Unit-normalise each head chunk and depth-scale by sqrt(head_dim).

    Mirrors ``_normalize_and_reshape_query`` (`sublayers.py:18-35`): reshape
    [N, D] -> [N, H, D/H], divide by (||.|| + 1e-6), divide by sqrt(D/H),
    flatten back.
    """
    n, d = queries.shape
    head_dim = d // num_heads
    q = queries.reshape(n, num_heads, head_dim)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
    q = q / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
    return q.reshape(n, d)


# ---------------------------------------------------------------------------
# banded QaN attention
# ---------------------------------------------------------------------------

def banded_qan_attention(queries: jax.Array, x: jax.Array, *,
                         num_heads: int) -> jax.Array:
    """QaN local attention block (`sublayers.py:180-189`), batch-first.

    Args:
      queries: [N, D] raw learned queries (normalisation applied here).
      x: [B, T, D] sequence; used as both keys and values.
    Returns:
      [B, N, T, D] per-query attention outputs (callers mix with ``wk``).

    Semantics: the same (normalised) query is broadcast to every position,
    rotary position embedding is applied to q and k (values stay unrotated),
    scores are scaled by D**-0.5 and masked to the band |t - j| <= 1.
    """
    B, T, D = x.shape
    q = normalize_queries(queries, num_heads)            # [N, D]
    cos, sin = rotary_cos_sin(T, D, x.dtype)

    # q'[n, t] = rot_t(q_n); k'[b, j] = rot_j(x_bj)
    q_rot = q[:, None, :] * cos[None] + _rotate_half(q)[:, None, :] * sin[None]
    k_rot = apply_rotary(x, cos, sin)

    scale = jnp.asarray(D, x.dtype) ** -0.5
    scores = jnp.einsum("ntd,bjd->bntj", q_rot, k_rot) * scale  # [B,N,T,T]

    idx = jnp.arange(T)
    band = jnp.abs(idx[:, None] - idx[None, :]) <= 1            # [T, T]
    scores = jnp.where(band[None, None], scores, _MASK_VALUE)

    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bntj,bjd->bntd", probs, x)


# ---------------------------------------------------------------------------
# dense multi-head attention (torch.nn.MultiheadAttention math)
# ---------------------------------------------------------------------------

def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         num_heads: int) -> jax.Array:
    """Scaled dot-product MHA on already-projected q/k/v, batch-first.

    q: [B, Tq, D], k/v: [B, Tk, D].  Per-head scaling 1/sqrt(D/H), full
    (unmasked) softmax — the reference never passes attn masks to its dense
    attentions.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = num_heads
    hd = D // H
    qh = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, q.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
