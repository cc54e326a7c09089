"""Transformer / graph building blocks (flax.linen, batch-first).

Behavioural contracts come from `interdiff/model/layers.py` and
`interdiff/model/sublayers.py`; the attention math itself lives in
:mod:`interdiff_tpu.ops.attention`.  All sequence tensors are **batch-first**
[B, T, D] (the reference is seq-first torch; layout is implementation, not
behaviour).

Parameter shapes mirror the torch modules one-to-one so the torch-checkpoint
converter can map state dicts directly:

  * dense layers store ``kernel`` as [in, out] (transpose of torch weight);
  * ``MultiheadAttention`` keeps torch's packed ``in_proj`` layout;
  * QaN layers keep ``queries`` [N, D] and ``wk`` [N, 1];
  * graph convolutions keep torch's parameter orientation (documented per
    class) even though the einsums are re-derived for channels-last.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from interdiff_tpu.ops.attention import banded_qan_attention, multi_head_attention



def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """The sin/cos positional table of `interdiff/model/layers.py:9-21`."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """x + pe[:T] then dropout (`layers.py:9-26`); x is [B, T, D]."""

    d_model: int
    dropout: float = 0.0
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model),
                         dtype=x.dtype)
        x = x + pe[None, : x.shape[1]]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TimestepEmbedder(nn.Module):
    """MLP(SiLU) over the positional-table row of t (`layers.py:29-43`).

    Input: integer timesteps [B] (or float when rescale_timesteps — the
    reference indexes the table, so we floor-cast). Output: [B, 1, D].
    """

    latent_dim: int
    max_len: int = 5000
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 inference)

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.latent_dim),
                         dtype=self.dtype or jnp.float32)
        # deliberately defensive floor-cast: under rescale_timesteps the
        # engine hands out FLOAT timesteps, which the reference would index
        # the table with and crash (`layers.py:43`); rescale is never on in
        # any shipped config, so behaviour is identical where it matters
        h = pe[timesteps.astype(jnp.int32)][:, None, :]  # [B, 1, D]
        h = nn.Dense(self.latent_dim, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.latent_dim, name="fc2")(h)
        return h


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention equivalent (packed in_proj_weight/bias).

    Parameters: ``in_proj/kernel`` [D, 3D], ``in_proj/bias`` [3D],
    ``out_proj/kernel`` [D, D], ``out_proj/bias`` [D] — the torch state dict
    transposes kernels.  Attention dropout is omitted: every reference run
    uses dropout 0 at train time (`train_diffusion_skeleton.py:360`).
    """

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array,
                 value: jax.Array) -> jax.Array:
        d = self.d_model
        in_w = self.param("in_proj_kernel", _torch_linear_init(3 * d, d), (d, 3 * d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        q = query @ in_w[:, :d] + in_b[:d]
        k = key @ in_w[:, d:2 * d] + in_b[d:2 * d]
        v = value @ in_w[:, 2 * d:] + in_b[2 * d:]
        out = multi_head_attention(q, k, v, num_heads=self.num_heads)
        return nn.Dense(d, name="out_proj")(out)


def _torch_linear_init(fan_in_torch_dim0: int, fan_in: int) -> Callable:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear default."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # torch F.gelu defaults to the exact erf form; flax's default is the
        # tanh approximation — force exact for checkpoint parity
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"activation must be relu/gelu, got {name}")


class FeedForward(nn.Module):
    """linear2(dropout(act(linear1(x)))) (`sublayers.py:201-203`)."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = _activation(self.activation)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return h


class EncoderLayer(nn.Module):
    """Vanilla post-norm torch ``nn.TransformerEncoderLayer`` (torch 1.11)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, memory: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        del memory
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        sa = TorchMHA(self.d_model, self.num_heads, name="self_attn")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(sa))
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                         self.activation, name="ff")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ff))
        return x


class DecoderLayer(nn.Module):
    """Vanilla post-norm torch ``nn.TransformerDecoderLayer``."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        sa = TorchMHA(self.d_model, self.num_heads, name="self_attn")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(sa))
        ca = TorchMHA(self.d_model, self.num_heads, name="multihead_attn")(
            x, memory, memory)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ca))
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                         self.activation, name="ff")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x + drop(ff))
        return x


class _QaNMixin:
    """Shared QaN block: banded rotary attention + wk mixing."""

    def _qa_block(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        d = self.d_model
        stdv = 1.0 / math.sqrt(d)
        queries = self.param("queries", _normal_init(stdv),
                             (self.num_queries, d))
        wk = self.param("wk", _normal_init(1.0 / math.sqrt(self.num_queries)),
                        (self.num_queries, 1))
        out = banded_qan_attention(queries, x, num_heads=self.num_heads)
        # einsum bntd,nk->bktd, k==1 -> squeeze (`sublayers.py:188`)
        mixed = jnp.einsum("bntd,nk->bktd", out, wk)[:, 0]
        return nn.Dropout(self.dropout)(mixed, deterministic=deterministic)


class QaNEncoderLayer(nn.Module, _QaNMixin):
    """`TransformerEncoderLayerQaN` (`sublayers.py:37-203`), post-norm.

    The final ``stochastic_depth(x - src, rate=0, 'row')`` is identity at the
    reference's hardcoded rate 0 (`sublayers.py:118,158-159`); we keep the
    optional row-drop behind ``stochastic_depth_rate`` for completeness.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"
    num_queries: int = 10
    stochastic_depth_rate: float = 0.0

    @nn.compact
    def __call__(self, src: jax.Array, memory: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        del memory
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            src + self._qa_block(src, deterministic=deterministic))
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                         self.activation, name="ff")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ff))
        return src + _row_stochastic_depth(
            self, x - src, self.stochastic_depth_rate, deterministic)


class QaNDecoderLayer(nn.Module, _QaNMixin):
    """`TransformerDecoderLayerQaN` (`sublayers.py:206-375`): QaN self-attn,
    dense cross-attn to memory, FFN; post-norm; residual-from-tgt."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"
    num_queries: int = 10
    stochastic_depth_rate: float = 0.0

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        drop = lambda h: nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + self._qa_block(tgt, deterministic=deterministic))
        ca = TorchMHA(self.d_model, self.num_heads, name="multihead_attn")(
            x, memory, memory)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(ca))
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                         self.activation, name="ff")(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x + drop(ff))
        return tgt + _row_stochastic_depth(
            self, x - tgt, self.stochastic_depth_rate, deterministic)


def _row_stochastic_depth(module: nn.Module, delta: jax.Array, rate: float,
                          deterministic: bool) -> jax.Array:
    """torchvision ``stochastic_depth(..., 'row')`` on [B, T, D] deltas."""
    if rate == 0.0 or deterministic:
        return delta
    keep = 1.0 - rate
    key = module.make_rng("dropout")
    mask = jax.random.bernoulli(key, keep, (delta.shape[0], 1, 1))
    return delta * mask.astype(delta.dtype) / keep


class TransformerStack(nn.Module):
    """Heterogeneous layer stack (`layers.py:177-269`).

    ``kinds`` is a tuple of 'enc' | 'qan_enc' | 'dec' | 'qan_dec'; encoder
    kinds ignore ``memory``.  Matches the reference pattern: layers 1 and N
    vanilla, 2..N-1 QaN.
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    kinds: Tuple[str, ...]
    dropout: float = 0.0
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, memory: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        cls = {"enc": EncoderLayer, "qan_enc": QaNEncoderLayer,
               "dec": DecoderLayer, "qan_dec": QaNDecoderLayer}
        for i, kind in enumerate(self.kinds):
            layer = cls[kind](self.d_model, self.num_heads,
                              self.dim_feedforward, self.dropout,
                              self.activation, name=f"layer_{i}")
            if kind in ("enc", "qan_enc"):
                x = layer(x, deterministic=deterministic)
            else:
                x = layer(x, memory, deterministic=deterministic)
        return x


def mdm_stack_kinds(num_layers: int, cross: bool) -> Tuple[str, ...]:
    """First/last vanilla, middle QaN (`model/diffusion_skeleton.py:24-127`)."""
    if cross:
        return ("dec",) + ("qan_dec",) * (num_layers - 2) + ("dec",)
    return ("enc",) + ("qan_enc",) * (num_layers - 2) + ("enc",)


# ---------------------------------------------------------------------------
# ST-GCNN graph blocks (`sublayers.py:378-516`, `layers.py:271-345`)
# ---------------------------------------------------------------------------


class GraphConv(nn.Module):
    """Learned-adjacency graph convolution, channels-last [B, T, V, C].

    version 0 (`ConvTemporalGraphical`): learned T x T temporal mixing shared
    across joints; version 1 (`ConvSpatialGraphical`): learned V x V spatial
    mixing shared across time; version 2 (`ConvSpatialTemporalGraphical`):
    per-joint T x T then per-time V x V.  Parameter orientations follow the
    torch modules so checkpoints map verbatim.
    """

    time_dim: int
    joints_dim: int
    version: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        T, V = self.time_dim, self.joints_dim
        if self.version == 0:
            Tm = self.param("T", _uniform_init(1.0 / math.sqrt(T)), (T, T))
            return jnp.einsum("btvc,tq->bqvc", x, Tm)
        if self.version == 1:
            S = self.param("S", _uniform_init(1.0 / math.sqrt(V)), (V, V))
            return jnp.einsum("btvc,vw->btwc", x, S)
        if self.version == 2:
            Tm = self.param("T", _uniform_init(1.0 / math.sqrt(T)), (V, T, T))
            A = self.param("A", _uniform_init(1.0 / math.sqrt(V)), (T, V, V))
            x = jnp.einsum("btvc,vtq->bqvc", x, Tm)
            return jnp.einsum("btvc,tvw->btwc", x, A)
        raise ValueError(f"bad version {self.version}")


class STGCNNLayer(nn.Module):
    """`ST_GCNN_layer` (`layers.py:271-345`), channels-last [B, T, V, C].

    gcn -> 1x1 conv (Dense over C) -> BatchNorm -> dropout, plus a residual
    (identity, or 1x1 conv + BN when channels change), then shared-scalar
    PReLU.  Reference kernel_size is always [1,1] / stride 1, so the 2D conv
    degenerates to a pointwise channel mix — a Dense on the MXU.
    """

    in_channels: int
    out_channels: int
    time_dim: int
    joints_dim: int
    dropout: float = 0.0
    version: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name)
        if self.in_channels != self.out_channels:
            res = nn.Dense(self.out_channels, name="res_conv")(x)
            res = bn("res_bn")(res)
        else:
            res = x
        h = GraphConv(self.time_dim, self.joints_dim, self.version,
                      name="gcn")(x)
        h = nn.Dense(self.out_channels, name="tcn_conv")(h)
        h = bn("tcn_bn")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = h + res
        alpha = self.param("prelu", nn.initializers.constant(0.25), ())
        return jnp.where(h >= 0, h, alpha * h)


def nerf_embedder(multires: int, input_dims: int = 3, *,
                  include_input: bool = True, log_sampling: bool = True
                  ) -> Tuple[Callable[[jax.Array], jax.Array], int]:
    """NeRF positional encoding factory (`interdiff/model/layers.py:48-96`,
    unused by the main InterDiff path but part of its public layer surface).

    Returns ``(embed_fn, out_dim)`` like the reference's ``get_embedder``:
    ``embed(x) = [x?, sin(x*f_0), cos(x*f_0), ..., sin(x*f_{L-1}), ...]``
    with ``f_i = 2**linspace(0, multires-1, multires)`` (log sampling) or
    linearly spaced between 1 and ``2**(multires-1)``.  ``multires == -1``
    degenerates to identity (reference `get_embedder(i=-1)`).
    """
    if multires == -1:
        return (lambda x: x), input_dims
    max_freq = multires - 1
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, max_freq, multires)
    else:
        freqs = np.linspace(2.0 ** 0.0, 2.0 ** max_freq, multires)
    freqs = jnp.asarray(freqs, jnp.float32)
    out_dim = (input_dims if include_input else 0) + 2 * multires * input_dims

    def embed(x: jax.Array) -> jax.Array:
        parts = [x] if include_input else []
        for f in freqs:  # static unroll: order matches [sin, cos] per freq
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim


class NormalDistDecoder(nn.Module):
    """Feature -> diagonal-Normal head (`interdiff/model/layers.py:98-108`,
    unused by the main path).  Returns ``(mu, sigma)`` with
    ``sigma = exp(0.5 * logvar)``; jax has no distributions module, so the
    caller reparameterises with ``mu + sigma * eps`` as needed."""

    num_feat_in: int
    latent_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = x.reshape(-1, self.num_feat_in)
        mu = nn.Dense(self.latent_dim, name="mu")(x)
        logvar = nn.Dense(self.latent_dim, name="logvar")(x)
        return mu, jnp.exp(0.5 * logvar)
