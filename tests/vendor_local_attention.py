"""Vendored torch forward of lucidrains/local-attention (MIT license),
specialised to the configuration InterDiff uses
(`reference/interdiff/model/sublayers.py:79-88`):

    LocalAttention(dim=d_model, window_size=1, causal=False,
                   look_backward=1, look_forward=1, dropout=0,
                   exact_windowsize=False, autopad=True)

i.e. non-causal windowed attention with rotary position embeddings
(``SinusoidalEmbeddings``), no xpos, no shared_qk, no attn_bias.  The pip
package is not installed in this image; this file reproduces the upstream
``local_attention/local_attention.py`` + ``rotary.py`` math (generic in
window_size / look_backward / look_forward) so the REFERENCE QaN layers can
be imported and executed unmodified for activation-level golden tests
(see test_qan_torch_parity.py).  Implementation notes:

  * rotary is applied to q and k over the FULL feature dim (the reference
    passes ``dim=d_model`` and folds heads into the batch axis before the
    call, so there is no per-head split inside LocalAttention);
  * scale is ``dim_head ** -0.5`` computed from the runtime feature dim;
  * each length-``window_size`` bucket of queries attends to its own bucket
    plus ``look_backward``/``look_forward`` neighbour buckets, out-of-range
    positions masked to the dtype's max negative value.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def exists(x):
    return x is not None


def default(x, d):
    return x if exists(x) else d


def max_neg_value(t):
    return -torch.finfo(t.dtype).max


def rotate_half(x):
    # upstream: rearrange('b ... (r d) -> b ... r d', r=2) -> (-x2, x1)
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return torch.cat((-x2, x1), dim=-1)


def apply_rotary_pos_emb(q, k, freqs):
    # (no-xpos path: scale == 1)
    q_len = q.shape[-2]
    q_freqs = freqs[..., -q_len:, :]
    q = (q * q_freqs.cos()) + (rotate_half(q) * q_freqs.sin())
    k = (k * freqs.cos()) + (rotate_half(k) * freqs.sin())
    return q, k


class SinusoidalEmbeddings(nn.Module):
    def __init__(self, dim, base=10000):
        super().__init__()
        inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq)

    def forward(self, x):
        seq_len = x.shape[-2]
        t = torch.arange(seq_len, device=x.device).type_as(self.inv_freq)
        freqs = torch.einsum("i , j -> i j", t, self.inv_freq)
        return torch.cat((freqs, freqs), dim=-1)


def pad_to_multiple(tensor, multiple, dim=-1, value=0):
    seqlen = tensor.shape[dim]
    m = seqlen / multiple
    if m.is_integer():
        return False, tensor
    remainder = math.ceil(m) * multiple - seqlen
    pad_offset = (0,) * (-1 - dim) * 2
    return True, F.pad(tensor, (*pad_offset, 0, remainder), value=value)


def look_around(x, backward=1, forward=0, pad_value=-1, dim=2):
    t = x.shape[1]
    dims = (len(x.shape) - dim) * (0, 0)
    padded_x = F.pad(x, (*dims, backward, forward), value=pad_value)
    tensors = [padded_x[:, ind:(ind + t), ...]
               for ind in range(forward + backward + 1)]
    return torch.cat(tensors, dim=dim)


class LocalAttention(nn.Module):
    def __init__(self, window_size, causal=False, look_backward=1,
                 look_forward=None, dropout=0.0, shared_qk=False,
                 rel_pos_emb_config=None, dim=None, autopad=False,
                 exact_windowsize=False, scale=None,
                 use_rotary_pos_emb=True):
        super().__init__()
        look_forward = default(look_forward, 0 if causal else 1)
        assert not (causal and look_forward > 0)
        assert not causal and not shared_qk, \
            "vendored path covers the InterDiff configuration only"
        self.scale = scale
        self.window_size = window_size
        self.autopad = autopad
        self.look_backward = look_backward
        self.look_forward = look_forward
        self.dropout = nn.Dropout(dropout)
        self.rel_pos = None
        if use_rotary_pos_emb and (exists(rel_pos_emb_config) or exists(dim)):
            if exists(rel_pos_emb_config):  # deprecated upstream argument
                dim = rel_pos_emb_config[0]
            self.rel_pos = SinusoidalEmbeddings(dim)

    def forward(self, q, k, v, mask=None, input_mask=None):
        mask = default(mask, input_mask)
        assert q.ndim == 3, "pass (batch*heads, seq, dim) like the reference"
        pad_value, window_size = -1, self.window_size

        if exists(self.rel_pos):
            pos_emb = self.rel_pos(k)
            q, k = apply_rotary_pos_emb(q, k, pos_emb)

        if self.autopad:
            orig_seq_len = q.shape[1]
            (_, q), (_, k), (_, v) = map(
                lambda t: pad_to_multiple(t, window_size, dim=-2), (q, k, v))

        b, n, dim_head = q.shape
        scale = default(self.scale, dim_head ** -0.5)
        assert (n % window_size) == 0
        windows = n // window_size

        seq = torch.arange(n, device=q.device)
        b_t = seq.reshape(1, windows, window_size)

        bq, bk, bv = map(
            lambda t: t.reshape(b, windows, window_size, dim_head), (q, k, v))
        bq = bq * scale
        look_around_kwargs = dict(backward=self.look_backward,
                                  forward=self.look_forward,
                                  pad_value=pad_value)
        bk = look_around(bk, **look_around_kwargs)
        bv = look_around(bv, **look_around_kwargs)

        bq_t = b_t
        bq_k = look_around(b_t, **look_around_kwargs)
        bq_t = bq_t[..., :, None]
        bq_k = bq_k[..., None, :]
        pad_mask = bq_k == pad_value

        sim = torch.einsum("b h i e, b h j e -> b h i j", bq, bk)
        mask_value = max_neg_value(sim)
        sim = sim.masked_fill(pad_mask, mask_value)

        if exists(mask):
            batch = mask.shape[0]
            assert (b % batch) == 0
            h = b // mask.shape[0]
            if self.autopad:
                _, mask = pad_to_multiple(mask, window_size, dim=-1,
                                          value=False)
            mask = mask.reshape(-1, windows, window_size)
            mask = look_around(mask,
                               **{**look_around_kwargs, "pad_value": False})
            mask = mask[..., None, :]
            mask = mask.repeat_interleave(h, dim=0)
            sim = sim.masked_fill(~mask, mask_value)

        attn = sim.softmax(dim=-1)
        attn = self.dropout(attn)

        out = torch.einsum("b h i j, b h j e -> b h i e", attn, bv)
        out = out.reshape(b, -1, dim_head)
        if self.autopad:
            out = out[:, :orig_seq_len, :]
        return out
