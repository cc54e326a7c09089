"""Attention parity tests.

* TorchMHA is checked against real ``torch.nn.MultiheadAttention`` with the
  same weights (torch-cpu ships in the image) — golden parity for the dense
  attention used by vanilla layers and decoder cross-attention.
* banded_qan_attention is checked against an independent per-position gather
  implementation of the window=1, look +/-1 local attention
  (`interdiff/model/sublayers.py:79-88`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interdiff_tpu.ops.attention import (
    banded_qan_attention,
    multi_head_attention,
    normalize_queries,
    rotary_cos_sin,
    apply_rotary,
)


def test_torch_mha_parity(rng):
    torch = pytest.importorskip("torch")
    B, T, D, H = 3, 7, 32, 4
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    mem = rng.standard_normal((B, 5, D)).astype(np.float32)

    mha = torch.nn.MultiheadAttention(D, H, batch_first=True)
    mha.eval()
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(x), torch.from_numpy(mem),
                     torch.from_numpy(mem), need_weights=False)
    ref = ref.numpy()

    from interdiff_tpu.models.layers import TorchMHA
    mod = TorchMHA(D, H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mem),
                      jnp.asarray(mem))
    sd = mha.state_dict()
    params = {
        "params": {
            "in_proj_kernel": jnp.asarray(sd["in_proj_weight"].numpy().T),
            "in_proj_bias": jnp.asarray(sd["in_proj_bias"].numpy()),
            "out_proj": {
                "kernel": jnp.asarray(sd["out_proj.weight"].numpy().T),
                "bias": jnp.asarray(sd["out_proj.bias"].numpy()),
            },
        }
    }
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(mem), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def _reference_banded(queries, x, num_heads):
    """Independent numpy re-derivation: explicit window gather per position."""
    N, D = queries.shape
    B, T, _ = x.shape
    q = np.asarray(normalize_queries(jnp.asarray(queries), num_heads))
    cos, sin = map(np.asarray, rotary_cos_sin(T, D))

    def rot(v, t):
        half = D // 2
        rot_half = np.concatenate([-v[half:], v[:half]])
        return v * cos[t] + rot_half * sin[t]

    out = np.zeros((B, N, T, D), dtype=np.float32)
    for b in range(B):
        for n in range(N):
            for t in range(T):
                js = [j for j in (t - 1, t, t + 1) if 0 <= j < T]
                qv = rot(q[n], t)
                scores = np.array(
                    [qv @ rot(x[b, j], j) for j in js]) * D ** -0.5
                p = np.exp(scores - scores.max())
                p /= p.sum()
                out[b, n, t] = sum(pi * x[b, j] for pi, j in zip(p, js))
    return out


def test_banded_qan_attention_matches_gather(rng):
    B, T, D, N, H = 2, 9, 16, 3, 4
    queries = rng.standard_normal((N, D)).astype(np.float32)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    got = np.asarray(banded_qan_attention(jnp.asarray(queries),
                                          jnp.asarray(x), num_heads=H))
    want = _reference_banded(queries, x, H)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_queries_unit_norm(rng):
    q = rng.standard_normal((5, 32)).astype(np.float32) * 3
    out = np.asarray(normalize_queries(jnp.asarray(q), 4))
    heads = out.reshape(5, 4, 8)
    norms = np.linalg.norm(heads, axis=-1)
    np.testing.assert_allclose(norms, np.full((5, 4), 1 / np.sqrt(8)),
                               rtol=1e-4)


def test_rotary_preserves_norm(rng):
    x = rng.standard_normal((2, 11, 32)).astype(np.float32)
    cos, sin = rotary_cos_sin(11, 32)
    rx = np.asarray(apply_rotary(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(rx, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_multi_head_attention_softmax_rows(rng):
    # single head, identity check: uniform keys -> output is mean of values
    B, T, D = 1, 4, 8
    q = jnp.zeros((B, T, D))
    k = jnp.zeros((B, T, D))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    out = multi_head_attention(q, k, v, num_heads=2)
    np.testing.assert_allclose(np.asarray(out),
                               np.repeat(np.asarray(v).mean(1, keepdims=True),
                                         T, axis=1), atol=1e-6)
