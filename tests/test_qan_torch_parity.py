"""Activation-level goldens: our flax QaN layers vs the ACTUAL reference
`TransformerEncoderLayerQaN` / `TransformerDecoderLayerQaN`
(`reference/interdiff/model/sublayers.py:37-375`) executed in torch with the
vendored lucidrains LocalAttention forward (tests/vendor_local_attention.py).

This supersedes the self-referential banded-attention check in
test_attention.py: here the torch side is the reference module itself (with
`local_attention` and `torchvision` supplied via sys.modules stubs — neither
pip package is installed), weights are copied torch -> flax, and outputs are
compared at layer level and through full 8-layer MDM-topology stacks
(layers 1 & 8 vanilla, 2-7 QaN — `model/diffusion_smpl.py:20-127`).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---------------------------------------------------------------------------
# stub the missing pip deps, then import the REFERENCE sublayers module
# ---------------------------------------------------------------------------
import vendor_local_attention as _vendored  # noqa: E402  (tests dir)

_la = types.ModuleType("local_attention")
_la.LocalAttention = _vendored.LocalAttention
sys.modules.setdefault("local_attention", _la)

_tv = types.ModuleType("torchvision")
_tv_ops = types.ModuleType("torchvision.ops")


def _stochastic_depth(x, p, mode, training=True):
    # torchvision.ops.stochastic_depth: identity at p=0 / eval — the
    # reference always uses dropout_rate=0 (`sublayers.py:118,158`)
    assert p == 0.0 or not training
    return x


_tv_ops.stochastic_depth = _stochastic_depth
_tv.ops = _tv_ops
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv_ops)

REF = "/root/reference/interdiff"
if REF not in sys.path:
    sys.path.append(REF)

from model.sublayers import (  # noqa: E402  (reference module)
    TransformerDecoderLayerQaN,
    TransformerEncoderLayerQaN,
)

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.models.layers import (  # noqa: E402
    QaNDecoderLayer,
    QaNEncoderLayer,
    TransformerStack,
    mdm_stack_kinds,
)

D, H, FF, NQ = 32, 4, 64, 10
B, T, TM = 2, 7, 5


def _ln(ln):
    return {"scale": jnp.asarray(ln.weight.detach().numpy()),
            "bias": jnp.asarray(ln.bias.detach().numpy())}


def _linear(lin):
    return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def _mha(mha):
    return {
        "in_proj_kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
        "in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        "out_proj": _linear(mha.out_proj),
    }


def _qan_encoder_params(layer):
    return {
        "queries": jnp.asarray(layer.queries.detach().numpy()),
        "wk": jnp.asarray(layer.wk.detach().numpy()),
        "norm1": _ln(layer.norm1),
        "norm2": _ln(layer.norm2),
        "ff": {"linear1": _linear(layer.linear1),
               "linear2": _linear(layer.linear2)},
    }


def _qan_decoder_params(layer):
    return {
        "queries": jnp.asarray(layer.queries.detach().numpy()),
        "wk": jnp.asarray(layer.wk.detach().numpy()),
        "norm1": _ln(layer.norm1),
        "norm2": _ln(layer.norm2),
        "norm3": _ln(layer.norm3),
        "multihead_attn": _mha(layer.multihead_attn),
        "ff": {"linear1": _linear(layer.linear1),
               "linear2": _linear(layer.linear2)},
    }


def _vanilla_encoder_params(layer):
    return {
        "self_attn": _mha(layer.self_attn),
        "norm1": _ln(layer.norm1),
        "norm2": _ln(layer.norm2),
        "ff": {"linear1": _linear(layer.linear1),
               "linear2": _linear(layer.linear2)},
    }


def _vanilla_decoder_params(layer):
    return {
        "self_attn": _mha(layer.self_attn),
        "multihead_attn": _mha(layer.multihead_attn),
        "norm1": _ln(layer.norm1),
        "norm2": _ln(layer.norm2),
        "norm3": _ln(layer.norm3),
        "ff": {"linear1": _linear(layer.linear1),
               "linear2": _linear(layer.linear2)},
    }


@pytest.mark.parametrize("d_model,nhead,ff,t", [
    (D, H, FF, T),
    (256, 4, 1024, 35),  # production MDM size (`train_diffusion_smpl.py`)
])
def test_qan_encoder_layer_parity(rng, d_model, nhead, ff, t):
    layer = TransformerEncoderLayerQaN(
        d_model, nhead, dim_feedforward=ff, dropout=0.0, num_queries=NQ,
        activation="gelu")
    layer.eval()
    x = rng.standard_normal((t, B, d_model)).astype(np.float32)  # seq-first
    with torch.no_grad():
        ref = layer(torch.from_numpy(x)).numpy()

    ours = QaNEncoderLayer(d_model, nhead, ff, dropout=0.0,
                           activation="gelu", num_queries=NQ).apply(
        {"params": _qan_encoder_params(layer)},
        jnp.asarray(x.transpose(1, 0, 2)))  # ours is batch-first
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), ref,
                               atol=1e-4)


def test_qan_decoder_layer_parity(rng):
    layer = TransformerDecoderLayerQaN(
        D, H, dim_feedforward=FF, dropout=0.0, num_queries=NQ,
        activation="gelu")
    layer.eval()
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mem = rng.standard_normal((TM, B, D)).astype(np.float32)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x), torch.from_numpy(mem)).numpy()

    ours = QaNDecoderLayer(D, H, FF, dropout=0.0, activation="gelu",
                           num_queries=NQ).apply(
        {"params": _qan_decoder_params(layer)},
        jnp.asarray(x.transpose(1, 0, 2)),
        jnp.asarray(mem.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), ref,
                               atol=1e-4)


def test_mdm_encoder_stack_parity(rng):
    """Full 8-layer MDM encoder topology: 1 & 8 vanilla torch, 2-7 QaN
    (`model/diffusion_smpl.py:20-70`)."""
    torch.manual_seed(0)
    layers = ([torch.nn.TransformerEncoderLayer(D, H, FF, dropout=0.0,
                                                activation="gelu")]
              + [TransformerEncoderLayerQaN(D, H, dim_feedforward=FF,
                                            dropout=0.0, num_queries=NQ,
                                            activation="gelu")
                 for _ in range(6)]
              + [torch.nn.TransformerEncoderLayer(D, H, FF, dropout=0.0,
                                                  activation="gelu")])
    for l in layers:
        l.eval()
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        for l in layers:
            h = l(h)
        ref = h.numpy()

    params = {}
    for i, l in enumerate(layers):
        if isinstance(l, TransformerEncoderLayerQaN):
            params[f"layer_{i}"] = _qan_encoder_params(l)
        else:
            params[f"layer_{i}"] = _vanilla_encoder_params(l)
    stack = TransformerStack(D, H, FF, kinds=mdm_stack_kinds(8, cross=False),
                             dropout=0.0, activation="gelu")
    ours = stack.apply({"params": params}, jnp.asarray(x.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), ref,
                               atol=3e-4)


def test_mdm_decoder_stack_parity(rng):
    """Full 8-layer MDM decoder topology with cross-attention memory
    (`model/diffusion_smpl.py:72-175`, latent_usage='memory')."""
    torch.manual_seed(1)
    layers = ([torch.nn.TransformerDecoderLayer(D, H, FF, dropout=0.0,
                                                activation="gelu")]
              + [TransformerDecoderLayerQaN(D, H, dim_feedforward=FF,
                                            dropout=0.0, num_queries=NQ,
                                            activation="gelu")
                 for _ in range(6)]
              + [torch.nn.TransformerDecoderLayer(D, H, FF, dropout=0.0,
                                                  activation="gelu")])
    for l in layers:
        l.eval()
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    mem = rng.standard_normal((TM, B, D)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        for l in layers:
            h = l(h, torch.from_numpy(mem))
        ref = h.numpy()

    params = {}
    for i, l in enumerate(layers):
        if isinstance(l, TransformerDecoderLayerQaN):
            params[f"layer_{i}"] = _qan_decoder_params(l)
        else:
            params[f"layer_{i}"] = _vanilla_decoder_params(l)
    stack = TransformerStack(D, H, FF, kinds=mdm_stack_kinds(8, cross=True),
                             dropout=0.0, activation="gelu")
    ours = stack.apply({"params": params}, jnp.asarray(x.transpose(1, 0, 2)),
                       jnp.asarray(mem.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(ours).transpose(1, 0, 2), ref,
                               atol=3e-4)
