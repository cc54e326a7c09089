"""Golden parity: our flax EncoderLayer / DecoderLayer vs real torch
`nn.TransformerEncoderLayer` / `nn.TransformerDecoderLayer` with identical
weights — these are the vanilla layers 1 and 8 of every MDM stack
(`interdiff/model/diffusion_smpl.py:20-70`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from interdiff_tpu.models.layers import DecoderLayer, EncoderLayer  # noqa: E402

D, H, FF = 32, 4, 64


def _torch_mha_params(mha, prefix=""):
    return {
        "in_proj_kernel": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
        "in_proj_bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        "out_proj": {
            "kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }


def _ln(ln):
    return {"scale": jnp.asarray(ln.weight.detach().numpy()),
            "bias": jnp.asarray(ln.bias.detach().numpy())}


def _linear(lin):
    return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def test_encoder_layer_parity(rng):
    t_layer = torch.nn.TransformerEncoderLayer(
        D, H, FF, dropout=0.0, activation="gelu", batch_first=True)
    t_layer.eval()
    x = rng.standard_normal((2, 7, D)).astype(np.float32)
    with torch.no_grad():
        ref = t_layer(torch.from_numpy(x)).numpy()

    params = {"params": {
        "self_attn": _torch_mha_params(t_layer.self_attn),
        "norm1": _ln(t_layer.norm1),
        "norm2": _ln(t_layer.norm2),
        "ff": {"linear1": _linear(t_layer.linear1),
               "linear2": _linear(t_layer.linear2)},
    }}
    ours = EncoderLayer(D, H, FF, dropout=0.0, activation="gelu").apply(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_decoder_layer_parity(rng):
    t_layer = torch.nn.TransformerDecoderLayer(
        D, H, FF, dropout=0.0, activation="gelu", batch_first=True)
    t_layer.eval()
    x = rng.standard_normal((2, 7, D)).astype(np.float32)
    mem = rng.standard_normal((2, 5, D)).astype(np.float32)
    with torch.no_grad():
        ref = t_layer(torch.from_numpy(x), torch.from_numpy(mem)).numpy()

    params = {"params": {
        "self_attn": _torch_mha_params(t_layer.self_attn),
        "multihead_attn": _torch_mha_params(t_layer.multihead_attn),
        "norm1": _ln(t_layer.norm1),
        "norm2": _ln(t_layer.norm2),
        "norm3": _ln(t_layer.norm3),
        "ff": {"linear1": _linear(t_layer.linear1),
               "linear2": _linear(t_layer.linear2)},
    }}
    ours = DecoderLayer(D, H, FF, dropout=0.0, activation="gelu").apply(
        params, jnp.asarray(x), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
