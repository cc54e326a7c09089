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


def test_shared_mlp_train_mode_bn_matches_torch(rng):
    """VERDICT r4 item 6: train-mode BN semantics.  SharedMLP with
    train=True (mutable batch_stats) vs the torch chain pointnet2_ops'
    `build_shared_mlp` builds (Conv2d 1x1 no-bias + BatchNorm2d + ReLU) in
    TRAIN mode: outputs bit-comparable, running-mean updates equal, and
    running-var updates equal up to torch's unbiased n/(n-1) factor (the
    one documented deviation — flax updates with the biased batch variance;
    at the production reduction count B*M*S ~ 5e5 the ratio is 1+2e-6)."""
    from interdiff_tpu.models.pointnet import SharedMLP

    B, M, S, CIN = 2, 8, 4, 6
    chans = (8, 16)
    x = rng.standard_normal((B, M, S, CIN)).astype(np.float32)

    t_layers = []
    for cin, cout in zip((CIN,) + chans[:-1], chans):
        conv = torch.nn.Conv2d(cin, cout, 1, bias=False)
        bn = torch.nn.BatchNorm2d(cout)  # momentum 0.1 == flax 0.9
        t_layers += [conv, bn, torch.nn.ReLU()]
    t_mlp = torch.nn.Sequential(*t_layers)
    t_mlp.train()
    # torch layout: [B, C, M, S]
    with torch.no_grad():
        ref = t_mlp(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    mod = SharedMLP(chans)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"params": {}, "batch_stats": {}}
    for i, (conv, bn) in enumerate(
            (t_layers[3 * j], t_layers[3 * j + 1])
            for j in range(len(chans))):
        params["params"][f"conv{i}"] = {
            "kernel": jnp.asarray(
                conv.weight.detach().numpy()[:, :, 0, 0].T)}
        params["params"][f"bn{i}"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy())}
        params["batch_stats"][f"bn{i}"] = {
            "mean": jnp.zeros(bn.num_features),
            "var": jnp.ones(bn.num_features)}

    out, new_state = mod.apply(params, jnp.asarray(x), train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    n = B * M * S  # reduction count per channel
    for i in range(len(chans)):
        bn = t_layers[3 * i + 1]
        np.testing.assert_allclose(
            np.asarray(new_state["batch_stats"][f"bn{i}"]["mean"]),
            bn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
        # torch running-var update uses the UNBIASED batch variance
        flax_var = np.asarray(new_state["batch_stats"][f"bn{i}"]["var"])
        torch_var_biased = (bn.running_var.numpy() - 0.9) / 0.1 \
            * (n - 1) / n * 0.1 + 0.9
        np.testing.assert_allclose(flax_var, torch_var_biased,
                                   rtol=1e-4, atol=1e-6)
