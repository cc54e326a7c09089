"""Torch (PyTorch-Lightning) checkpoint -> flax parameter conversion.

The reference ships two Lightning checkpoints
(`interdiff/checkpoints/correction.ckpt` — SMPL ObjProjector, and
`obj_skeleton.ckpt` — skeleton ObjProjector; SURVEY.md §2 item 32).  This
module maps their ``state_dict`` onto our
:class:`interdiff_tpu.models.correction.ObjProjector*` parameter trees for
numerical-parity evaluation, and converts generic Lightning MDM checkpoints
should the user supply them (the diffusion ckpts are absent from the
snapshot).

Key mapping for one ST-GCNN layer (`interdiff/model/layers.py:271-345`):

  torch `...{i}.gcn.T / .gcn.A`          -> `gcn{i}/gcn/T|A` (same layout)
  torch `...{i}.tcn.0.weight [O,I,1,1]`  -> `gcn{i}/tcn_conv/kernel [I,O]`
  torch `...{i}.tcn.1.*` (BatchNorm2d)   -> `gcn{i}/tcn_bn` scale/bias +
                                            batch_stats mean/var
  torch `...{i}.residual.0/1.*`          -> `gcn{i}/res_conv`, `res_bn`
  torch `...{i}.prelu.weight [1]`        -> `gcn{i}/prelu` scalar
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_lightning_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a Lightning ckpt -> (numpy state_dict, hparams). Host-side torch."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ck["state_dict"].items()}
    return sd, dict(ck.get("hyper_parameters", {}))


def _conv1x1_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, 1, 1] -> Dense kernel [I, O]."""
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _stgcnn_layer(sd: Dict[str, np.ndarray], prefix: str,
                  has_residual_conv: bool) -> Tuple[Dict, Dict]:
    """One torch ST_GCNN_layer -> (params, batch_stats) subtree."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    gcn: Dict[str, Any] = {}
    if f"{prefix}.gcn.T" in sd:
        gcn["T"] = sd[f"{prefix}.gcn.T"]
    if f"{prefix}.gcn.A" in sd:
        gcn["A"] = sd[f"{prefix}.gcn.A"]
    if f"{prefix}.gcn.S" in sd:
        gcn["S"] = sd[f"{prefix}.gcn.S"]
    params["gcn"] = gcn

    params["tcn_conv"] = {
        "kernel": _conv1x1_kernel(sd[f"{prefix}.tcn.0.weight"]),
        "bias": sd[f"{prefix}.tcn.0.bias"],
    }
    params["tcn_bn"] = {
        "scale": sd[f"{prefix}.tcn.1.weight"],
        "bias": sd[f"{prefix}.tcn.1.bias"],
    }
    stats["tcn_bn"] = {
        "mean": sd[f"{prefix}.tcn.1.running_mean"],
        "var": sd[f"{prefix}.tcn.1.running_var"],
    }
    if has_residual_conv:
        params["res_conv"] = {
            "kernel": _conv1x1_kernel(sd[f"{prefix}.residual.0.weight"]),
            "bias": sd[f"{prefix}.residual.0.bias"],
        }
        params["res_bn"] = {
            "scale": sd[f"{prefix}.residual.1.weight"],
            "bias": sd[f"{prefix}.residual.1.bias"],
        }
        stats["res_bn"] = {
            "mean": sd[f"{prefix}.residual.1.running_mean"],
            "var": sd[f"{prefix}.residual.1.running_var"],
        }
    params["prelu"] = sd[f"{prefix}.prelu.weight"].reshape(())
    return params, stats


def convert_obj_projector(sd: Dict[str, np.ndarray], *,
                          torch_prefix: str = "model.",
                          channels: Tuple[int, ...] = (9, 32, 16, 32, 9),
                          fusion_channels: Tuple[int, ...] = (9, 32, 16, 32, 9),
                          ) -> Dict[str, Any]:
    """state_dict -> flax ``{'params': ..., 'batch_stats': ...}`` for
    :class:`ObjProjectorCore` wrapped under ``core`` (matches the module
    trees of ObjProjectorSmpl / ObjProjectorSkeleton)."""
    sd = _TrackedSD(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for stack, chans in (("st_gcnns_relative", channels),
                         ("st_gcnns", channels),
                         ("st_gcnns_all", fusion_channels)):
        p_stack: Dict[str, Any] = {}
        s_stack: Dict[str, Any] = {}
        for i in range(len(chans) - 1):
            has_res = chans[i] != chans[i + 1]
            p, s = _stgcnn_layer(sd, f"{torch_prefix}{stack}.{i}", has_res)
            p_stack[f"gcn{i}"] = p
            s_stack[f"gcn{i}"] = s
        params[stack] = p_stack
        stats[stack] = s_stack
    _assert_all_consumed(sd, torch_prefix=torch_prefix)
    tree = {"params": {"core": params}, "batch_stats": {"core": stats}}
    return _to_f32(tree)


def _to_f32(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float32), tree)


# ---------------------------------------------------------------------------
# MDM (diffusion denoiser) checkpoints
# ---------------------------------------------------------------------------
#
# The reference trains `MDM` inside `LitInteraction` (`self.model`,
# `train_diffusion_smpl.py:40`), so Lightning state-dict keys carry the
# `model.` prefix exactly like the correction ckpts.  The snapshot ships no
# diffusion ckpts (`.MISSING_LARGE_BLOBS`), but users following
# `interdiff/README.md` can supply them — these converters map either track
# onto :class:`interdiff_tpu.models.mdm_smpl.MDMSmpl` /
# :class:`interdiff_tpu.models.mdm_skeleton.MDMSkeleton` parameter trees.
#
# Reference parameters that are constructed but never used by the forward
# pass (`finalLinear`, `bodyFutureEmbedding`, `objFutureEmbedding`,
# `model/diffusion_smpl.py:177-183`) are deliberately dropped.

_MDM_UNUSED = ("finalLinear.", "bodyFutureEmbedding", "objFutureEmbedding")

# Deterministic buffers the reference registers in its state_dict but that we
# recompute from hyper-parameters (sinusoidal tables, QaN rotary frequencies,
# BatchNorm step counters) — never converted, always allowed to remain.
_DETERMINISTIC_BUFFER_SUFFIXES = (
    ".pe",                    # PositionalEncoding (`model/layers.py`)
    ".rel_pos.inv_freq",      # LocalAttention rotary table (QaN layers)
    ".num_batches_tracked",   # torch BatchNorm counter
)


class _TrackedSD(dict):
    """state_dict wrapper that records which keys conversion consumed.

    Membership probes (``in``) intentionally do NOT count as consumption —
    only actual weight reads do — so layout detection can't mask a dropped
    tensor.
    """

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def _assert_all_consumed(sd: "_TrackedSD", *, torch_prefix: str,
                         unused_prefixes: Tuple[str, ...] = ()) -> None:
    """Raise if any state-dict key was neither converted nor allow-listed.

    A checkpoint with an unrecognised layout (extra/misplaced weights) must
    fail loudly here instead of silently dropping tensors — missing keys
    already KeyError inside the converters, this closes the other direction
    (ADVICE r3)."""
    allowed = tuple(torch_prefix + p for p in unused_prefixes)
    leftovers = sorted(
        k for k in sd
        if k not in sd.consumed
        and not k.endswith(_DETERMINISTIC_BUFFER_SUFFIXES)
        and not k.startswith(allowed))
    if leftovers:
        raise ValueError(
            f"checkpoint conversion left {len(leftovers)} state-dict key(s) "
            f"unconsumed (unrecognised layout?): {leftovers[:8]}"
            + (" ..." if len(leftovers) > 8 else ""))


def _linear_p(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense (kernel transposed)."""
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
            "bias": sd[f"{key}.bias"]}


def _ln_p(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _mha_p(sd: Dict[str, np.ndarray], key: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> TorchMHA (packed in_proj kept)."""
    return {"in_proj_kernel": np.ascontiguousarray(
                sd[f"{key}.in_proj_weight"].T),
            "in_proj_bias": sd[f"{key}.in_proj_bias"],
            "out_proj": _linear_p(sd, f"{key}.out_proj")}


def _mdm_stack_params(sd: Dict[str, np.ndarray], prefix: str,
                      num_layers: int, cross: bool) -> Dict[str, Any]:
    """One reference TransformerEncoder/Decoder stack (`model/layers.py:
    177-269`; MDM topology: layers 1 & N vanilla, 2..N-1 QaN,
    `model/diffusion_smpl.py:20-127`) -> our TransformerStack params."""
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        p: Dict[str, Any] = {
            "norm1": _ln_p(sd, f"{lp}.norm1"),
            "norm2": _ln_p(sd, f"{lp}.norm2"),
            "ff": {"linear1": _linear_p(sd, f"{lp}.linear1"),
                   "linear2": _linear_p(sd, f"{lp}.linear2")},
        }
        if i in (0, num_layers - 1):  # vanilla torch layer
            p["self_attn"] = _mha_p(sd, f"{lp}.self_attn")
        else:  # QaN layer (`sublayers.py:37-375`)
            p["queries"] = sd[f"{lp}.queries"]
            p["wk"] = sd[f"{lp}.wk"]
        if cross:  # decoder layers add cross-attention + norm3
            p["norm3"] = _ln_p(sd, f"{lp}.norm3")
            p["multihead_attn"] = _mha_p(sd, f"{lp}.multihead_attn")
        out[f"layer_{i}"] = p
    return out


def _pointnet_params(sd: Dict[str, np.ndarray],
                     prefix: str) -> Tuple[Dict, Dict]:
    """pointnet2_ops `PointnetSAModuleMSG` weights -> our PointNet2Encoder.

    The CUDA package's `build_shared_mlp` emits Sequential indices
    (conv, bn, relu) per stage, i.e. torch keys
    `SA_modules.{i}.mlps.{s}.{3k}.weight` (Conv2d 1x1, bias-free) and
    `.{3k+1}.*` (BatchNorm2d) -> our `sa{i}/mlp{s}/conv{k}` + `bn{k}`.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (0, 1):
        sa_p: Dict[str, Any] = {}
        sa_s: Dict[str, Any] = {}
        for s in (0, 1):
            mp: Dict[str, Any] = {}
            ms: Dict[str, Any] = {}
            k = 0
            while f"{prefix}.SA_modules.{i}.mlps.{s}.{3 * k}.weight" in sd:
                seq = f"{prefix}.SA_modules.{i}.mlps.{s}"
                mp[f"conv{k}"] = {
                    "kernel": _conv1x1_kernel(sd[f"{seq}.{3 * k}.weight"])}
                mp[f"bn{k}"] = {"scale": sd[f"{seq}.{3 * k + 1}.weight"],
                                "bias": sd[f"{seq}.{3 * k + 1}.bias"]}
                ms[f"bn{k}"] = {
                    "mean": sd[f"{seq}.{3 * k + 1}.running_mean"],
                    "var": sd[f"{seq}.{3 * k + 1}.running_var"]}
                k += 1
            if not mp:
                raise KeyError(
                    f"no shared-MLP weights under {prefix}.SA_modules.{i}."
                    f"mlps.{s} — unrecognised pointnet2 checkpoint layout")
            sa_p[f"mlp{s}"] = mp
            sa_s[f"mlp{s}"] = ms
        params[f"sa{i}"] = sa_p
        stats[f"sa{i}"] = sa_s
    params["Linear"] = _linear_p(sd, f"{prefix}.Linear")
    return params, stats


def convert_mdm_smpl(sd: Dict[str, np.ndarray], *,
                     torch_prefix: str = "model.",
                     num_layers: int = 8,
                     latent_usage: str = "memory") -> Dict[str, Any]:
    """Reference SMPL-track `MDM` state_dict (`model/diffusion_smpl.py:
    8-246`) -> flax variables for :class:`MDMSmpl`.

    Detects the object-cloud embedding flavour from the keys: a 2-D
    `pcEmbedding.weight` is the `use_pointnet2=0` Linear path
    (`diffusion_smpl.py:14`), otherwise the PointNet++ set-abstraction
    weights are mapped (with BatchNorm running stats into `batch_stats`).
    """
    sd = _TrackedSD(sd)
    P = torch_prefix
    params: Dict[str, Any] = {
        "bodyEmbedding": _linear_p(sd, f"{P}bodyEmbedding"),
        "objEmbedding": _linear_p(sd, f"{P}objEmbedding"),
        "embedTimeStep": {
            "fc1": _linear_p(sd, f"{P}embedTimeStep.time_embed.0"),
            "fc2": _linear_p(sd, f"{P}embedTimeStep.time_embed.2")},
        "encoder": _mdm_stack_params(sd, f"{P}encoder", num_layers,
                                     cross=False),
        "decoder": _mdm_stack_params(sd, f"{P}decoder", num_layers,
                                     cross=latent_usage == "memory"),
        "bodyFinalLinear": _linear_p(sd, f"{P}bodyFinalLinear"),
        "objFinalLinear": _linear_p(sd, f"{P}objFinalLinear"),
    }
    tree: Dict[str, Any] = {"params": params}
    if f"{P}pcEmbedding.weight" in sd and sd[f"{P}pcEmbedding.weight"].ndim == 2:
        params["pcEmbedding"] = _linear_p(sd, f"{P}pcEmbedding")
    else:
        pc_p, pc_s = _pointnet_params(sd, f"{P}pcEmbedding")
        params["pcEmbedding"] = pc_p
        tree["batch_stats"] = {"pcEmbedding": pc_s}
    _assert_all_consumed(sd, torch_prefix=P, unused_prefixes=_MDM_UNUSED)
    return _to_f32(tree)


def convert_mdm_skeleton(sd: Dict[str, np.ndarray], *,
                         torch_prefix: str = "model.",
                         num_layers: int = 8,
                         latent_usage: str = "memory") -> Dict[str, Any]:
    """Reference skeleton-track `MDM` state_dict
    (`model/diffusion_skeleton.py:7-257`) -> flax variables for
    :class:`MDMSkeleton` (body Linear 63->E, shape/obj Linear 36->E,
    7-D pose head)."""
    sd = _TrackedSD(sd)
    P = torch_prefix
    params: Dict[str, Any] = {
        "bodyEmbedding": _linear_p(sd, f"{P}bodyEmbedding"),
        "shapeEmbedding": _linear_p(sd, f"{P}shapeEmbedding"),
        "objEmbedding": _linear_p(sd, f"{P}objEmbedding"),
        "embedTimeStep": {
            "fc1": _linear_p(sd, f"{P}embedTimeStep.time_embed.0"),
            "fc2": _linear_p(sd, f"{P}embedTimeStep.time_embed.2")},
        "encoder": _mdm_stack_params(sd, f"{P}encoder", num_layers,
                                     cross=False),
        "decoder": _mdm_stack_params(sd, f"{P}decoder", num_layers,
                                     cross=latent_usage == "memory"),
        "bodyFinalLinear": _linear_p(sd, f"{P}bodyFinalLinear"),
        "objFinalLinear": _linear_p(sd, f"{P}objFinalLinear"),
    }
    _assert_all_consumed(sd, torch_prefix=P, unused_prefixes=_MDM_UNUSED)
    return _to_f32({"params": params})


def load_mdm_smpl(path: str):
    """Lightning MDM ckpt (SMPL track) -> (flax variables, hparams).

    The returned hparams drive module construction; use
    :func:`mdm_smpl_from_checkpoint` to also get a correctly-configured
    :class:`MDMSmpl` (notably ``fps_groups=1`` — exact CUDA
    `furthest_point_sample` selection order — whenever the checkpoint was
    trained with the reference's pointnet2 encoder, so the keypoint
    selection matches training)."""
    sd, hp = load_lightning_state_dict(path)
    return convert_mdm_smpl(
        sd,
        num_layers=int(hp.get("num_layers", 8)),
        latent_usage=hp.get("latent_usage", "memory")), hp


def mdm_smpl_from_checkpoint(path: str):
    """-> (MDMSmpl module, flax variables, hparams) in parity mode.

    Parity mode forces exact FPS (``fps_groups=1``) for pointnet2-trained
    checkpoints: `hierarchical_fps` is a throughput-optimised selection-order
    deviation (`models/pointnet.py`) that is only safe for weights trained
    under it."""
    from interdiff_tpu.models.mdm_smpl import MDMSmpl

    variables, hp = load_mdm_smpl(path)
    use_pn2 = "batch_stats" in variables
    model = MDMSmpl(
        smpl_dim=int(hp.get("smpl_dim", 132)),
        embed_dim=int(hp.get("embedding_dim", 256)),
        num_heads=int(hp.get("num_heads", 4)),
        ff_size=int(hp.get("ff_size", 1024)),
        num_layers=int(hp.get("num_layers", 8)),
        dropout=0.0,
        activation=hp.get("activation", "gelu"),
        past_len=int(hp.get("past_len", 10)),
        future_len=int(hp.get("future_len", 25)),
        latent_usage=hp.get("latent_usage", "memory"),
        use_pointnet2=use_pn2,
        fps_groups=1)
    return model, variables, hp


def load_mdm_skeleton(path: str):
    """Lightning MDM ckpt (skeleton track) -> (flax variables, hparams)."""
    sd, hp = load_lightning_state_dict(path)
    return convert_mdm_skeleton(
        sd,
        num_layers=int(hp.get("num_layers", 8)),
        latent_usage=hp.get("latent_usage", "memory")), hp


def mdm_skeleton_from_checkpoint(path: str):
    """-> (MDMSkeleton module, flax variables, hparams): the skeleton-track
    twin of :func:`mdm_smpl_from_checkpoint` (module built from the embedded
    hyper_parameters)."""
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton

    variables, hp = load_mdm_skeleton(path)
    model = MDMSkeleton(
        embed_dim=int(hp.get("embedding_dim", 256)),
        num_heads=int(hp.get("num_heads", 4)),
        ff_size=int(hp.get("ff_size", 256)),
        num_layers=int(hp.get("num_layers", 8)),
        past_len=int(hp.get("past_len", 10)),
        latent_usage=hp.get("latent_usage", "memory"))
    return model, variables, hp


def load_correction_smpl(path: str = "/root/reference/interdiff/checkpoints/"
                                      "correction.ckpt"):
    """-> (flax variables, hparams) for :class:`ObjProjectorSmpl`."""
    sd, hp = load_lightning_state_dict(path)
    return convert_obj_projector(sd), hp


def load_correction_skeleton(path: str = "/root/reference/interdiff/"
                                          "checkpoints/obj_skeleton.ckpt"):
    """-> (flax variables, hparams) for :class:`ObjProjectorSkeleton`
    (fusion stack 9-64-32-64-9, `correction_skeleton.py:39-50`)."""
    sd, hp = load_lightning_state_dict(path)
    return convert_obj_projector(
        sd, fusion_channels=(9, 64, 32, 64, 9)), hp
