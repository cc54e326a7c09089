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
    tree = {"params": {"core": params}, "batch_stats": {"core": stats}}
    return _to_f32(tree)


def _to_f32(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float32), tree)


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
