"""Load the two shipped reference checkpoints into our flax ObjProjectors
(`interdiff/checkpoints/correction.ckpt`, `obj_skeleton.ckpt`) and verify
structural parity: every torch tensor maps, shapes line up (flax errors on
any mismatch at apply time), and the forward runs finite."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

CKPT_SMPL = "/root/reference/interdiff/checkpoints/correction.ckpt"
CKPT_SKEL = "/root/reference/interdiff/checkpoints/obj_skeleton.ckpt"

needs_ckpts = pytest.mark.skipif(
    not (os.path.exists(CKPT_SMPL) and os.path.exists(CKPT_SKEL)),
    reason="reference checkpoints not mounted")


@needs_ckpts
def test_smpl_correction_checkpoint_loads_and_runs(rng):
    torch = pytest.importorskip("torch")
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.utils.checkpoint import (
        load_correction_smpl,
        load_lightning_state_dict,
    )

    variables, hp = load_correction_smpl(CKPT_SMPL)
    assert hp["num_verts"] == 67 and hp["past_len"] == 10

    # parameter census: every torch tensor except num_batches_tracked maps
    sd, _ = load_lightning_state_dict(CKPT_SMPL)
    n_torch = sum(v.size for k, v in sd.items()
                  if "num_batches_tracked" not in k)
    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
        (variables["params"], variables["batch_stats"])))
    assert n_ours == n_torch
    # trainable-parameter census (the ckpt's 196 tensors minus BN running
    # stats and num_batches_tracked counters)
    n_trainable = sum(int(np.prod(p.shape))
                      for p in jax.tree_util.tree_leaves(variables["params"]))
    n_torch_trainable = sum(
        v.size for k, v in sd.items()
        if "num_batches_tracked" not in k and "running_" not in k)
    assert n_trainable == n_torch_trainable == 224174

    proj = ObjProjectorSmpl(num_markers=67, n_pre=10, past_len=10,
                            future_len=25)
    B, T = 2, 35
    obj9 = jnp.asarray(rng.standard_normal((B, T, 9)).astype(np.float32))
    markers = jnp.asarray(
        rng.standard_normal((B, T, 67, 3)).astype(np.float32))
    contact = jnp.zeros((B, 67), jnp.float32)
    out = proj.apply(variables, obj9, markers, contact)
    assert out.shape == (B, T, 9)
    assert np.isfinite(np.asarray(out)).all()


@needs_ckpts
def test_skeleton_correction_checkpoint_loads_and_runs(rng):
    torch = pytest.importorskip("torch")
    from interdiff_tpu.models.correction import ObjProjectorSkeleton
    from interdiff_tpu.utils.checkpoint import (
        load_correction_skeleton,
        load_lightning_state_dict,
    )

    variables, hp = load_correction_skeleton(CKPT_SKEL)

    sd, _ = load_lightning_state_dict(CKPT_SKEL)
    n_torch = sum(v.size for k, v in sd.items()
                  if "num_batches_tracked" not in k)
    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
        (variables["params"], variables["batch_stats"])))
    assert n_ours == n_torch

    proj = ObjProjectorSkeleton(num_joints=21, past_len=10, future_len=10)
    B, T = 2, 20
    quat = rng.standard_normal((B, T, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    trans = rng.standard_normal((B, T, 3)).astype(np.float32)
    joints = rng.standard_normal((B, T, 21, 3)).astype(np.float32)
    quat_p, trans_p = proj.apply(variables, jnp.asarray(quat),
                                 jnp.asarray(trans), jnp.asarray(joints))
    assert quat_p.shape == (B, T, 4) and trans_p.shape == (B, T, 3)
    assert np.isfinite(np.asarray(quat_p)).all()
    assert np.isfinite(np.asarray(trans_p)).all()


@needs_ckpts
def test_unconsumed_keys_fail_loudly():
    """An unrecognised state-dict layout (extra tensors the converter does
    not map) must raise, not silently drop weights (ADVICE r3).  The real
    checkpoints must pass the same audit — their only unconsumed keys are
    deterministic buffers (`num_batches_tracked`)."""
    pytest.importorskip("torch")
    from interdiff_tpu.utils.checkpoint import (
        convert_obj_projector,
        load_lightning_state_dict,
    )

    sd, _ = load_lightning_state_dict(CKPT_SMPL)
    convert_obj_projector(dict(sd))  # clean checkpoint: audit passes

    sd["model.some_new_head.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_obj_projector(sd)


def test_mdm_unused_params_allowlisted():
    """The documented dead reference params (`finalLinear`,
    `bodyFutureEmbedding`, `objFutureEmbedding`,
    `model/diffusion_smpl.py:177-183`) and deterministic buffers (pe,
    rel_pos.inv_freq) pass the audit; anything else raises."""
    pytest.importorskip("torch")
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import test_reference_mdm_forward as T
    from interdiff_tpu.utils.checkpoint import convert_mdm_smpl

    import torch as th
    th.manual_seed(233)
    ref = T.ref_mdm_smpl.MDM(T._smpl_args())
    ref.pcEmbedding = th.nn.Linear(4, T.E)
    sd = T._sd(ref)
    convert_mdm_smpl(dict(sd))  # dead params + buffers allow-listed

    sd["model.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_mdm_smpl(sd)
