"""SMPL-track long-term autoregressive evaluation — completes what
`interdiff/eval_smpl_long.py` left unreleased (its `denormalize`/`correct`
are undefined in the reference; see interdiff_tpu/eval/smpl_long.py for the
design we shipped).

Usage:
  python -m interdiff_tpu.cli.eval_smpl_long --motion_path ... \
      --model_path <SMPLH pkl dir> --diffusion_ckpt <orbax dir> \
      [--rollouts 4] [--mode correction]
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--motion_path", default=None)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--diffusion_ckpt", default=None)
    parser.add_argument("--correction_ckpt",
                        default="/root/reference/interdiff/checkpoints/"
                                "correction.ckpt")
    parser.add_argument("--mode", default="no_correction",
                        choices=["correction", "no_correction"])
    parser.add_argument("--rollouts", type=int, default=4,
                        help="autoregressive future chunks after the first")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=25)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--respacing", default="",
                        help="timestep respacing, e.g. '100' or 'ddim50'")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    parser.add_argument("--out_dir", default="./results")
    parser.add_argument("--render_dir", default=None,
                        help="write a gif of rollout 0, sample 0 (full "
                             "autoregressive horizon)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="roll out N synthetic batches with a synthetic "
                             "SMPL body (no datasets/pkls needed)")
    parser.add_argument("--synthetic_body", action="store_true",
                        help="REAL motion data from --motion_path with the "
                             "synthetic stand-in body (SMPLH pkls are not "
                             "shipped in this image)")
    args = parser.parse_args()
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
        args.model_path = args.model_path or _paths.model_path
    if not args.synthetic and not (
            args.motion_path and (args.model_path or args.synthetic_body)):
        parser.error("--motion_path and --model_path are required "
                     "(or use --synthetic N / --synthetic_body)")

    from interdiff_tpu.cli.common import batch_iterator, seed_everything
    from interdiff_tpu.config import SmplTrackConfig
    from interdiff_tpu.data.behave import (
        BehaveDataset,
        collate,
        load_behave_sequences,
    )
    from interdiff_tpu.eval.smpl_long import rollout
    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig,
        make_sampler,
        postprocess_sample,
    )
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw
    from interdiff_tpu.smpl.model import smpl_forward

    rng = seed_everything(args.seed)
    cfg = SmplEvalConfig(past_len=args.past_len, future_len=args.future_len)
    from interdiff_tpu.config import DiffusionConfig

    track = SmplTrackConfig(
        past_len=args.past_len, future_len=args.future_len,
        diffusion=DiffusionConfig(timestep_respacing=args.respacing))
    model = track.build_model()
    diffusion = track.diffusion.build()

    if args.synthetic:
        from interdiff_tpu.cli.common import synthetic_smpl_body

        smpl = synthetic_smpl_body(rng)
        smpl_models = {"male": smpl, "female": smpl}
    else:
        from interdiff_tpu.cli.common import load_smpl_models

        smpl_models = load_smpl_models(args)
        smpl = smpl_models["male"]

    T = cfg.seq_len
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, T, 144)),
        jnp.zeros((2, 256, 6)), jnp.zeros((2,), jnp.int32),
        method=MDMSmpl.init_forward)
    if args.diffusion_ckpt:
        from interdiff_tpu.cli.common import restore_params

        params = restore_params(args.diffusion_ckpt, params)

    projector = projector_params = None
    if args.mode == "correction":
        from interdiff_tpu.cli.common import load_correction_variables

        projector = ObjProjectorSmpl(past_len=args.past_len,
                                     future_len=args.future_len)
        projector_params = load_correction_variables(
            args.correction_ckpt, kind="smpl")

    import functools

    sample = functools.partial(jax.jit(make_sampler(
        cfg, model, diffusion, smpl=smpl, projector=projector,
        projector_params=projector_params,
        use_correction=args.mode == "correction")), params)

    @jax.jit
    def pelvis_fn(x, hand, betas):
        # jitted: eager FK dispatches op-by-op over the TPU tunnel
        return postprocess_sample(cfg, smpl, x, hand, betas)["pelvis"]

    if args.synthetic:
        from interdiff_tpu.cli.common import synthetic_smpl_batches

        loader = synthetic_smpl_batches(
            rng, batch_size=args.batch_size, seq_len=T, num_points=512,
            steps=args.synthetic)
    else:
        from interdiff_tpu.cli.common import fit_batch_size, load_eval_sequences

        seqs = load_eval_sequences(args.motion_path, smpl_models)
        # the eval loop consumes only pose streams + the point-cloud
        # template (contacts are recomputed in-scan) -> light fields
        ds = BehaveDataset(seqs, past_len=args.past_len,
                           future_len=args.future_len, rng=rng,
                           fields="light")
        args.batch_size = fit_batch_size(len(ds), args.batch_size)
        loader = batch_iterator(ds, collate, batch_size=args.batch_size,
                                rng=rng, shuffle=False)

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    for i, batch in enumerate(loader):
        gt = smpl_gt_from_raw(
            jnp.asarray(batch["body_pose"][..., :66]),
            jnp.asarray(batch["body_trans"]),
            jnp.asarray(batch["obj_angles"]),
            jnp.asarray(batch["obj_trans"]))
        obj_points6 = jnp.asarray(batch["obj_points"][..., :6])
        hand = jnp.asarray(batch["body_pose"][..., 66:])
        betas = jnp.asarray(batch["body_betas"])
        key, k = jax.random.split(key)
        full = rollout(sample, pelvis_fn, k, gt, obj_points6, hand, betas,
                       num_chunks=args.rollouts, cfg=cfg)
        print(f"batch {i}: rolled out {full.shape[1]} frames "
              f"({1 + args.rollouts} windows)")
        np.save(os.path.join(args.out_dir, f"rollout_{i}.npy"),
                np.asarray(full))
        if args.render_dir:
            _render_rollout(args, cfg, smpl, full, hand, betas,
                            batch["obj_points"], i)
        if i >= 2:
            break


def _render_rollout(args, cfg, smpl, full, hand, betas, obj_points, i):
    """Render sample 0 of the full autoregressive horizon (past window +
    every rolled-out future chunk) as a 4-yaw-view mesh gif.  Hand poses and
    betas beyond the first window are held at their last ground-truth frame
    — the rollout states carry only the 144-dim body+object stream."""
    from interdiff_tpu.geometry.rotations import (
        matrix_to_axis_angle,
        rotation_6d_to_matrix,
    )
    from interdiff_tpu.smpl.model import smpl_forward
    from interdiff_tpu.viz.mesh_viz import visualize_body_obj

    @jax.jit
    def fk(full, hand, betas):
        B, Tf = full.shape[:2]
        body, obj = full[..., :135], full[..., 135:]
        body_aa = matrix_to_axis_angle(rotation_6d_to_matrix(
            body[..., :-3].reshape(B, Tf, -1, 6))).reshape(B, Tf, -1)

        def pad_t(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[:, -1:], Tf - x.shape[1], axis=1)], axis=1)

        pose = jnp.concatenate([body_aa, pad_t(hand)], axis=-1)
        verts, _, _, _ = smpl_forward(
            smpl, pose.reshape(B * Tf, -1),
            pad_t(betas).reshape(B * Tf, -1),
            body[..., -3:].reshape(B * Tf, 3))
        return (verts.reshape(B, Tf, -1, 3),
                rotation_6d_to_matrix(obj[..., :6]), obj[..., 6:9])

    verts, obj_rot, obj_trans = fk(full, jnp.asarray(hand),
                                   jnp.asarray(betas))
    tpl = np.asarray(obj_points[0, :, :3])
    obj_verts = (np.einsum("tij,pj->tpi", np.asarray(obj_rot[0]), tpl)
                 + np.asarray(obj_trans[0])[:, None])
    os.makedirs(args.render_dir, exist_ok=True)
    visualize_body_obj(
        np.asarray(verts[0]), np.asarray(smpl.faces), obj_verts, None,
        past_len=args.past_len,
        save_path=os.path.join(args.render_dir, f"rollout{i}.gif"))


if __name__ == "__main__":
    main()
