"""Train the SMPL-track MDM — `interdiff/train_diffusion_smpl.py` equivalent.

Usage:
  python -m interdiff_tpu.cli.train_diffusion_smpl --motion_path ... \
      --model_path <dir with SMPLH_{male,female}.pkl> \
      [--epochs N] [--batch_size 32] [--synthetic N_steps]
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
    parser.add_argument("--results_dir", default="./results/smpl_diffusion")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=25)
    parser.add_argument("--use_pointnet2", type=int, default=1)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--resume_checkpoint", default=None,
                        help="orbax ckpt dir to resume params from")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--val_every", type=int, default=50)
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    args = parser.parse_args()
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
        args.model_path = args.model_path or _paths.model_path
    if not args.synthetic and not (args.motion_path and args.model_path):
        parser.error("--motion_path and --model_path are required unless --synthetic is set")

    from interdiff_tpu.cli.common import (
        batch_iterator,
        make_mesh,
        seed_everything,
        synthetic_smpl_batches,
    )
    from interdiff_tpu.config import SmplTrackConfig
    from interdiff_tpu.models.mdm_smpl import MDMSmpl
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        data_parallel_step,
        make_smpl_train_step,
    )
    from interdiff_tpu.utils.train_io import CheckpointManager, MetricsLogger

    rng = seed_everything(args.seed)
    cfg = SmplTrackConfig(past_len=args.past_len, future_len=args.future_len,
                          use_pointnet2=bool(args.use_pointnet2))
    model = cfg.build_model()
    diffusion = cfg.diffusion.build()

    T = args.past_len + args.future_len
    gt0 = jnp.zeros((2, T, 144), jnp.float32)
    pts0 = jnp.zeros((2, 256, 6), jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), gt0, pts0,
                        jnp.zeros((2,), jnp.int32),
                        method=MDMSmpl.init_forward)

    if args.resume_checkpoint:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(args.resume_checkpoint))
        params = mgr.restore(mgr.latest_step(),
                             args=ocp.args.StandardRestore(params))
        print(f"resumed params from {args.resume_checkpoint} "
              f"@ step {mgr.latest_step()}")
    state = TrainState.create(params, adamw(args.lr))
    mesh = make_mesh()
    step = data_parallel_step(make_smpl_train_step(model, diffusion), mesh)

    from interdiff_tpu.cli.common import snapshot_sources

    snapshot_sources(args.results_dir, ["interdiff_tpu.models.mdm_smpl", "interdiff_tpu.train.trainer", "interdiff_tpu.train.losses", "interdiff_tpu.diffusion.gaussian"])
    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt"))
    logger = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))
    key = jax.random.PRNGKey(args.seed)

    def epoch_batches():
        if args.synthetic:
            return synthetic_smpl_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                steps=args.synthetic)
        from interdiff_tpu.data.behave import (
            BehaveDataset,
            collate,
            load_behave_sequences,
        )
        from interdiff_tpu.smpl.loader import smpl_model_from_pkl

        smpl_models = {
            g: smpl_model_from_pkl(os.path.join(args.model_path,
                                                f"SMPLH_{g}.pkl"))
            for g in ("male", "female")
        }
        seqs = load_behave_sequences(args.motion_path,
                                     smpl_models=smpl_models, mode="train")
        ds = BehaveDataset(seqs, past_len=args.past_len,
                           future_len=args.future_len, rng=rng)
        return batch_iterator(ds, collate, batch_size=args.batch_size,
                              rng=rng)

    keep = ("body_pose", "body_trans", "obj_angles", "obj_trans",
            "obj_points")
    i = 0
    for epoch in range(args.epochs if not args.synthetic else 1):
        from interdiff_tpu.utils.prefetch import threaded_batches

        def _placed():
            for b in threaded_batches(epoch_batches, num_workers=2):
                yield step.place_batch({k: jnp.asarray(b[k]) for k in keep})

        for batch in _placed():
            key, k_step = jax.random.split(key)
            state, metrics = step(state, batch, k_step)
            if i % 10 == 0:
                logger.log(i, {"loss": metrics["loss"]}, epoch=epoch)
                print(f"step {i} loss {float(metrics['loss']):.4f}")
            i += 1
        if (epoch + 1) % args.val_every == 0 or args.synthetic:
            ckpt.save(i, jax.device_get(state.params),
                      val_loss=float(metrics["loss"]))
    ckpt.wait()
    logger.close()
    print("done:", i, "steps")


if __name__ == "__main__":
    main()
