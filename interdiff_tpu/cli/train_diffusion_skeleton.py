"""Train the skeleton-track MDM — `interdiff/train_diffusion_skeleton.py`
equivalent (optax AdamW, pjit data-parallel, orbax checkpoints, JSONL
metrics; validation runs the full inpainting sampler like the reference's
`validation_step`, `train_diffusion_skeleton.py:272-295`).

Usage:
  python -m interdiff_tpu.cli.train_diffusion_skeleton --motion_path ... \
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
    parser.add_argument("--results_dir", default="./results/skeleton_diffusion")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=10)
    parser.add_argument("--ff_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="run N synthetic steps (no data needed)")
    parser.add_argument("--val_every", type=int, default=10)
    args = parser.parse_args()
    if not args.synthetic and not args.motion_path:
        parser.error("--motion_path is required unless --synthetic is set")

    from interdiff_tpu.cli.common import (
        batch_iterator,
        make_mesh,
        seed_everything,
        synthetic_skeleton_batches,
    )
    from interdiff_tpu.config import DiffusionConfig, SkeletonTrackConfig
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        data_parallel_step,
        make_skeleton_train_step,
    )
    from interdiff_tpu.utils.train_io import CheckpointManager, MetricsLogger

    rng = seed_everything(args.seed)
    cfg = SkeletonTrackConfig(past_len=args.past_len,
                              future_len=args.future_len,
                              ff_size=args.ff_size)
    model = cfg.build_model()
    diffusion = cfg.diffusion.build()

    T = args.past_len + args.future_len
    ex = next(synthetic_skeleton_batches(rng, batch_size=2, seq_len=T))
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(ex["skeleton"]), jnp.asarray(ex["obj_points"]),
        jnp.asarray(ex["poses"]), jnp.asarray(ex["zero_pose_obj"]),
        jnp.zeros((2,), jnp.int32), method=MDMSkeleton.init_forward)

    state = TrainState.create(params, adamw(args.lr))
    mesh = make_mesh()
    step = data_parallel_step(make_skeleton_train_step(model, diffusion), mesh)

    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt"))
    logger = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))

    key = jax.random.PRNGKey(args.seed)

    def epoch_batches():
        if args.synthetic:
            return synthetic_skeleton_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                steps=args.synthetic)
        from interdiff_tpu.data.skeleton import (
            collate_skeleton,
            load_skeleton_datasets,
        )

        train, _, _, _ = load_skeleton_datasets(args.motion_path)
        return batch_iterator(train, collate_skeleton,
                              batch_size=args.batch_size, rng=rng)

    i = 0
    for epoch in range(args.epochs if not args.synthetic else 1):
        for batch in epoch_batches():
            batch = step.place_batch(
                {k: jnp.asarray(v) for k, v in batch.items()})
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
