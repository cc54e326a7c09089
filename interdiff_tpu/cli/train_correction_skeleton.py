"""Train the skeleton-track ObjProjector — `interdiff/train_correction_skeleton.py`
equivalent (Adam, quaternion-space 8-term loss).

Usage:
  python -m interdiff_tpu.cli.train_correction_skeleton --motion_path ... \
      [--epochs 500] [--synthetic N_steps]
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
    parser.add_argument("--results_dir",
                        default="./results/skeleton_correction")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=10)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    from interdiff_tpu.cli.common import add_profiler_args

    add_profiler_args(parser)
    args = parser.parse_args()
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
    if not args.synthetic and not args.motion_path:
        parser.error("--motion_path is required unless --synthetic is set")

    from interdiff_tpu.cli.common import (
        batch_iterator,
        make_mesh,
        seed_everything,
        synthetic_skeleton_batches,
    )
    from interdiff_tpu.models.correction import ObjProjectorSkeleton
    from interdiff_tpu.train.trainer import (
        CorrectionTrainState,
        data_parallel_step,
        make_correction_skeleton_train_step,
    )
    import optax

    from interdiff_tpu.utils.train_io import CheckpointManager, MetricsLogger

    rng = seed_everything(args.seed)
    T = args.past_len + args.future_len
    projector = ObjProjectorSkeleton(past_len=args.past_len,
                                     future_len=args.future_len)

    ex = next(synthetic_skeleton_batches(rng, batch_size=2, seq_len=T))
    variables = projector.init(
        jax.random.PRNGKey(args.seed), jnp.asarray(ex["poses"][..., 3:7]),
        jnp.asarray(ex["poses"][..., :3]), jnp.asarray(ex["skeleton"]))
    state = CorrectionTrainState.create(variables, optax.adam(args.lr))
    mesh = make_mesh(batch_size=args.batch_size)
    step = data_parallel_step(
        make_correction_skeleton_train_step(projector), mesh,
        extra_args=2)

    from interdiff_tpu.cli.common import snapshot_sources

    snapshot_sources(args.results_dir, ["interdiff_tpu.models.correction", "interdiff_tpu.train.losses_correction"])
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

    from interdiff_tpu.cli.common import TrainProfiler

    prof = TrainProfiler(args, args.results_dir)
    i = 0
    for epoch in range(args.epochs if not args.synthetic else 1):
        for batch in epoch_batches():
            with prof.section("batch_place"):
                batch = step.place_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()})
            key, k_step = jax.random.split(key)
            with prof.section("train_step"):
                state, metrics = step(state, batch, k_step,
                                      jnp.asarray(epoch, jnp.float32))
            if i % 10 == 0:
                logger.log(i, {"loss": metrics["loss"]}, epoch=epoch)
                print(f"step {i} loss {float(metrics['loss']):.4f}")
            i += 1
        if (epoch + 1) % 40 == 0 or args.synthetic:  # every-40-epochs ckpt
            ckpt.save(i, jax.device_get(
                {"params": state.params,
                 "batch_stats": state.batch_stats}),
                      val_loss=float(metrics["loss"]))
    prof.finish()
    ckpt.wait()
    logger.close()
    print("done:", i, "steps")


if __name__ == "__main__":
    main()
