"""Skeleton-track evaluation — `interdiff/eval_skeleton.py` (with
correction) and `eval_skeleton_no_correction.py` in one script
(`--mode correction|no_correction`).

Runs over the seen + unseen test splits (or `--synthetic` random batches),
prints the weighted-mean metric dict like the reference (`:145-165`).

Usage:
  python -m interdiff_tpu.cli.eval_skeleton --motion_path ... \
      --diffusion_ckpt <orbax dir> [--correction_ckpt torch.ckpt] \
      [--mode correction] [--synthetic N]
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
    parser.add_argument("--mode", default="correction",
                        choices=["correction", "no_correction"])
    parser.add_argument("--diffusion_ckpt", default=None,
                        help="orbax dir of trained MDM params")
    parser.add_argument("--correction_ckpt",
                        default="/root/reference/interdiff/checkpoints/"
                                "obj_skeleton.ckpt")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=10)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--respacing", default="",
                        help="timestep respacing, e.g. '100' or 'ddim50'")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--render_dir", default=None,
                        help="write a gif of sample 0 per batch here")
    parser.add_argument("--rollouts", type=int, default=0,
                        help="autoregressive future windows after the first "
                             "(the reference's get_batch re-batching, "
                             "eval_skeleton.py:71-80)")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="shard the sampling batch over an N-device "
                             "data mesh (0 = single device); batch_size "
                             "must divide by N")
    args = parser.parse_args()
    if args.mesh_devices > 1 and args.batch_size % args.mesh_devices:
        parser.error("--batch_size must be divisible by --mesh_devices")
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
    if not args.synthetic and not args.motion_path:
        parser.error("--motion_path is required unless --synthetic is set")

    from interdiff_tpu.cli.common import seed_everything, synthetic_skeleton_batches
    from interdiff_tpu.config import SkeletonTrackConfig
    from interdiff_tpu.eval.metrics import skeleton_metrics
    from interdiff_tpu.eval.skeleton import (
        SkeletonEvalConfig,
        make_skeleton_sampler,
        split_skeleton_state,
    )
    from interdiff_tpu.models.correction import ObjProjectorSkeleton
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton

    rng = seed_everything(args.seed)
    T = args.past_len + args.future_len
    cfg = SkeletonEvalConfig(past_len=args.past_len,
                             future_len=args.future_len)
    from interdiff_tpu.config import DiffusionConfig

    track = SkeletonTrackConfig(
        past_len=args.past_len, future_len=args.future_len,
        diffusion=DiffusionConfig(timestep_respacing=args.respacing))
    model = track.build_model()
    diffusion = track.diffusion.build()

    from interdiff_tpu.cli.common import load_mdm

    def _init():
        ex = next(synthetic_skeleton_batches(rng, batch_size=2, seq_len=T))
        return model.init(
            jax.random.PRNGKey(0), jnp.asarray(ex["skeleton"]),
            jnp.asarray(ex["obj_points"]), jnp.asarray(ex["poses"]),
            jnp.asarray(ex["zero_pose_obj"]), jnp.zeros((2,), jnp.int32),
            method=MDMSkeleton.init_forward)

    model, params = load_mdm(args.diffusion_ckpt, "skeleton", model, _init,
                             past_len=args.past_len,
                             future_len=args.future_len)

    projector = projector_params = None
    if args.mode == "correction":
        from interdiff_tpu.cli.common import load_correction_variables

        projector = ObjProjectorSkeleton(past_len=args.past_len,
                                         future_len=args.future_len)
        projector_params = load_correction_variables(
            args.correction_ckpt, kind="skeleton")

    # encode once per batch, reuse across any repeated sampling
    raw_sample = make_skeleton_sampler(
        cfg, model, diffusion, projector=projector,
        projector_params=projector_params,
        use_correction=args.mode == "correction", reuse_memory=True)
    raw_encode = lambda p, sk, op, po, zp: model.apply(  # noqa: E731
        p, sk, op, po, zp, method=MDMSkeleton.encode)
    if args.mesh_devices > 1:
        from interdiff_tpu.parallel.mesh import make_mesh
        from interdiff_tpu.parallel.sample_parallel import data_parallel_sample

        if len(jax.devices()) < args.mesh_devices:
            parser.error(f"--mesh_devices {args.mesh_devices} > "
                         f"{len(jax.devices())} available devices")
        mesh = make_mesh(data=args.mesh_devices)
        sample = data_parallel_sample(raw_sample, mesh, n_args=8)
        encode = data_parallel_sample(raw_encode, mesh, n_args=5,
                                      replicated_args=(0,))
        place_batch = sample.place_batch
    else:
        sample = jax.jit(raw_sample)
        encode = jax.jit(raw_encode)
        place_batch = lambda x: x  # noqa: E731

    def batches():
        if args.synthetic:
            yield from synthetic_skeleton_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                steps=args.synthetic)
            return
        from interdiff_tpu.cli.common import batch_iterator
        from interdiff_tpu.data.skeleton import (
            collate_skeleton,
            load_skeleton_datasets,
        )

        _, _, test_seen, test_unseen = load_skeleton_datasets(
            args.motion_path)
        for name, split in (("seen", test_seen), ("unseen", test_unseen)):
            print(f"--- {name} split: {len(split)} clips ---")
            yield from batch_iterator(split, collate_skeleton,
                                      batch_size=args.batch_size, rng=rng,
                                      shuffle=False)

    key = jax.random.PRNGKey(args.seed)
    totals, n = {}, 0
    for batch in batches():
        key, k = jax.random.split(key)
        gt_parts = {
            "body": jnp.asarray(batch["skeleton"]),
            "obj": jnp.asarray(batch["obj_points"]),
            "pose": jnp.asarray(batch["poses"]),
        }
        zp = jnp.asarray(batch["zero_pose_obj"])
        memory, gt_state = encode(params, gt_parts["body"], gt_parts["obj"],
                                  gt_parts["pose"], zp)
        x = sample(params, k, gt_parts["body"], gt_parts["obj"],
                   gt_parts["pose"], zp, memory, gt_state)
        pred = split_skeleton_state(x, cfg)
        if args.rollouts:
            from interdiff_tpu.eval.skeleton import rollout_batch

            full = {k: np.asarray(v) for k, v in pred.items()}
            xk = x
            for _ in range(args.rollouts):
                # re-place: rollout_batch outputs carry the previous call's
                # committed sharding, which the sharded jit would reject
                nb = place_batch(rollout_batch(
                    xk, jnp.asarray(batch["zero_pose_obj"]), cfg))
                key, kk = jax.random.split(key)
                mem_k, gt_k = encode(params, nb["skeleton"],
                                     nb["obj_points"], nb["poses"],
                                     nb["zero_pose_obj"])
                xk = sample(params, kk, nb["skeleton"], nb["obj_points"],
                            nb["poses"], nb["zero_pose_obj"], mem_k, gt_k)
                pk = split_skeleton_state(xk, cfg)
                for k2 in full:
                    full[k2] = np.concatenate(
                        [full[k2], np.asarray(pk[k2][:, cfg.past_len:])],
                        axis=1)
            print(f"rollout: {full['body'].shape[1]} frames total")
        m = skeleton_metrics(pred["body"], gt_parts["body"], pred["obj"],
                             gt_parts["obj"], pred["pose"], gt_parts["pose"],
                             start=args.past_len)
        n += 1
        for k2, v in m.items():
            totals[k2] = totals.get(k2, 0.0) + float(v)
        print({k2: round(v / n, 5) for k2, v in totals.items()})
        if args.render_dir:
            from interdiff_tpu.viz.skeleton_viz import visualize_skeleton

            os.makedirs(args.render_dir, exist_ok=True)
            visualize_skeleton(
                np.asarray(gt_parts["body"][0]),
                np.asarray(gt_parts["obj"][0]),
                os.path.join(args.render_dir, f"batch{n}_{args.mode}.gif"),
                pred=np.asarray(pred["body"][0]),
                obj_pred=np.asarray(pred["obj"][0]),
                past_len=args.past_len)


if __name__ == "__main__":
    main()
