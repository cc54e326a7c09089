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
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help=">0 keeps an EMA shadow of the params (rate = "
                             "this value, e.g. 0.9999); validation scores "
                             "the EMA weights and ckpt_ema/ stores them")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="optimizer steps per XLA dispatch "
                        "(train/trainer.py::chain_steps)")
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--resume_checkpoint", default=None,
                        help="orbax ckpt dir to resume params from")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="run N synthetic steps (no data needed)")
    parser.add_argument("--val_every", type=int, default=10)
    parser.add_argument("--val_respacing", default="",
                        help="timestep respacing for the validation sampler "
                             "('' = the faithful full schedule; e.g. '25' "
                             "for fast smoke validation)")
    parser.add_argument("--render_interval", type=int, default=0,
                        help="render a pred-vs-gt skeleton gif of validation "
                             "sample 0 every N validations into "
                             "<results_dir>/render (the reference renders "
                             "during validation, "
                             "`train_diffusion_skeleton.py:298-322`)")
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
    from interdiff_tpu.config import DiffusionConfig, SkeletonTrackConfig
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        data_parallel_step,
        make_skeleton_train_step,
    )
    from interdiff_tpu.eval.metrics import skeleton_metrics
    from interdiff_tpu.eval.skeleton import (
        SkeletonEvalConfig,
        make_skeleton_sampler,
        split_skeleton_state,
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

    if args.resume_checkpoint:
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(args.resume_checkpoint))
        params = mgr.restore(mgr.latest_step(),
                             args=ocp.args.StandardRestore(params))
        print(f"resumed params from {args.resume_checkpoint} "
              f"@ step {mgr.latest_step()}")
    state = TrainState.create(params, adamw(args.lr),
                              ema_rate=args.ema_decay)
    mesh = make_mesh(batch_size=args.batch_size)
    spd = max(1, getattr(args, "steps_per_dispatch", 1))
    step_fn = make_skeleton_train_step(model, diffusion)
    if spd > 1:
        from interdiff_tpu.train.trainer import chain_steps

        step = data_parallel_step(
            chain_steps(step_fn), mesh,
            batch_spec=jax.sharding.PartitionSpec(None, "data"))
    else:
        step = data_parallel_step(step_fn, mesh)

    from interdiff_tpu.cli.common import snapshot_sources

    snapshot_sources(args.results_dir, ["interdiff_tpu.models.mdm_skeleton", "interdiff_tpu.train.trainer", "interdiff_tpu.train.losses", "interdiff_tpu.diffusion.gaussian"])
    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt"))
    ckpt_ema = (CheckpointManager(os.path.join(args.results_dir, "ckpt_ema"))
                if args.ema_decay > 0 else None)
    logger = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))

    # validation = full inpainting sampling + metrics, like the reference's
    # validation_step (`train_diffusion_skeleton.py:272-295`)
    eval_cfg = SkeletonEvalConfig(past_len=args.past_len,
                                  future_len=args.future_len)
    val_diffusion = diffusion
    if args.val_respacing:
        from interdiff_tpu.config import DiffusionConfig

        val_diffusion = DiffusionConfig(
            timestep_respacing=args.val_respacing).build()
    val_sampler = jax.jit(make_skeleton_sampler(eval_cfg, model,
                                                val_diffusion))

    def run_validation(params, batch, key):
        x = val_sampler(params, key, jnp.asarray(batch["skeleton"]),
                        jnp.asarray(batch["obj_points"]),
                        jnp.asarray(batch["poses"]),
                        jnp.asarray(batch["zero_pose_obj"]))
        pred = split_skeleton_state(x, eval_cfg)
        m = skeleton_metrics(
            pred["body"], jnp.asarray(batch["skeleton"]), pred["obj"],
            jnp.asarray(batch["obj_points"]), pred["pose"],
            jnp.asarray(batch["poses"]), start=args.past_len)
        return {k: float(v) for k, v in m.items()}, pred

    def render_validation(pred, batch, tag):
        # validation-time gif, the reference's render behavior
        # (`train_diffusion_skeleton.py:298-322`): sample 0, pred overlaid
        # on gt through the matplotlib skeleton renderer
        from interdiff_tpu.viz.skeleton_viz import visualize_skeleton

        rdir = os.path.join(args.results_dir, "render")
        os.makedirs(rdir, exist_ok=True)
        path = os.path.join(rdir, f"{tag}.gif")
        visualize_skeleton(
            np.asarray(batch["skeleton"][0]),
            np.asarray(batch["obj_points"][0]), path,
            pred=np.asarray(pred["body"][0]),
            obj_pred=np.asarray(pred["obj"][0]), past_len=args.past_len)
        print("rendered", path)

    key = jax.random.PRNGKey(args.seed)

    val_batch_np = None  # the reference validates on the held-out val split
    if args.synthetic:
        def epoch_batches():
            return synthetic_skeleton_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                steps=args.synthetic)
    else:
        from interdiff_tpu.data.skeleton import (
            collate_skeleton,
            load_skeleton_datasets,
        )

        train, val_split, _, _ = load_skeleton_datasets(args.motion_path)

        def epoch_batches():
            return batch_iterator(train, collate_skeleton,
                                  batch_size=args.batch_size, rng=rng)

        if len(val_split):
            from interdiff_tpu.cli.common import fit_batch_size
            val_batch_np = next(iter(batch_iterator(
                val_split, collate_skeleton,
                batch_size=fit_batch_size(len(val_split), args.batch_size),
                rng=rng, shuffle=False)))

    i = 0
    from interdiff_tpu.cli.common import TrainProfiler

    prof = TrainProfiler(args, args.results_dir)
    n_vals = 0  # render cadence counts validations, not epochs
    for epoch in range(args.epochs if not args.synthetic else 1):
        from interdiff_tpu.utils.prefetch import device_prefetch, threaded_batches

        def _placed():
            buf, yielded = [], 0
            for b in threaded_batches(epoch_batches, num_workers=2):
                buf.append(b)
                if len(buf) < spd:
                    continue
                with prof.section("batch_place"):
                    if spd == 1:
                        arr = {k: jnp.asarray(v) for k, v in buf[0].items()}
                    else:
                        arr = {k: jnp.asarray(np.stack([x[k] for x in buf]))
                               for k in buf[0]}
                    placed = step.place_batch(arr)
                yield buf[-1], placed
                yielded += 1
                buf = []
            # trailing partial stack dropped (would recompile at a new K);
            # loudly flag it — fewer than K batches/epoch would otherwise
            # train ZERO steps yet still validate/save (advisor r4)
            if buf:
                msg = (f"steps_per_dispatch={spd}: dropped trailing "
                       f"partial stack of {len(buf)} batch(es)")
                if yielded == 0:
                    raise SystemExit(
                        f"ERROR: {msg} and the epoch yielded NO full "
                        f"stack — 0 train steps. Lower --steps_per_dispatch "
                        f"or raise the dataset/--synthetic size.")
                print(f"WARNING: {msg}", flush=True)

        for batch_np_last, batch in _placed():
            key, k_step = jax.random.split(key)
            with prof.section("train_step"):
                state, metrics = step(state, batch, k_step)
            if (i // spd) % max(1, 10 // spd) == 0:
                loss = float(jnp.mean(metrics["loss"]))
                logger.log(i, {"loss": loss}, epoch=epoch)
                print(f"step {i} loss {loss:.4f}")
            i += spd
        if (epoch + 1) % args.val_every == 0 or args.synthetic:
            key, k_val = jax.random.split(key)
            val_params = (state.ema_params if state.ema_params is not None
                          else state.params)
            val_b = batch_np_last if val_batch_np is None else val_batch_np
            val_metrics, val_pred = run_validation(val_params, val_b, k_val)
            logger.log(i, val_metrics, epoch=epoch, split="valid")
            print(f"epoch {epoch} val {val_metrics}")
            ckpt.save(i, jax.device_get(state.params),
                      val_loss=val_metrics["mpjpe_h"])
            if ckpt_ema is not None:
                ckpt_ema.save(i, jax.device_get(state.ema_params),
                              val_loss=val_metrics["mpjpe_h"])
            n_vals += 1
            if args.render_interval and (
                    n_vals % args.render_interval == 0
                    or args.synthetic):
                render_validation(val_pred, val_b, f"epoch{epoch}")
    prof.finish()
    ckpt.wait()
    if ckpt_ema is not None:
        ckpt_ema.wait()
    logger.close()
    print("done:", i, "steps")


if __name__ == "__main__":
    main()
