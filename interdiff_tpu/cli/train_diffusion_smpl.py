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
    parser.add_argument("--bn_train_mode", type=int, default=0,
                        help="1 = run the PointNet++ encoder BatchNorms in "
                        "train mode (batch statistics + momentum running-"
                        "stat updates, out of the optimizer — the reference "
                        "Lightning semantics); 0 (default) keeps eval-mode "
                        "BN with the stats inside the optimized tree")
    # model-size knobs mirroring the reference trainer's flags
    # (`interdiff/train_diffusion_smpl.py:538-604`)
    parser.add_argument("--embedding_dim", type=int, default=256)
    parser.add_argument("--ff_size", type=int, default=1024)
    parser.add_argument("--num_layers", type=int, default=8)
    parser.add_argument("--schedule_sampler", default="uniform",
                        choices=["uniform", "loss-second-moment"],
                        help="timestep sampler; the reference hardcodes "
                             "uniform (`train_diffusion_smpl.py:43-44`) but "
                             "ships the loss-second-moment importance "
                             "sampler unwired — here it threads functional "
                             "state through TrainState")
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help=">0 keeps an EMA shadow of the params (rate = "
                             "this value, e.g. 0.9999), updated inside the "
                             "jitted step; validation scores the EMA weights "
                             "and ckpt_ema/ stores them as a flat param save "
                             "loadable by every eval CLI. The reference "
                             "ships `update_ema` (diffusion/nn.py:56) but "
                             "never calls it from a trainer")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="optimizer steps per XLA dispatch "
                        "(train/trainer.py::chain_steps): K microbatches "
                        "scan inside one execution, hiding per-dispatch "
                        "launch cost; metrics land every K steps")
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--resume_checkpoint", default=None,
                        help="orbax ckpt dir to resume params from")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_points", type=int, default=512,
                        help="object points per synthetic batch (use"
                        " >=1024 to exercise the real PointNet++"
                        " encoder: sa0 samples 1024 centers)")
    parser.add_argument("--synthetic_body", action="store_true",
                        help="load REAL motion npz from --motion_path but "
                             "stand in the synthetic SMPL body for the "
                             "unshipped SMPLH pkls (poses/trans/obj pose and "
                             "the object point cloud stay real)")
    parser.add_argument("--val_every", type=int, default=50)
    parser.add_argument("--val_diverse", type=int, default=1,
                        help=">1 scores validation with the reference's "
                             "test-mode calc_loss: N diverse samples, mean "
                             "terms + per-clip min-over-samples *_min "
                             "diagnostics (train_diffusion_smpl.py:262-379)")
    parser.add_argument("--val_respacing", default="",
                        help="timestep respacing for the validation sampler "
                             "('' = the faithful full schedule; e.g. '25' "
                             "for fast smoke validation)")
    parser.add_argument("--render_interval", type=int, default=0,
                        help="render a 4-view mesh gif of validation sample "
                             "0 every N validations into "
                             "<results_dir>/render — the reference renders "
                             "gifs during validation every render_interval "
                             "(`train_diffusion_smpl.py:411-413,454-511`); "
                             "works under --synthetic via the stand-in body")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    from interdiff_tpu.cli.common import add_profiler_args

    add_profiler_args(parser)
    args = parser.parse_args()
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
        args.model_path = args.model_path or _paths.model_path
    if not args.synthetic and not (
            args.motion_path and (args.model_path or args.synthetic_body)):
        parser.error("--motion_path and --model_path are required unless "
                     "--synthetic or --synthetic_body is set")

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
                          use_pointnet2=bool(args.use_pointnet2),
                          embedding_dim=args.embedding_dim,
                          ff_size=args.ff_size, num_layers=args.num_layers)
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
    schedule_sampler = args.schedule_sampler
    sampler_state = None
    if schedule_sampler == "loss-second-moment":
        from interdiff_tpu.diffusion.resample import LossSecondMomentResampler

        # ONE instance feeds both init_state() and the step factory so the
        # history width in the state always matches the update logic
        schedule_sampler = LossSecondMomentResampler(diffusion.num_timesteps)
        sampler_state = schedule_sampler.init_state()
    model_state = None
    if args.bn_train_mode:
        from interdiff_tpu.train.trainer import split_bn_state

        params, model_state = split_bn_state(params)
    state = TrainState.create(params, adamw(args.lr),
                              sampler_state=sampler_state,
                              ema_rate=args.ema_decay,
                              model_state=model_state)
    mesh = make_mesh(batch_size=args.batch_size)
    spd = max(1, args.steps_per_dispatch)
    step_fn = make_smpl_train_step(model, diffusion,
                                   schedule_sampler=schedule_sampler,
                                   bn_train_mode=bool(args.bn_train_mode))
    if spd > 1:
        from interdiff_tpu.train.trainer import chain_steps

        step = data_parallel_step(
            chain_steps(step_fn), mesh,
            batch_spec=jax.sharding.PartitionSpec(None, "data"))
    else:
        step = data_parallel_step(step_fn, mesh)

    from interdiff_tpu.cli.common import snapshot_sources

    snapshot_sources(args.results_dir, ["interdiff_tpu.models.mdm_smpl", "interdiff_tpu.train.trainer", "interdiff_tpu.train.losses", "interdiff_tpu.diffusion.gaussian"])
    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt"))
    ckpt_ema = (CheckpointManager(os.path.join(args.results_dir, "ckpt_ema"))
                if args.ema_decay > 0 else None)
    logger = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))
    key = jax.random.PRNGKey(args.seed)

    # validation = full inpainting sampling + rotation-matrix-space val loss,
    # like the reference's validation_step + calc_val_loss
    # (`train_diffusion_smpl.py:185-260,389-414`); the best checkpoint is
    # selected on this val_loss (ModelCheckpoint(monitor='val_loss')).
    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig,
        make_sampler,
        state_to_axis_angle,
    )
    from interdiff_tpu.models.mdm_smpl import smpl_gt_from_raw
    from interdiff_tpu.train.losses import smpl_val_losses

    eval_cfg = SmplEvalConfig(past_len=args.past_len,
                              future_len=args.future_len)
    val_diffusion = diffusion
    if args.val_respacing:
        from interdiff_tpu.config import DiffusionConfig

        val_diffusion = DiffusionConfig(
            timestep_respacing=args.val_respacing).build()
    val_sampler = jax.jit(make_sampler(eval_cfg, model, val_diffusion))

    if args.val_diverse > 1:
        from interdiff_tpu.parallel.sample_parallel import (
            tile_for_diverse_samples,
        )
        from interdiff_tpu.train.losses import smpl_diverse_test_losses

        Nv = args.val_diverse

        @jax.jit
        def _val_losses(params, key, gt, pts6, hand, betas):
            gt_t, pts_t, hand_t, betas_t = (
                tile_for_diverse_samples(a, Nv)
                for a in (gt, pts6, hand, betas))
            x = val_sampler(params, key, gt_t, pts_t, hand_t, betas_t)
            body_p, obj_p = state_to_axis_angle(eval_cfg, x)
            body_g, obj_g = state_to_axis_angle(eval_cfg, gt)
            B = gt.shape[0]
            rs = lambda a: a.reshape((Nv, B) + a.shape[1:])  # noqa: E731
            loss, loss_dict, _ = smpl_diverse_test_losses(
                rs(body_p), body_g, rs(obj_p), obj_g,
                past_len=args.past_len)
            return loss, loss_dict
    else:
        @jax.jit
        def _val_losses(params, key, gt, pts6, hand, betas):
            x = val_sampler(params, key, gt, pts6, hand, betas)
            body_p, obj_p = state_to_axis_angle(eval_cfg, x)
            body_g, obj_g = state_to_axis_angle(eval_cfg, gt)
            return smpl_val_losses(body_p, body_g, obj_p, obj_g,
                                   past_len=args.past_len)

    def run_validation(params, b, key):
        gt = smpl_gt_from_raw(
            jnp.asarray(b["body_pose"][..., :66]),
            jnp.asarray(b["body_trans"]),
            jnp.asarray(b["obj_angles"]), jnp.asarray(b["obj_trans"]))
        loss, terms = _val_losses(
            params, key, gt, jnp.asarray(b["obj_points"][..., :6]),
            jnp.asarray(b["body_pose"][..., 66:]),
            jnp.asarray(b["body_betas"]) if "body_betas" in b
            else jnp.zeros(gt.shape[:2] + (10,)))
        return float(loss), {k: float(v) for k, v in terms.items()}

    val_batch_np = None  # the reference validates on the test split
    if args.synthetic:
        def epoch_batches():
            return synthetic_smpl_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                num_points=args.synthetic_points,
                steps=args.synthetic)
    else:
        from interdiff_tpu.data.behave import (
            BehaveDataset,
            collate,
            load_behave_sequences,
        )
        from interdiff_tpu.cli.common import load_smpl_models

        smpl_models = load_smpl_models(args)
        seqs = load_behave_sequences(args.motion_path,
                                     smpl_models=smpl_models, mode="train")
        # diffusion training reads only the pose streams + the point-cloud
        # template; skip building per-vertex tensors on the one-core host
        ds = BehaveDataset(seqs, past_len=args.past_len,
                           future_len=args.future_len, rng=rng,
                           fields="light")

        def epoch_batches():
            return batch_iterator(ds, collate, batch_size=args.batch_size,
                                  rng=rng)

        try:
            test_ds = BehaveDataset(
                load_behave_sequences(args.motion_path,
                                      smpl_models=smpl_models, mode="test"),
                past_len=args.past_len, future_len=args.future_len, rng=rng,
                fields="light")
            val_batch_np = next(iter(batch_iterator(
                test_ds, collate, batch_size=args.batch_size, rng=rng,
                shuffle=False)))
        except Exception as e:  # no Date03* sequences in a partial corpus
            print("validation falls back to the last train batch:", e)

    render_validation = None
    if args.render_interval:
        # validation-time gif rendering, the reference's render_interval
        # behavior (`train_diffusion_smpl.py:411-413,454-511`): sample 0 of
        # the validation batch through the val sampler, FK, seam smoothing,
        # 4-yaw-view mesh gif
        from interdiff_tpu.cli.common import synthetic_smpl_body
        from interdiff_tpu.eval.metrics import smooth_seam
        from interdiff_tpu.eval.smpl_short import postprocess_sample
        from interdiff_tpu.geometry.rotations import axis_angle_to_matrix
        from interdiff_tpu.viz.mesh_viz import visualize_body_obj

        render_smpl = (synthetic_smpl_body(np.random.default_rng(0))
                       if args.synthetic else smpl_models["male"])

        @jax.jit
        def _render_sample(params, key, gt, pts6, hand, betas):
            x = val_sampler(params, key, gt, pts6, hand, betas)
            out = postprocess_sample(eval_cfg, render_smpl, x, hand, betas)
            return (smooth_seam(out["verts"], args.future_len),
                    smooth_seam(out["obj_pred"], args.future_len))

        def render_validation(params, b, key, tag):
            one = lambda a: jnp.asarray(a)[:1]  # noqa: E731 — 1-row graph
            gt = smpl_gt_from_raw(one(b["body_pose"])[..., :66],
                                  one(b["body_trans"]),
                                  one(b["obj_angles"]), one(b["obj_trans"]))
            betas = (one(b["body_betas"]) if "body_betas" in b
                     else jnp.zeros(gt.shape[:2] + (10,)))
            verts, obj = _render_sample(
                params, key, gt, one(b["obj_points"])[..., :6],
                one(b["body_pose"])[..., 66:], betas)
            rot = np.asarray(axis_angle_to_matrix(obj[0, :, :3]))
            tpl = np.asarray(b["obj_points"])[0, :, :3]
            obj_verts = np.einsum("tij,pj->tpi", rot, tpl) \
                + np.asarray(obj[0, :, None, 3:])
            rdir = os.path.join(args.results_dir, "render")
            os.makedirs(rdir, exist_ok=True)
            path = os.path.join(rdir, f"{tag}.gif")
            visualize_body_obj(
                np.asarray(verts[0]), np.asarray(render_smpl.faces),
                obj_verts, None, past_len=args.past_len, save_path=path)
            print("rendered", path)

    keep = ("body_pose", "body_trans", "obj_angles", "obj_trans",
            "obj_points")
    from interdiff_tpu.cli.common import TrainProfiler

    prof = TrainProfiler(args, args.results_dir)
    i = 0
    n_vals = 0  # render cadence counts validations, not epochs
    for epoch in range(args.epochs if not args.synthetic else 1):
        from interdiff_tpu.utils.prefetch import threaded_batches

        def _placed():
            buf, yielded = [], 0
            for b in threaded_batches(epoch_batches, num_workers=2):
                buf.append(b)
                if len(buf) < spd:
                    continue
                with prof.section("batch_place"):
                    if spd == 1:
                        arr = {k: jnp.asarray(buf[0][k]) for k in keep}
                    else:  # stack K microbatches on the new leading axis
                        arr = {k: jnp.asarray(np.stack([x[k] for x in buf]))
                               for k in keep}
                    placed = step.place_batch(arr)
                yield buf[-1], placed
                yielded += 1
                buf = []
            # a trailing partial stack (< spd batches) is dropped: a
            # different K would trigger a fresh XLA compile for the epoch
            # tail, and the loader reshuffles every epoch anyway.  Loudly
            # flag the drop — with fewer than K batches per epoch the loop
            # would otherwise train ZERO steps and still validate/save
            # (advisor r4).
            if buf:
                msg = (f"steps_per_dispatch={spd}: dropped trailing "
                       f"partial stack of {len(buf)} batch(es)")
                if yielded == 0:
                    raise SystemExit(
                        f"ERROR: {msg} and the epoch yielded NO full "
                        f"stack — 0 train steps. Lower --steps_per_dispatch "
                        f"or raise the dataset/--synthetic size.")
                print(f"WARNING: {msg}", flush=True)

        for batch_np, batch in _placed():
            key, k_step = jax.random.split(key)
            with prof.section("train_step"):
                state, metrics = step(state, batch, k_step)
            if (i // spd) % max(1, 10 // spd) == 0:
                # chained dispatches return stacked [K] metrics; log the mean
                loss = float(jnp.mean(metrics["loss"]))
                logger.log(i, {"loss": loss}, epoch=epoch)
                print(f"step {i} loss {loss:.4f}")
            i += spd
        if (epoch + 1) % args.val_every == 0 or args.synthetic:
            key, k_val = jax.random.split(key)
            # with EMA on, validation (and best-ckpt selection) scores the
            # shadow weights — they are the serving weights
            val_params = (state.ema_params if state.ema_params is not None
                          else state.params)
            if args.bn_train_mode:
                # recombine the split BN collections so validation/sampling
                # and the checkpoint see the usual full-variables layout
                from interdiff_tpu.train.trainer import merge_bn_state

                val_params = merge_bn_state(val_params, state.model_state)
            val_loss, val_terms = run_validation(
                val_params,
                batch_np if val_batch_np is None else val_batch_np, k_val)
            logger.log(i, {"val_loss": val_loss, **val_terms}, epoch=epoch)
            print(f"epoch {epoch} val_loss {val_loss:.4f}")
            save_params = state.params
            if args.bn_train_mode:
                from interdiff_tpu.train.trainer import merge_bn_state

                save_params = merge_bn_state(state.params, state.model_state)
            ckpt.save(i, jax.device_get(save_params), val_loss=val_loss)
            if ckpt_ema is not None:
                ckpt_ema.save(i, jax.device_get(state.ema_params),
                              val_loss=val_loss)
            n_vals += 1
            if render_validation is not None and (
                    n_vals % args.render_interval == 0
                    or args.synthetic):
                key, k_render = jax.random.split(key)
                render_validation(
                    val_params,
                    batch_np if val_batch_np is None else val_batch_np,
                    k_render, f"epoch{epoch}")
    prof.finish()
    ckpt.wait()
    if ckpt_ema is not None:
        ckpt_ema.wait()
    logger.close()
    print("done:", i, "steps")


if __name__ == "__main__":
    main()
