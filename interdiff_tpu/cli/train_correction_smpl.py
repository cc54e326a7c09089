"""Train the SMPL-track ObjProjector — `interdiff/train_correction_smpl.py`
equivalent (Adam lr 3e-4, 8 pose terms + contact/penetration with epoch
annealing, initialize=mean-marker mode before epoch 10).

Usage:
  python -m interdiff_tpu.cli.train_correction_smpl --motion_path ... \
      --model_path <SMPLH pkl dir> [--epochs 500] [--synthetic N_steps]
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    parser = ArgumentParser()
    parser.add_argument("--motion_path", default=None)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--results_dir", default="./results/smpl_correction")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dct", type=int, default=10)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=25)
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_body", action="store_true",
                        help="REAL motion data from --motion_path with the "
                             "synthetic stand-in body (SMPLH pkls are not "
                             "shipped in this image)")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    parser.add_argument("--w_contact", type=float, default=None,
                        help="contact loss weight (default: reference 1.0). "
                        "With --synthetic_body the GT object placement "
                        "penetrates the stand-in body, so the physics terms "
                        "fight reconstruction — scale them down")
    parser.add_argument("--w_penetration", type=float, default=None,
                        help="penetration loss weight (default: ref 0.1)")
    parser.add_argument("--render_interval", type=int, default=0,
                        help="render pred-vs-gt object-trajectory mesh gifs "
                             "for sample 0 every N epochs into "
                             "<results_dir>/render (the reference renders "
                             "them during validation, "
                             "`train_correction_smpl.py:192-259`); needs "
                             "real data (body faces), ignored under "
                             "--synthetic")
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
        fit_batch_size,
        make_mesh,
        seed_everything,
        synthetic_smpl_batches,
    )
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.train.trainer import (
        CorrectionTrainState,
        data_parallel_step,
        make_correction_smpl_train_step,
    )
    from interdiff_tpu.utils.train_io import CheckpointManager, MetricsLogger

    rng = seed_everything(args.seed)
    T = args.past_len + args.future_len
    projector = ObjProjectorSmpl(n_pre=args.dct, past_len=args.past_len,
                                 future_len=args.future_len)

    obj9 = jnp.zeros((2, T, 9), jnp.float32)
    markers = jnp.zeros((2, T, 67, 3), jnp.float32)
    contact = jnp.zeros((2, 67), jnp.float32)
    variables = projector.init(jax.random.PRNGKey(args.seed), obj9, markers,
                               contact)
    state = CorrectionTrainState.create(variables, optax.adam(args.lr))
    weights = None
    if args.w_contact is not None or args.w_penetration is not None:
        from interdiff_tpu.train.losses_correction import (
            CorrectionLossWeights,
        )

        defaults = CorrectionLossWeights()
        weights = CorrectionLossWeights(
            contact=defaults.contact if args.w_contact is None
            else args.w_contact,
            penetration=defaults.penetration if args.w_penetration is None
            else args.w_penetration)

    from interdiff_tpu.cli.common import snapshot_sources

    snapshot_sources(args.results_dir, ["interdiff_tpu.models.correction", "interdiff_tpu.train.losses_correction"])
    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt"))
    logger = MetricsLogger(os.path.join(args.results_dir, "metrics.jsonl"))
    key = jax.random.PRNGKey(args.seed)

    # build the corpus ONCE — clip-window jitter happens per __getitem__,
    # so reusing the dataset across epochs keeps the reference's jitter
    # semantics while skipping a full sequence reload per epoch (the 40-
    # window staged corpus gives 2 steps/epoch at B=16; reloading per epoch
    # made data prep dominate the step time on the one-core host)
    _ds = None
    if not args.synthetic:
        from interdiff_tpu.data.behave import (
            BehaveDataset,
            load_behave_sequences,
        )
        from interdiff_tpu.cli.common import load_smpl_models

        smpl_models = load_smpl_models(args)
        seqs = load_behave_sequences(args.motion_path,
                                     smpl_models=smpl_models, mode="train")
        _ds = BehaveDataset(seqs, past_len=args.past_len,
                            future_len=args.future_len, rng=rng)
        args.batch_size = fit_batch_size(len(_ds), args.batch_size)

    # mesh AFTER the corpus-fitted batch size: the data axis must divide the
    # global batch (fit_batch_size can shrink it on a small staged corpus)
    mesh = make_mesh(batch_size=args.batch_size)
    # initialize (< epoch 10) and main phases compile separately — the
    # mean-marker switch is structural (`train_correction_smpl.py:188`)
    step_init = data_parallel_step(make_correction_smpl_train_step(
        projector, weights=weights, initialize=True), mesh, extra_args=2)
    step_main = data_parallel_step(make_correction_smpl_train_step(
        projector, weights=weights, initialize=False), mesh, extra_args=2)

    def epoch_batches():
        if args.synthetic:
            return synthetic_smpl_batches(
                rng, batch_size=args.batch_size, seq_len=T,
                steps=args.synthetic)
        from interdiff_tpu.data.behave import collate

        return batch_iterator(_ds, collate, batch_size=args.batch_size,
                              rng=rng)

    keep = ("obj_angles", "obj_trans", "markers", "human_verts", "obj_points")

    render_correction = None
    if args.render_interval and args.synthetic:
        print("--render_interval needs real data (body faces); ignored "
              "under --synthetic")
    elif args.render_interval:
        from interdiff_tpu.geometry.rotations import (
            axis_angle_to_matrix,
            matrix_to_rotation_6d,
            rotation_6d_to_matrix,
        )
        from interdiff_tpu.viz.mesh_viz import visualize_body_obj

        @jax.jit
        def _project_one(params, batch_stats, obj_gt, markers, contact):
            return projector.apply(
                {"params": params, "batch_stats": batch_stats}, obj_gt,
                markers, contact, initialize=False, train=False,
                method=ObjProjectorSmpl.sample)

        def render_correction(state, batch_np, epoch):
            # pred-vs-gt object trajectories for clip 0, the reference's
            # validation rendering (`train_correction_smpl.py:192-259`)
            b = {k: jnp.asarray(batch_np[k])[:1] for k in keep}
            markers = b["markers"]
            contact = markers[:, args.past_len:, :, 6].sum(axis=1)
            rot6d = matrix_to_rotation_6d(
                axis_angle_to_matrix(b["obj_angles"]))
            obj_gt = jnp.concatenate([rot6d, b["obj_trans"]], axis=-1)
            obj_pred = _project_one(state.params, state.batch_stats, obj_gt,
                                    markers[..., :3], contact)
            body = np.asarray(b["human_verts"][0, :, :, :3])
            faces = np.asarray(smpl_models["male"].faces)
            tpl = np.asarray(b["obj_points"][0, :, :3])
            rdir = os.path.join(args.results_dir, "render")
            os.makedirs(rdir, exist_ok=True)
            for tag, pose in (("pred", obj_pred), ("gt", obj_gt)):
                rot = np.asarray(rotation_6d_to_matrix(pose[0, :, :6]))
                obj_verts = np.einsum("tij,pj->tpi", rot, tpl) \
                    + np.asarray(pose[0, :, None, 6:])
                path = os.path.join(rdir, f"epoch{epoch}_{tag}.gif")
                visualize_body_obj(body, faces, obj_verts, None,
                                   past_len=args.past_len, save_path=path)
                print("rendered", path)

    from interdiff_tpu.cli.common import TrainProfiler

    prof = TrainProfiler(args, args.results_dir)
    i = 0
    batch_np_last = None  # stays None if epoch_batches() yields nothing
    for epoch in range(args.epochs if not args.synthetic else 1):
        step = step_init if epoch < 10 and not args.synthetic else step_main
        for batch_np_last in epoch_batches():
            with prof.section("batch_place"):
                batch = step.place_batch(
                    {k: jnp.asarray(batch_np_last[k]) for k in keep})
            key, k_step = jax.random.split(key)
            with prof.section("train_step"):
                state, metrics = step(state, batch, k_step,
                                      jnp.asarray(epoch, jnp.float32))
            if i % 10 == 0:
                logger.log(i, {k: v for k, v in metrics.items()}, epoch=epoch)
                print(f"step {i} loss {float(metrics['loss']):.4f}")
            i += 1
        if (epoch + 1) % 25 == 0 or args.synthetic:
            ckpt.save(i, jax.device_get(
                {"params": state.params,
                 "batch_stats": state.batch_stats}),
                      val_loss=float(metrics["loss"]))
        if render_correction is not None and (
                (epoch + 1) % args.render_interval == 0):
            if batch_np_last is None:
                print("render skipped: no batches this epoch")
            else:
                render_correction(state, batch_np_last, epoch)
    prof.finish()
    ckpt.wait()
    logger.close()
    print("done:", i, "steps")


if __name__ == "__main__":
    main()
