"""Post-hoc refinement — `interdiff/optimization.py` __main__ equivalent:
200 jitted Adam iterations per clip.

Two modes:

* default — refine dataset clips directly, like the reference's
  ``for data in Dataset('test'): optimize(i, data)`` (`optimization.py:216-219`);
* ``--diffusion_ckpt <orbax dir>`` — the full generate-then-refine
  pipeline the reference never wired up end-to-end: sample futures from
  the trained diffusion model (past-frame inpainting), refine every
  sampled clip, and report the penetration metric before/after.

Usage:
  python -m interdiff_tpu.cli.optimization --motion_path ... \
      --model_path <SMPLH pkl dir> [--limit N]
  python -m interdiff_tpu.cli.optimization --motion_path ... \
      --synthetic_body --diffusion_ckpt artifacts/smpl_real_params
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--motion_path", default=None)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--diffusion_ckpt", default=None,
                        help="orbax params dir; when given, refine SAMPLED "
                             "futures instead of dataset clips and report "
                             "penetration before/after")
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--respacing", default="100",
                        help="sampling respacing for --diffusion_ckpt mode")
    parser.add_argument("--seed", type=int, default=233)
    parser.add_argument("--iters", type=int, default=200,
                        help="Adam iterations (`optimization.py:138`)")
    parser.add_argument("--ratio_denom", type=float, default=350.0,
                        help="penetration-weight annealing denominator "
                             "(`optimization.py:140` uses ii/350, so 200 "
                             "reference iters never exceed 57%% strength — "
                             "tuned for refining smooth GT clips; when "
                             "refining jittery diffusion samples, a smaller "
                             "denom lets the penetration term reach full "
                             "weight before the best-iterate window opens)")
    parser.add_argument("--pen_fix_body", action="store_true",
                        help="ablation: stop-grad the body in the "
                             "penetration term so it can only push the "
                             "OBJECT out; measured WORSE on fraction-inside "
                             "(the body gradient is the workhorse — see "
                             "OptimConfig.pen_fix_body)")
    parser.add_argument("--dispatch_chunk", type=int, default=0,
                        help="split the refinement descent into bounded "
                             "dispatches of N iterations (0 = one "
                             "dispatch). RPC-tunneled TPU workers kill "
                             "long executions — one 8-clip x 350-iter "
                             "refine dispatch reproducibly crashed the "
                             "axon worker while 8 x 200 completed; "
                             "chunking unblocks longer refinements")
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--out_dir", default="./results/optimization")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="refine N synthetic clips (no data needed)")
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
        parser.error("--motion_path and --model_path (or --config) required")

    if args.diffusion_ckpt is not None:
        # "" = randomly-initialized model (smoke); a path restores orbax
        _run_from_samples(args)
        return
    if args.synthetic:
        _run_synthetic(args)
        return
    _run_dataset(args)


def _make_penetration_fn(smpl, past_len):
    """Penetration over future frames, both lenses: the fraction of object
    points inside the body (the `penetrate` eval metric,
    `eval_smpl_short.py:39-40`) AND the mean depth of the inside points —
    the quantity the refiner objective actually targets
    (`optimization.py:68,77` weights |signed| of inside points).  The two
    diverge: measured on the real sequence, refinement always slashes depth
    while fraction can rise (many shallow contacts replacing few deep ones).
    pose [B,T,156] axis-angle, obj_pts [B,P,3] canonical template."""
    from interdiff_tpu.geometry.normals import vertex_normals
    from interdiff_tpu.geometry.rotations import axis_angle_to_matrix
    from interdiff_tpu.ops.signed_distance import safe_sqrt
    from interdiff_tpu.ops.signed_distance import signed_nearest_pruned
    from interdiff_tpu.smpl.model import smpl_forward

    faces_j = jnp.asarray(smpl.faces)

    @jax.jit
    def penetration(pose, trans, betas, obj_aa, obj_trans, obj_pts):
        B, Tn = pose.shape[:2]
        verts, _, _, _ = smpl_forward(
            smpl, pose.reshape(B * Tn, -1), betas.reshape(B * Tn, -1),
            trans.reshape(B * Tn, 3))
        rot = axis_angle_to_matrix(obj_aa)
        pts = (jnp.einsum("btij,bpj->btpi", rot, obj_pts)
               + obj_trans[:, :, None])
        normals = vertex_normals(verts, faces_j)
        # sign AND inside-point magnitudes consumed -> the AABB-pruned
        # sweep is exactly sound here (forced-far points are provably
        # outside: zero contribution to both fraction and depth under
        # either path — `signed_nearest_pruned`'s contract)
        o2h_sq, o2h_dot = signed_nearest_pruned(
            pts.reshape(B * Tn, -1, 3), verts, normals, chunk=512)
        inside = (o2h_dot < 0).reshape(B, Tn, -1)[:, past_len:]
        frac = inside.astype(jnp.float32).mean(axis=(1, 2))
        depth = safe_sqrt(o2h_sq).reshape(B, Tn, -1)[:, past_len:]
        n_in = jnp.maximum(inside.sum(axis=(1, 2)), 1)
        depth = jnp.where(inside, depth, 0.0).sum(axis=(1, 2)) / n_in
        return frac, depth

    return penetration


def _run_dataset(args):
    """Reference mode: refine ground-truth dataset clips and report the
    penetration metric before/after (the reference's own regime — the
    annealing/weights at `optimization.py:68,101-105` are tuned for
    already-smooth registrations, unlike the sampled-future mode below)."""
    from interdiff_tpu.cli.common import load_eval_sequences, load_smpl_models
    from interdiff_tpu.data.behave import BehaveDataset
    from interdiff_tpu.eval.optimization import (
        OptimConfig,
        make_chunked_refiner,
        optimize_clip,
    )

    smpl_models = load_smpl_models(args)
    seqs = load_eval_sequences(args.motion_path, smpl_models)
    # optimize_clip consumes only pose streams + the point-cloud template
    ds = BehaveDataset(seqs, past_len=args.past_len,
                       future_len=args.future_len, fields="light")
    if not len(ds):
        raise SystemExit(f"no clip windows under {args.motion_path}")
    os.makedirs(args.out_dir, exist_ok=True)

    cfg = OptimConfig(iters=args.iters,
                      keep_after=min(150, args.iters - 2),
                      ratio_denom=args.ratio_denom,
                      pen_fix_body=args.pen_fix_body)
    # jit per gender: eager optimize_clip would dispatch every pre-FK op
    # as its own RPC over the axon tunnel
    refine_fns, pen_fns = {}, {}

    def _fns(gender):
        if gender not in refine_fns:
            smpl = smpl_models[gender]
            if args.dispatch_chunk > 0:
                # host loop over jitted bounded segments, jitted pieces
                # shared across the clip loop
                chunked = make_chunked_refiner(smpl, cfg,
                                               args.dispatch_chunk)

                def _chunked(bp, hp, tr, be, oa, ot, op, _c=chunked):
                    return _c(body_pose=bp, hand_pose=hp, body_trans=tr,
                              betas=be, obj_angles=oa, obj_trans=ot,
                              obj_points=op)
                refine_fns[gender] = _chunked
            else:
                refine_fns[gender] = jax.jit(
                    lambda bp, hp, tr, be, oa, ot, op, _s=smpl: optimize_clip(
                        _s, body_pose=bp, hand_pose=hp, body_trans=tr,
                        betas=be, obj_angles=oa, obj_trans=ot, obj_points=op,
                        cfg=cfg))
            pen_fns[gender] = _make_penetration_fn(smpl, args.past_len)
        return refine_fns[gender], pen_fns[gender]

    tot = {"penetrate_before": 0.0, "penetrate_after": 0.0,
           "depth_before": 0.0, "depth_after": 0.0}
    nb = 0
    for i in range(len(ds)):
        clip = ds[i]
        gender = "male" if clip["gender"] == 0 else "female"
        refine, penetration = _fns(gender)
        body_pose = jnp.asarray(clip["body_pose"][:, :66])
        hand_pose = jnp.asarray(clip["body_pose"][:, 66:])
        body_trans = jnp.asarray(clip["body_trans"])
        betas = jnp.asarray(clip["body_betas"])
        obj_aa = jnp.asarray(clip["obj_angles"])
        obj_tr = jnp.asarray(clip["obj_trans"])
        obj_pts = jnp.asarray(clip["obj_points"][:, :3])
        out = refine(body_pose, hand_pose, body_trans, betas,
                     obj_aa, obj_tr, obj_pts)
        frac_b, depth_b = penetration(
            jnp.concatenate([body_pose, hand_pose], 1)[None], body_trans[None],
            betas[None], obj_aa[None], obj_tr[None], obj_pts[None])
        frac_a, depth_a = penetration(
            out["pose"][None], out["trans"][None], betas[None],
            out["obj_angles"][None], out["obj_trans"][None], obj_pts[None])
        nb += 1
        tot["penetrate_before"] += float(frac_b.mean())
        tot["penetrate_after"] += float(frac_a.mean())
        tot["depth_before"] += float(depth_b.mean())
        tot["depth_after"] += float(depth_a.mean())
        np.savez(os.path.join(args.out_dir, f"clip_{i}.npz"),
                 **{k: np.asarray(v) for k, v in out.items()})
        print(i, {k: round(v / nb, 5) for k, v in tot.items()},
              {"best_loss": round(float(out["best_loss"]), 5)})
        if args.limit and i + 1 >= args.limit:
            break

    summary = {k: v / max(nb, 1) for k, v in tot.items()}
    summary.update(clips=nb, iters=args.iters, mode="dataset")
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))


def _run_from_samples(args):
    """sample -> optimize -> metrics delta: the trained diffusion model
    feeds the refiner, and penetration is measured on both sides."""
    from interdiff_tpu.cli.common import (
        batch_iterator,
        fit_batch_size,
        restore_params,
        seed_everything,
        synthetic_smpl_batches,
        synthetic_smpl_body,
    )
    from interdiff_tpu.config import DiffusionConfig, SmplTrackConfig
    from interdiff_tpu.eval.optimization import OptimConfig, optimize_clip
    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig,
        make_sampler,
        postprocess_sample,
    )
    from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw

    rng = seed_everything(args.seed)
    cfg = SmplEvalConfig(past_len=args.past_len, future_len=args.future_len)
    track = SmplTrackConfig(
        past_len=args.past_len, future_len=args.future_len,
        diffusion=DiffusionConfig(timestep_respacing=args.respacing))
    model = track.build_model()
    diffusion = track.diffusion.build()

    if args.synthetic:
        smpl = synthetic_smpl_body(rng)
        loader = synthetic_smpl_batches(
            rng, batch_size=args.batch_size, seq_len=cfg.seq_len,
            num_points=256, steps=args.synthetic)
    else:
        from interdiff_tpu.cli.common import load_eval_sequences, load_smpl_models
        from interdiff_tpu.data.behave import BehaveDataset, collate

        smpl_models = load_smpl_models(args)
        smpl = smpl_models["male"]
        seqs = load_eval_sequences(args.motion_path, smpl_models)
        ds = BehaveDataset(seqs, past_len=args.past_len,
                           future_len=args.future_len, rng=rng,
                           fields="light")
        args.batch_size = fit_batch_size(len(ds), args.batch_size)
        loader = batch_iterator(ds, collate, batch_size=args.batch_size,
                                rng=rng, shuffle=False)

    T = cfg.seq_len
    from interdiff_tpu.cli.common import load_mdm

    model, params = load_mdm(
        args.diffusion_ckpt, "smpl", model,
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, T, 144)),
            jnp.zeros((2, 256, 6)), jnp.zeros((2,), jnp.int32),
            method=MDMSmpl.init_forward),
        past_len=args.past_len, future_len=args.future_len)

    sample = jax.jit(make_sampler(cfg, model, diffusion, smpl=smpl,
                                  use_correction=False))
    post = jax.jit(lambda x, hand, betas: postprocess_sample(
        cfg, smpl, x, hand, betas))
    penetration = _make_penetration_fn(smpl, args.past_len)

    # keep_after must stay below iters-1 or the best-iterate tracker
    # (take = i > keep_after, eval/optimization.py) never fires and the
    # refiner silently returns the initial params with best_loss=inf
    ocfg = OptimConfig(iters=args.iters,
                       keep_after=min(150, args.iters - 2),
                       ratio_denom=args.ratio_denom,
                       pen_fix_body=args.pen_fix_body)
    if args.dispatch_chunk > 0:
        # bounded dispatches: B clips x iters in ONE execution is what
        # crashes the axon worker at 8 x 350 — see make_chunked_refiner_batch
        from interdiff_tpu.eval.optimization import make_chunked_refiner_batch

        refine = make_chunked_refiner_batch(smpl, ocfg, args.dispatch_chunk)
    else:
        # lax.map (not vmap): the refiner body stays unbatched — one
        # compile, sequential clips, and no batching rewrite of the
        # HIGHEST-precision rotation matmuls (whose vmap form trips an
        # XLA:CPU verifier bug)
        refine = jax.jit(lambda bp, hp, tr, be, oa, ot, op: jax.lax.map(
            lambda a: optimize_clip(
                smpl, body_pose=a[0], hand_pose=a[1], body_trans=a[2],
                betas=a[3], obj_angles=a[4], obj_trans=a[5], obj_points=a[6],
                cfg=ocfg),
            (bp, hp, tr, be, oa, ot, op)))

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    tot = {"penetrate_before": 0.0, "penetrate_after": 0.0,
           "depth_before": 0.0, "depth_after": 0.0}
    nb = 0
    for batch in loader:
        gt = smpl_gt_from_raw(
            jnp.asarray(batch["body_pose"][..., :66]),
            jnp.asarray(batch["body_trans"]),
            jnp.asarray(batch["obj_angles"]),
            jnp.asarray(batch["obj_trans"]))
        obj_points6 = jnp.asarray(batch["obj_points"][..., :6])
        hand = jnp.asarray(batch["body_pose"][..., 66:])
        betas = jnp.asarray(batch["body_betas"]) \
            if "body_betas" in batch else jnp.zeros(gt.shape[:2] + (10,))

        key, k = jax.random.split(key)
        x = sample(params, k, gt, obj_points6, hand, betas)
        out = post(x, hand, betas)
        body_pred, obj_pred = out["body_pred"], out["obj_pred"]
        pts3 = obj_points6[..., :3]

        frac_b, depth_b = penetration(
            body_pred[..., :156], body_pred[..., 156:], betas,
            obj_pred[..., :3], obj_pred[..., 3:], pts3)

        refined = refine(body_pred[..., :66], body_pred[..., 66:156],
                         body_pred[..., 156:], betas, obj_pred[..., :3],
                         obj_pred[..., 3:], pts3)
        frac_a, depth_a = penetration(
            refined["pose"], refined["trans"], betas,
            refined["obj_angles"], refined["obj_trans"], pts3)

        nb += 1
        tot["penetrate_before"] += float(frac_b.mean())
        tot["penetrate_after"] += float(frac_a.mean())
        tot["depth_before"] += float(depth_b.mean())
        tot["depth_after"] += float(depth_a.mean())
        print(nb, {k: round(v / nb, 5) for k, v in tot.items()},
              {"best_loss": round(float(refined["best_loss"].mean()), 5)})
        np.savez(os.path.join(args.out_dir, f"refined_{nb}.npz"),
                 **{k2: np.asarray(v) for k2, v in refined.items()})
        if args.limit and nb >= args.limit:
            break

    summary = {k: v / max(nb, 1) for k, v in tot.items()}
    summary.update(batches=nb, iters=args.iters, respacing=args.respacing)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))


def _run_synthetic(args):
    """Smoke-refine synthetic clips with a synthetic SMPL-H-shaped body."""
    from interdiff_tpu.cli.common import synthetic_smpl_body
    from interdiff_tpu.eval.optimization import OptimConfig, optimize_clip

    rng = np.random.default_rng(233)
    smpl = synthetic_smpl_body(rng)

    os.makedirs(args.out_dir, exist_ok=True)
    T = args.past_len + args.future_len
    for i in range(args.synthetic):
        out = optimize_clip(
            smpl,
            body_pose=jnp.asarray(
                rng.standard_normal((T, 66)).astype(np.float32) * 0.2),
            hand_pose=jnp.asarray(
                rng.standard_normal((T, 90)).astype(np.float32) * 0.05),
            body_trans=jnp.asarray(
                rng.standard_normal((T, 3)).astype(np.float32) * 0.1),
            betas=jnp.zeros((T, 10)),
            obj_angles=jnp.asarray(
                rng.standard_normal((T, 3)).astype(np.float32) * 0.3),
            obj_trans=jnp.zeros((T, 3)),
            obj_points=jnp.asarray(
                rng.standard_normal((64, 3)).astype(np.float32) * 0.05),
            cfg=OptimConfig(iters=args.iters,
                            keep_after=min(150, args.iters - 2),
                            ratio_denom=args.ratio_denom,
                            pen_fix_body=args.pen_fix_body,
                            nn_chunk=None))
        np.savez(os.path.join(args.out_dir, f"synthetic_{i}.npz"),
                 **{k: np.asarray(v) for k, v in out.items()})
        print(i, "best_loss", float(out["best_loss"]))


if __name__ == "__main__":
    main()
