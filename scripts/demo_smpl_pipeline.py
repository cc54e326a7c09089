"""Flagship-pipeline demonstration on real hardware: the SMPL-track MDM
trains on structured synthetic BEHAVE-shaped motion, then the SIGNATURE
InterDiff inference path runs — 100-step reverse diffusion with the
physics-informed correction (using the REAL reference `correction.ckpt`
weights) compiled into the sampling scan, SMPL FK + signed distances and
all — and reports best-of-N metrics.

Run: python scripts/demo_smpl_pipeline.py [--steps 600]
Writes results/demo_smpl/metrics.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def make_batch(rng, B, T=35, P=2048):
    """Structured clips: drifting body pose/trans; object rides the body."""
    pose = np.zeros((B, T, 156), np.float32)
    pose[..., :66] = (rng.standard_normal((B, 1, 66)) * 0.2
                      + rng.standard_normal((B, 1, 66)) * 0.01
                      * np.arange(T)[None, :, None]).astype(np.float32)
    vel = rng.standard_normal((B, 1, 3)).astype(np.float32) * 0.03
    trans = vel * np.arange(T, dtype=np.float32)[None, :, None]
    obj_angles = (rng.standard_normal((B, 1, 3)) * 0.3
                  ).astype(np.float32).repeat(T, 1)
    obj_trans = trans + rng.standard_normal((B, 1, 3)).astype(np.float32) * 0.3
    pts = rng.standard_normal((B, P, 6)).astype(np.float32) * 0.2
    return {
        "body_pose": jnp.asarray(pose),
        "body_trans": jnp.asarray(trans),
        "obj_angles": jnp.asarray(obj_angles),
        "obj_trans": jnp.asarray(obj_trans),
        "obj_points": jnp.asarray(pts),
        "betas": jnp.zeros((B, T, 10)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--diverse", type=int, default=4)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--batch_eval", type=int, default=0,
                    help="eval batch (default = --batch)")
    ap.add_argument("--out", default="results/demo_smpl")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="run the best-of-N eval every N training steps")
    ap.add_argument("--save_params", default=None,
                    help="save trained params (orbax) here")
    ap.add_argument("--skip_untrained_eval", action="store_true",
                    help="skip the pre-training eval (the eval graph is the "
                         "big compile; training alone starts in minutes)")
    ap.add_argument("--restore_params", default=None,
                    help="restore trained params (orbax flat save, e.g. "
                         "artifacts/smpl_params) instead of starting fresh; "
                         "combine with --steps 0 to evaluate a checkpoint")
    ap.add_argument("--mode", default="correction",
                    choices=["correction", "no_correction"],
                    help="A/B the physics-informed correction: no_correction "
                         "drops the in-scan projector (same noise keys, so "
                         "the two runs are directly comparable)")
    args = ap.parse_args()

    from interdiff_tpu.cli.common import seed_everything, synthetic_smpl_body

    seed_everything(233)  # also enables the persistent compile cache

    from interdiff_tpu.config import DiffusionConfig, SmplTrackConfig
    from interdiff_tpu.eval.metrics import smpl_metrics
    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig,
        make_sampler,
        postprocess_sample,
    )
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        make_smpl_train_step,
    )
    from interdiff_tpu.utils.checkpoint import load_correction_smpl

    os.makedirs(args.out, exist_ok=True)
    track = SmplTrackConfig(
        diffusion=DiffusionConfig(timestep_respacing="100"))
    model = track.build_model()
    diffusion = track.diffusion.build()
    cfg = SmplEvalConfig(correction_t_max=50, correction_every=5)

    rng = np.random.default_rng(233)
    # the shared closed watertight stand-in body (penetration behaves);
    # seeded independently of the data stream
    smpl = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    use_corr = args.mode == "correction"
    projector = ObjProjectorSmpl() if use_corr else None
    projector_params = load_correction_smpl()[0] if use_corr else None

    P = args.points
    ex = make_batch(rng, 2, P=P)
    gt0 = smpl_gt_from_raw(ex["body_pose"][..., :66], ex["body_trans"],
                           ex["obj_angles"], ex["obj_trans"])
    params = model.init(jax.random.PRNGKey(0), gt0, ex["obj_points"],
                        jnp.zeros((2,), jnp.int32),
                        method=MDMSmpl.init_forward)
    if args.restore_params:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.restore_params), target=params)
        print("restored params from", args.restore_params, flush=True)
    state = TrainState.create(params, adamw(3e-4))
    step = jax.jit(make_smpl_train_step(model, diffusion),
                   donate_argnums=(0,))

    sample = jax.jit(make_sampler(
        cfg, model, diffusion, smpl=smpl, projector=projector,
        projector_params=projector_params, use_correction=use_corr,
        reuse_memory=True))
    encode = jax.jit(lambda p, g, pts: model.apply(p, g, pts,
                                                   method=MDMSmpl.encode))

    val = make_batch(np.random.default_rng(7), args.batch_eval or args.batch,
                     P=P)
    val_gt = smpl_gt_from_raw(val["body_pose"][..., :66], val["body_trans"],
                              val["obj_angles"], val["obj_trans"])
    hand = val["body_pose"][..., 66:]

    # jitted FK postprocess + metrics (eager 6890-vert FK over the axon
    # tunnel dispatches op-by-op and takes minutes per eval)
    post = jax.jit(lambda x, hand, betas: postprocess_sample(
        cfg, smpl, x, hand, betas))
    faces_j = jnp.asarray(smpl.faces)

    @jax.jit
    def metrics_fn(out, gt_post, obj_pts3):
        pp = cfg.past_len
        return smpl_metrics(
            out["obj_pred"][:, pp:], out["jtr"][:, pp:],
            out["body_pred"][:, pp:], gt_post["obj_pred"][:, pp:],
            gt_post["jtr"][:, pp:], gt_post["body_pred"][:, pp:],
            out["verts"][:, pp:], faces_j, obj_pts3)

    def evaluate(params, key):
        gt_post = post(val_gt, hand, val["betas"])
        memory = encode(params, val_gt, val["obj_points"])
        best = None
        for j in range(args.diverse):
            key, k = jax.random.split(key)
            x = sample(params, k, val_gt, val["obj_points"], hand,
                       val["betas"], memory)
            out = post(x, hand, val["betas"])
            m = metrics_fn(out, gt_post, val["obj_points"][..., :3])
            m = {k2: np.asarray(v) for k2, v in m.items()}
            best = m if best is None else {k2: np.minimum(best[k2], m[k2])
                                           for k2 in m}
        return {k2: float(v.mean()) for k2, v in best.items()}

    log = open(os.path.join(args.out, "metrics.jsonl"), "w")
    m0 = None
    if not args.skip_untrained_eval:
        t0 = time.time()
        m0 = evaluate(state.params, jax.random.PRNGKey(100))
        print(f"untrained ({time.time()-t0:.0f}s incl. compile):", m0,
              flush=True)
        log.write(json.dumps({"step": 0, **m0}) + "\n")

    key = jax.random.PRNGKey(1)
    keep = ("body_pose", "body_trans", "obj_angles", "obj_trans",
            "obj_points")
    t0 = time.time()
    for i in range(args.steps):
        batch = {k: v for k, v in make_batch(rng, args.batch, P=P).items()
                 if k in keep}
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if args.eval_every and (i + 1) % args.eval_every == 0:
            mi = evaluate(state.params, jax.random.PRNGKey(100))
            print(f"step {i+1}: loss={float(metrics['loss']):.4f}", mi,
                  flush=True)
            log.write(json.dumps(
                {"step": i + 1, "loss": float(metrics["loss"]), **mi}) + "\n")
            log.flush()
    dt = time.time() - t0
    print(f"trained {args.steps} steps in {dt:.1f}s "
          f"({args.steps/dt:.1f} steps/s)", flush=True)

    if args.save_params:
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.save_params)
        ocp.StandardCheckpointer().save(path, jax.device_get(state.params))
        print("params saved to", path, flush=True)

    m1 = evaluate(state.params, jax.random.PRNGKey(100))
    print("trained:", m1, flush=True)
    row = {"step": args.steps, **m1}
    if args.steps:
        row["loss"] = float(metrics["loss"])
    log.write(json.dumps(row) + "\n")
    if m0 is not None:
        imp = m0["global_mpjpe"] / max(m1["global_mpjpe"], 1e-9)
        print(f"global_mpjpe improvement: {imp:.1f}x "
              f"({m0['global_mpjpe']:.4f} -> {m1['global_mpjpe']:.4f})",
              flush=True)
        log.write(json.dumps({"improvement_x": imp}) + "\n")
    log.close()



if __name__ == "__main__":
    main()
