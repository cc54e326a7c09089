"""End-to-end system demonstration: train the skeleton MDM on structured
synthetic motion (constant-velocity walker + rigidly attached object),
then sample with inpainting and show the future-frame MPJPE improving vs
the untrained model.

Run: python scripts/demo_train_eval.py [--steps 1500] [--batch 64]
Produces results/demo/metrics.jsonl + a rendered gif.
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


def make_structured_batch(rng, B, T=20, J=21, P=12):
    """Clips with learnable structure: each joint moves with a constant
    per-clip velocity; 12 object keypoints ride rigidly 0.5 m in front of
    the root joint; pose = translation + identity quaternion."""
    base = rng.standard_normal((B, 1, J, 3)).astype(np.float32) * 0.3
    vel = rng.standard_normal((B, 1, 1, 3)).astype(np.float32) * 0.05
    t = np.arange(T, dtype=np.float32)[None, :, None, None]
    skeleton = base + vel * t
    offsets = rng.standard_normal((B, 1, P, 3)).astype(np.float32) * 0.2
    root = skeleton[:, :, :1]
    obj = root + 0.5 + offsets + vel * t * 0  # static offset from moving root
    obj = root + offsets + 0.5
    trans = obj.mean(axis=2)
    quat = np.zeros((B, T, 4), np.float32)
    quat[..., 3] = 1.0  # identity, xyzw
    poses = np.concatenate([trans, quat], axis=-1)
    zero_pose = (obj[:, 0] - trans[:, 0, None]).astype(np.float32)
    return {
        "skeleton": jnp.asarray(skeleton),
        "obj_points": jnp.asarray(obj),
        "poses": jnp.asarray(poses),
        "zero_pose_obj": jnp.asarray(zero_pose),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="results/demo")
    ap.add_argument("--save_params", default=None,
                    help="save trained params (orbax) here")
    args = ap.parse_args()

    from interdiff_tpu.config import SkeletonTrackConfig
    from interdiff_tpu.eval.metrics import skeleton_metrics
    from interdiff_tpu.eval.skeleton import (
        SkeletonEvalConfig,
        make_skeleton_sampler,
        split_skeleton_state,
    )
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        make_skeleton_train_step,
    )

    os.makedirs(args.out, exist_ok=True)
    track = SkeletonTrackConfig(past_len=10, future_len=10)
    model = track.build_model()
    diffusion = track.diffusion.build()
    eval_cfg = SkeletonEvalConfig(past_len=10, future_len=10)

    rng = np.random.default_rng(233)
    ex = make_structured_batch(rng, 2)
    params = model.init(
        jax.random.PRNGKey(0), ex["skeleton"], ex["obj_points"], ex["poses"],
        ex["zero_pose_obj"], jnp.zeros((2,), jnp.int32),
        method=MDMSkeleton.init_forward)
    state = TrainState.create(params, adamw(3e-4))
    step = jax.jit(make_skeleton_train_step(model, diffusion),
                   donate_argnums=(0,))
    sampler = jax.jit(make_skeleton_sampler(eval_cfg, model, diffusion))

    val_batch = make_structured_batch(np.random.default_rng(7), 32)

    def validate(params, key):
        x = sampler(params, key, val_batch["skeleton"],
                    val_batch["obj_points"], val_batch["poses"],
                    val_batch["zero_pose_obj"])
        pred = split_skeleton_state(x, eval_cfg)
        m = skeleton_metrics(pred["body"], val_batch["skeleton"],
                             pred["obj"], val_batch["obj_points"],
                             pred["pose"], val_batch["poses"], start=10)
        return {k: float(v) for k, v in m.items()}

    log = open(os.path.join(args.out, "metrics.jsonl"), "w")
    m0 = validate(state.params, jax.random.PRNGKey(100))
    print("untrained:", m0, flush=True)
    log.write(json.dumps({"step": 0, **m0}) + "\n")

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        batch = make_structured_batch(rng, args.batch)
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if (i + 1) % 250 == 0:
            mv = validate(state.params, jax.random.fold_in(
                jax.random.PRNGKey(100), i))
            row = {"step": i + 1, "loss": float(metrics["loss"]), **mv}
            print(row, flush=True)
            log.write(json.dumps(row) + "\n")
            log.flush()
    dt = time.time() - t0
    m1 = validate(state.params, jax.random.PRNGKey(100))
    print(f"trained {args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.1f} steps/s)", flush=True)
    print("final:", m1, flush=True)
    improvement = m0["mpjpe_h"] / max(m1["mpjpe_h"], 1e-9)
    print(f"mpjpe_h improvement: {improvement:.1f}x "
          f"({m0['mpjpe_h']:.4f} -> {m1['mpjpe_h']:.4f})", flush=True)
    log.write(json.dumps({"step": args.steps, "final": m1,
                          "improvement_x": improvement}) + "\n")
    log.close()

    if args.save_params:
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.save_params)
        ocp.StandardCheckpointer().save(path, jax.device_get(state.params))
        print("params saved to", path, flush=True)

    try:
        from interdiff_tpu.viz.skeleton_viz import visualize_skeleton

        x = sampler(state.params, jax.random.PRNGKey(5),
                    val_batch["skeleton"], val_batch["obj_points"],
                    val_batch["poses"], val_batch["zero_pose_obj"])
        pred = split_skeleton_state(x, eval_cfg)
        visualize_skeleton(
            np.asarray(val_batch["skeleton"][0]),
            np.asarray(val_batch["obj_points"][0]),
            os.path.join(args.out, "demo.gif"),
            pred=np.asarray(pred["body"][0]),
            obj_pred=np.asarray(pred["obj"][0]), past_len=10)
        print("gif written", flush=True)
    except Exception as e:
        print("render skipped:", e, flush=True)


if __name__ == "__main__":
    main()
