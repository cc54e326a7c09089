"""A/B: fused-SA Pallas route vs the rank-select route it replaced
(round-4 verdict item 2 — the fused-SA routing landed without a
measurement against the path it displaced).

Both routes share the rank-select grouping insight; the difference is
whether the folded MLP+max runs INSIDE the Pallas pass (fused-SA,
`ops/pallas_sa.py`) or as XLA ops over the kernel-grouped tensor
(rank-select, `ops/pallas_group.py` + `models/pointnet.py`'s SharedMLP).
`INTERDIFF_NO_FUSED_SA=1` (read at trace time) flips the routing, so one
process measures both.

Measured per shape (slope-timed, blocked-median — tunnel-artifact-proof):
  * PointNet2Encoder forward            (the sampler's per-batch cost)
  * PointNet2Encoder forward+backward   (the train step's encoder part)
  * full SMPL train step at B=32, P=1024 (production train shape)

    python scripts/ab_fused_sa.py [--batch 32] [--points 1024,2048]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def chain(name, op, x0, reps=5):
    from interdiff_tpu.utils.profiling import slope_time

    per = slope_time(op, x0, k_lo=1, k_hi=9, reps=reps)
    print(f"{name:56s} {per:8.2f} ms", flush=True)
    return per


def encoder_ab(B, P):
    from interdiff_tpu.models.pointnet import PointNet2Encoder

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-0.4, 0.4, (B, P, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, P, 1)).astype(np.float32))
    pc = jnp.concatenate([xyz, feats], axis=-1)[:, None]  # [B,1,P,4]
    enc = PointNet2Encoder(c_in=1, c_out=256, num_keypoints=1)
    ep = enc.init(jax.random.PRNGKey(0), pc)

    out = {}
    for label, env in (("fused-SA", "1"), ("rank-select", None)):
        if env is None:
            os.environ.pop("INTERDIFF_FUSED_SA", None)
        else:
            os.environ["INTERDIFF_FUSED_SA"] = env
        fwd = chain(f"[{label}] encoder fwd  B={B} P={P}",
                    lambda x: enc.apply(ep, x), pc)
        bwd = chain(f"[{label}] encoder f+b  B={B} P={P}",
                    lambda x: jax.grad(
                        lambda p: jnp.sum(enc.apply(p, x)))(ep), pc)
        out[label] = (fwd, bwd)
    return out


def train_step_ab(B, P):
    from interdiff_tpu.diffusion.gaussian import GaussianDiffusion
    from interdiff_tpu.models.mdm_smpl import MDMSmpl
    from interdiff_tpu.train.trainer import (
        TrainState,
        adamw,
        make_smpl_train_step,
    )
    from interdiff_tpu.utils.profiling import slope_time

    rng = np.random.default_rng(1)
    model = MDMSmpl()  # production config
    diffusion = GaussianDiffusion.create_named(steps=1000)
    T = model.past_len + model.future_len
    batch = {
        "body_pose": jnp.asarray(
            rng.standard_normal((B, T, 156)).astype(np.float32) * 0.2),
        "body_trans": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32)),
        "obj_angles": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32)),
        "obj_trans": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32)),
        "obj_points": jnp.asarray(
            rng.standard_normal((B, P, 6)).astype(np.float32)),
    }
    gt0 = jnp.zeros((B, T, 144), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt0, batch["obj_points"],
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    step = make_smpl_train_step(model, diffusion)

    out = {}
    for label, env in (("fused-SA", "1"), ("rank-select", None)):
        if env is None:
            os.environ.pop("INTERDIFF_FUSED_SA", None)
        else:
            os.environ["INTERDIFF_FUSED_SA"] = env
        state = TrainState.create(params, adamw())

        def one(st_and_key):
            st, key = st_and_key
            st2, _ = step(st, batch, key)
            return (st2, jax.random.fold_in(key, 1))

        per = slope_time(one, (state, jax.random.PRNGKey(2)),
                         k_lo=1, k_hi=9, reps=5)
        print(f"[{label}] train step  B={B} P={P}"
              f"{'':>24}{per:8.2f} ms  ({1000.0 / per:.1f} steps/s)",
              flush=True)
        out[label] = per
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=str, default="1024,2048")
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)
    for p in (int(s) for s in args.points.split(",")):
        encoder_ab(args.batch, p)
    if not args.skip_train:
        train_step_ab(args.batch, 1024)


if __name__ == "__main__":
    main()
