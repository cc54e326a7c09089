"""Decompose the SMPL diffusion train step (the INTERDIFF_BENCH_TRAIN
graph) into its subgraphs and time each on the real chip.

bench.py reports the train step hbm-bound at ~85% of the HBM roof
(B=32, T=35, P=1024 synthetic batch).  This script isolates where the
bytes/time go so optimization lands on the real hog:

  * full step (reference point, = bench mode)
  * PointNet++ encode fwd / fwd+bwd   (ball-query [B,1024,1024] d2 + gathers)
  * transformer denoiser fwd / fwd+bwd (memory precomputed)
  * 16-term loss pyramid alone
  * AdamW update alone

Run on the chip (no platform override):
    python scripts/profile_train_parts.py [--batch 32 --points 1024]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: E402
from interdiff_tpu.models.mdm_smpl import MDMSmpl  # noqa: E402
from interdiff_tpu.train.losses import smpl_diffusion_losses  # noqa: E402
from interdiff_tpu.train.trainer import (  # noqa: E402
    TrainState,
    adamw,
    make_smpl_train_step,
    smpl_cond_inputs,
)


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:36s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    B, T, P = args.batch, 35, args.points

    rng = np.random.default_rng(233)
    model = MDMSmpl()
    diffusion = GaussianDiffusion.create_named(steps=1000)
    batch = {
        "body_pose": jnp.asarray(
            rng.standard_normal((B, T, 156)).astype(np.float32) * 0.2),
        "body_trans": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32)),
        "obj_angles": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32) * 0.2),
        "obj_trans": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32)),
        "obj_points": jnp.asarray(
            rng.standard_normal((B, P, 6)).astype(np.float32)),
    }
    gt_probe = jnp.zeros((B, T, 144), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt_probe,
                        batch["obj_points"], jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    state = TrainState.create(params, adamw(3e-4))
    key = jax.random.PRNGKey(1)
    gt, obj_points = smpl_cond_inputs(batch)

    # --- full step (bench reference) --------------------------------------
    step = jax.jit(make_smpl_train_step(model, diffusion))
    bench("full train step", lambda: step(state, batch, key)[1]["loss"],
          reps=args.reps)

    # --- encoder ------------------------------------------------------------
    @jax.jit
    def enc_fwd(params, gt, obj_points):
        return model.apply(params, gt, obj_points, method=MDMSmpl.encode)

    memory = enc_fwd(params, gt, obj_points)
    bench("pointnet encode fwd", lambda: enc_fwd(params, gt, obj_points),
          reps=args.reps)

    @jax.jit
    def enc_grad(params, gt, obj_points):
        return jax.grad(
            lambda p: jnp.sum(model.apply(p, gt, obj_points,
                                          method=MDMSmpl.encode)))(params)

    bench("pointnet encode fwd+bwd",
          lambda: enc_grad(params, gt, obj_points), reps=args.reps)

    # --- denoiser (memory given) --------------------------------------------
    t = jnp.full((B,), 500, jnp.int32)

    @jax.jit
    def den_fwd(params, x, t, memory):
        return model.apply(params, x, t, memory)

    bench("denoiser fwd", lambda: den_fwd(params, gt, t, memory),
          reps=args.reps)

    @jax.jit
    def den_grad(params, x, t, memory):
        return jax.grad(
            lambda p: jnp.sum(model.apply(p, x, t, memory)))(params)

    bench("denoiser fwd+bwd", lambda: den_grad(params, gt, t, memory),
          reps=args.reps)

    # --- loss pyramid ---------------------------------------------------------
    @jax.jit
    def loss_only(pred, target):
        per_sample, _ = smpl_diffusion_losses(
            pred, target, past_len=model.past_len, smpl_dim=model.smpl_dim)
        return jnp.mean(per_sample)

    bench("16-term loss pyramid", lambda: loss_only(gt, gt * 0.9),
          reps=args.reps)

    # --- optimizer update -------------------------------------------------------
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt_only(state, grads):
        return state.apply_gradients(grads)

    bench("adamw apply_gradients", lambda: opt_only(state, grads),
          reps=args.reps)


if __name__ == "__main__":
    main()
