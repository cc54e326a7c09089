"""Decompose the SMPL diffusion train step (the INTERDIFF_BENCH_TRAIN
graph) into its subgraphs and time each on the real chip.

All timings are SLOPE-based via `utils/profiling.slope_time`: each part
runs K-chained inside one jitted `fori_loop` at K=1 and K=9 and the
per-iteration cost is the slope (t9 - t1) / 8.  This cancels the
per-dispatch overhead (tunnel RTT + launch fixed cost, ~1-2 ms each)
that polluted the round-3 standalone numbers — e.g. "AdamW 14 ms" for a
~10M-param update whose HBM cost at the 819 GB/s roof is ~0.3 ms.
slope_time blocks every dispatch and takes the median — the first
(async-queued, mean-based) version of this script reported negative
slopes.

Two accountings are printed:

  * STANDALONE subgraph timings (enc fwd / fwd+bwd, denoiser fwd /
    fwd+bwd, loss, adamw) — serialized upper bounds.  These need NOT sum
    to the full step: measured round 4, they sum to 23.5 ms against a
    14.6 ms step, because XLA schedules the ~150 per-leaf adamw update
    kernels and the backward differently when they live in one program.
  * a MARGINAL LADDER of nested graphs L0 (loss fwd) ⊂ L1 (+backward) ⊂
    L2 (+adamw ≈ full step): rung differences are in-context marginal
    costs and partition the step by construction (round-3 verdict
    item 5's subtraction-based attribution).

Run on the chip (no platform override):
    python scripts/profile_train_parts.py [--batch 32 --points 1024]
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

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: E402
from interdiff_tpu.models.mdm_smpl import MDMSmpl  # noqa: E402
from interdiff_tpu.train.losses import smpl_diffusion_losses  # noqa: E402
from interdiff_tpu.utils.profiling import slope_time  # noqa: E402
from interdiff_tpu.train.trainer import (  # noqa: E402
    TrainState,
    adamw,
    make_smpl_train_step,
    sample_timesteps,
    smpl_cond_inputs,
)

def chain(name, op, x0, reps=5):
    """Slope-timed per-op ms (see utils/profiling.slope_time)."""
    per = slope_time(op, x0, reps=reps)
    print(f"{name:36s} {per:8.2f} ms", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B, T, P = args.batch, 35, args.points

    print("platform:", jax.devices()[0].platform, flush=True)
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
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.2f} M", flush=True)

    # --- full step (bench reference): chain the TrainState ------------------
    raw_step = make_smpl_train_step(model, diffusion)

    t_full = chain("full train step",
                   lambda st: raw_step(st, batch, key)[0], state,
                   reps=args.reps)

    # --- encoder -------------------------------------------------------------
    @jax.jit
    def enc_fwd(params, gt, obj_points):
        return model.apply(params, gt, obj_points, method=MDMSmpl.encode)

    memory = enc_fwd(params, gt, obj_points)
    chain("pointnet encode fwd",
          lambda g: enc_fwd(params, g, obj_points), gt, reps=args.reps)

    def enc_grad(g):
        return jax.grad(
            lambda p: jnp.sum(model.apply(p, g, obj_points,
                                          method=MDMSmpl.encode)))(params)

    t_enc = chain("pointnet encode fwd+bwd", enc_grad, gt, reps=args.reps)

    # --- denoiser (memory given) ----------------------------------------------
    t_step = jnp.full((B,), 500, jnp.int32)

    chain("denoiser fwd",
          lambda x: model.apply(params, x, t_step, memory), gt,
          reps=args.reps)

    def den_grad(x):
        return jax.grad(
            lambda p: jnp.sum(model.apply(p, x, t_step, memory)))(params)

    t_den = chain("denoiser fwd+bwd", den_grad, gt, reps=args.reps)

    # --- loss pyramid -----------------------------------------------------------
    def loss_only(pred):
        per_sample, _ = smpl_diffusion_losses(
            pred, gt * 0.9, past_len=model.past_len, smpl_dim=model.smpl_dim)
        return jnp.mean(per_sample)

    t_loss = chain("16-term loss pyramid", loss_only, gt, reps=args.reps)

    # --- optimizer update: chain the state -----------------------------------
    grads = jax.tree.map(jnp.ones_like, params)

    t_opt = chain("adamw apply_gradients",
                  lambda st: st.apply_gradients(grads), state,
                  reps=args.reps)

    parts = t_enc + t_den + t_loss + t_opt
    print(f"\nsum of STANDALONE parts = {parts:.2f} ms vs full step "
          f"{t_full:.2f} ms — standalone numbers are serialized upper "
          "bounds of subgraphs XLA schedules differently in context; "
          "attribution below uses the subtraction ladder instead",
          flush=True)

    # --- marginal ladder: nested graphs L0 ⊂ L1 ⊂ L2 ≈ full step, so the
    # differences are each stage's IN-CONTEXT marginal cost and the rungs
    # partition the step by construction (round-4 measurement: standalone
    # parts summed to 23.5 ms against a 14.6 ms step — adamw's per-leaf
    # update kernels schedule under the backward in the full program).
    def ladder_loss(params):
        k_t, k_noise = jax.random.split(key)
        memory2 = model.apply(params, gt, obj_points, method=MDMSmpl.encode)
        t, w = sample_timesteps(k_t, gt.shape[0], diffusion.num_timesteps)
        noise = jax.random.normal(k_noise, gt.shape, gt.dtype)
        pred, target = diffusion.training_losses(
            lambda x, ts: model.apply(params, x, ts, memory2), gt, t,
            noise=noise)
        per_sample, _ = smpl_diffusion_losses(
            pred, target, past_len=model.past_len, smpl_dim=model.smpl_dim)
        return jnp.mean(per_sample * w)

    l0 = chain("ladder L0 loss fwd", lambda st: ladder_loss(st.params),
               state, reps=args.reps)
    l1 = chain("ladder L1 +backward",
               lambda st: jax.grad(ladder_loss)(st.params), state,
               reps=args.reps)
    l2 = chain("ladder L2 +adamw (~full)",
               lambda st: st.apply_gradients(jax.grad(ladder_loss)(st.params)),
               state, reps=args.reps)
    print(f"\nmarginal attribution: fwd {l0:.2f} ms "
          "(split: standalone enc/den/loss fwd rows above), "
          f"backward +{l1 - l0:.2f} ms, adamw +{l2 - l1:.2f} ms; "
          f"ladder total {l2:.2f} ms vs full step {t_full:.2f} ms "
          f"({(l2 - t_full) / t_full * 100:+.1f}% — ladder omits the "
          "metrics/quartile tail)", flush=True)
    print(f"train throughput: {B / t_full * 1e3:.1f} seq/s "
          f"({1e3 / t_full:.1f} steps/s at B={B})", flush=True)


if __name__ == "__main__":
    main()
