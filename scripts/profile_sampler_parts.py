"""Decompose the headline sampling scan's per-step latency on the chip.

bench.py measures ~1.05 ms per reverse-diffusion step at the eval layout
(64 rows x 35 tokens, d 256, 8-layer cross-attn decoder) and the roofline
fields say the scan sits at 0.16% MFU / 1.2% HBM — far from both roofs.  This
script times the step's constituents in isolation so any kernel-fusion
effort lands where the time actually goes:

  * one full denoiser apply (the scan body minus schedule math)
  * a single QaN decoder layer / vanilla decoder layer
  * the embeddings + output heads
  * the p_sample schedule math + noise draw around the denoiser
  * the full 100-step scan (reference point, = bench.py)

Run on the chip (no platform override):
    python scripts/profile_sampler_parts.py
    python scripts/profile_sampler_parts.py --rows_sweep   # 64/128/320 rows

The --rows_sweep mode settled the round-3 "latency-bound vs falling fold
sweep" contradiction: if per-step ms were ~flat in rows, the step would be
dispatch/latency-bound and wider batches should win; instead the v5e
measurement shows per-row cost RISING with width (0.864 / 0.949 / 1.058 ms
per 64 rows at 64/128/320 rows, i.e. 74.1 → 67.5 → 60.5 rows·steps/ms) —
the chain is throughput-limited at 64 rows already and the correct verdict
is "occupancy-bound on small serial ops" (bench.py now reports it as such).
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

from interdiff_tpu.diffusion.gaussian import (  # noqa: E402
    GaussianDiffusion,
    Inpaint,
)
from interdiff_tpu.models.layers import (  # noqa: E402
    DecoderLayer,
    QaNDecoderLayer,
)
from interdiff_tpu.models.mdm_smpl import MDMSmpl  # noqa: E402

B, T, E, FF, H = 64, 35, 256, 1024, 4  # bench fold-2 layout
PAST = 10


def bench(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(233)
    model = MDMSmpl()
    diffusion = GaussianDiffusion.create_named(
        steps=1000, timestep_respacing="100")

    gt = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    obj_points = jnp.asarray(rng.standard_normal((B, 256, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt, obj_points,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    memory = jnp.asarray(rng.standard_normal((B, PAST, E)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    t = jnp.full((B,), 50, jnp.int32)
    mask = jnp.zeros((B, T, 144), bool).at[:, :PAST].set(True)

    denoise = jax.jit(lambda x, t: model.apply(params, x, t, memory))
    d_full = bench("denoiser apply (16-layer fwd)", denoise, x, t)

    # single layers at the denoiser's hidden shape
    h = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    qan = QaNDecoderLayer(E, H, FF)
    qp = qan.init(jax.random.PRNGKey(1), h, memory)
    d_qan = bench("one QaN decoder layer", jax.jit(
        lambda a, m: qan.apply(qp, a, m)), h, memory)
    van = DecoderLayer(E, H, FF)
    vp = van.init(jax.random.PRNGKey(2), h, memory)
    d_van = bench("one vanilla decoder layer", jax.jit(
        lambda a, m: van.apply(vp, a, m)), h, memory)
    print(f"{'  -> 6*qan + 2*vanilla':44s} {(6 * d_qan + 2 * d_van) * 1e3:9.3f} ms")

    # p_sample step = denoiser + schedule math + noise
    def one_step(x, t, key):
        def model_fn(xx, ts):
            return model.apply(params, xx, ts, memory)

        return diffusion.p_sample(model_fn, x, t, key,
                                  inpaint=Inpaint(mask, gt))["sample"]

    d_step = bench("p_sample (denoiser + schedule + noise)",
                   jax.jit(one_step), x, t, jax.random.PRNGKey(3))

    def full(key):
        def model_fn(xx, ts):
            return model.apply(params, xx, ts, memory)

        return diffusion.p_sample_loop(model_fn, key, (B, T, 144),
                                       inpaint=Inpaint(mask, gt))

    d_scan = bench("100-step p_sample_loop scan", jax.jit(full),
                   jax.random.PRNGKey(4), reps=5)
    print(f"{'  -> scan per step':44s} {d_scan / 100 * 1e3:9.3f} ms")
    print(f"{'  -> dispatch overhead per isolated call':44s} "
          f"{(d_step - d_scan / 100) * 1e3:9.3f} ms")


def matmul_floor():
    """Floor check: the decoder stack's matmuls alone (3 per vanilla-ish
    layer x 16 + heads), no attention softmaxes / layernorms — how close
    XLA's step time is to its pure-MXU content."""
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((B * T, E)), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((16, E, 3 * E)), jnp.float32) * 0.02
    w_up = jnp.asarray(rng.standard_normal((16, E, FF)), jnp.float32) * 0.02
    w_dn = jnp.asarray(rng.standard_normal((16, FF, E)), jnp.float32) * 0.02

    @jax.jit
    def chain(h):
        for i in range(16):
            q = h @ w_qkv[i]
            h = jnp.tanh(q[:, :E])  # stand-in nonlinearity, keeps dims
            u = h @ w_up[i]
            h = u @ w_dn[i]
        return h

    bench("16-layer matmul-only chain (qkv+up+down)", chain, h0)


def rows_sweep():
    """Time the full 100-step scan at 64/128/320 rows (fold 2/4/10 of the
    32-sequence best-of-10 eval).  Per-step ms vs rows is the evidence the
    fold sweep can't give (seq/s mixes in host-side batching effects)."""
    rng = np.random.default_rng(233)
    model = MDMSmpl()
    diffusion = GaussianDiffusion.create_named(
        steps=1000, timestep_respacing="100")
    print(f"{'rows':>6s} {'scan ms':>10s} {'ms/step':>9s} "
          f"{'ms/step/64rows':>15s} {'rows*steps/ms':>14s}")
    for rows in (64, 128, 320):
        gt = jnp.asarray(rng.standard_normal((rows, T, 144)), jnp.float32)
        obj_points = jnp.asarray(
            rng.standard_normal((rows, 256, 6)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), gt, obj_points,
                            jnp.zeros((rows,), jnp.int32),
                            method=MDMSmpl.init_forward)
        memory = jnp.asarray(
            rng.standard_normal((rows, PAST, E)), jnp.float32)
        mask = jnp.zeros((rows, T, 144), bool).at[:, :PAST].set(True)

        @jax.jit
        def full(key, gt=gt, params=params, memory=memory, mask=mask):
            def model_fn(xx, ts):
                return model.apply(params, xx, ts, memory)

            return diffusion.p_sample_loop(model_fn, key, (rows, T, 144),
                                           inpaint=Inpaint(mask, gt))

        salt = int.from_bytes(os.urandom(4), "little")  # cross-process
        # memo guard: the tunnel caches results by (executable, args) even
        # across reruns of this script, so keys must never repeat
        jax.block_until_ready(full(jax.random.PRNGKey(salt)))
        # block EVERY dispatch and take the median: async-queued reps let
        # the tunnel ack work before executing it, and one tunnel hiccup
        # corrupts a mean (same lesson as utils/profiling.slope_time)
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(full(jax.random.PRNGKey(salt + i + 1)))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2] * 1e3
        per = dt / 100
        print(f"{rows:6d} {dt:10.2f} {per:9.3f} "
              f"{per / (rows / 64):15.3f} {rows * 100 / dt:14.1f}",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows_sweep", action="store_true")
    args = ap.parse_args()
    if args.rows_sweep:
        rows_sweep()
    else:
        main()
        matmul_floor()
