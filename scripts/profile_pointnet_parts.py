"""Micro-profile the PointNet++ encoder's constituent ops on the chip.

profile_train_parts.py showed encode fwd = 48.8 of the 57.3 ms train step
(B=32, P=1024).  This decomposes that number so the rewrite targets the
actual hog.

Axon artifact guard (measured, 2026-08-19): the tunnel memoizes RESULTS
keyed on (executable, args) — a repeated identical dispatch returns in
~0.03 ms without touching the chip, EVEN when the op is chained inside a
fori_loop (T1 == T9 == 0.03 ms), and a small cycled buffer pool all fits
in that cache.  Ground truth here needs BOTH guards:

  * every timed dispatch gets a UNIQUE input (x0 * (1 + 1e-6 * i)), so the
    memo never hits;
  * the op is chained K times inside one dispatch via lax.fori_loop with a
    scalar feedback term (output -> next input, so XLA cannot CSE the
    iterations), timed at two K values, and the reported number is the
    slope — tunnel RTT and transfer costs cancel:

        per-op ms = (T(K_hi) - T(K_lo)) / (K_hi - K_lo)

The feedback mix is one mean + one broadcast multiply per iteration —
noise next to the ms-scale ops under test.

Run on the chip:  python scripts/profile_pointnet_parts.py
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.ops.pointcloud import (  # noqa: E402
    ball_query,
    furthest_point_sample,
    gather_points,
    hierarchical_fps,
    pairwise_sqdist,
    query_and_group,
)

K_LO, K_HI = 1, 9


def chain(name, op, x0, reps=5):
    """op: perturbable_input -> output pytree.  Returns slope ms.

    Delegates to utils/profiling.slope_time, which blocks EVERY dispatch
    (async-queued reps get acked by the tunnel before executing) and takes
    the median per rep (single tunnel hiccups otherwise skew the slope)."""
    from interdiff_tpu.utils.profiling import slope_time

    per = slope_time(op, x0, k_lo=K_LO, k_hi=K_HI, reps=reps)
    print(f"{name:46s} {per:8.2f} ms", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=int, default=1024)
    args = ap.parse_args()
    B, P = args.batch, args.points
    M = min(1024, P)  # stage-1 centers (npoint)

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, P, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, P, 1)).astype(np.float32))
    new = xyz[:, :M]

    chain("hierarchical_fps g=16 (P->1024)",
          lambda x: hierarchical_fps(x, M, 16), xyz)
    chain("exact furthest_point_sample (P->1024)",
          lambda x: furthest_point_sample(x, M), xyz)
    chain("pairwise_sqdist [B,M,P]",
          lambda x: pairwise_sqdist(x[:, :M], x), xyz)
    d2 = pairwise_sqdist(new, xyz)
    chain("top_k(32) on [B,M,P] scores",
          lambda d: jax.lax.top_k(jnp.where(d < 0.01, -d, -jnp.inf), 32)[1],
          d2)
    for ns, r in ((16, 0.05), (32, 0.1)):
        chain(f"ball_query r={r} ns={ns}",
              lambda x, n=ns, rr=r: ball_query(x, x[:, :M], rr, n), xyz)
    idx = ball_query(xyz, new, 0.1, 32)
    chain("gather_points xyz [B,M,32]",
          lambda x: gather_points(x, idx), xyz)
    for ns, r in ((16, 0.05), (32, 0.1)):
        chain(f"query_and_group ns={ns}",
              lambda x, n=ns, rr=r: query_and_group(
                  x, x[:, :M], jnp.sum(x, -1, keepdims=True), rr, n), xyz)

    # shared-MLP chains at stage-1 shapes (dense matmuls + BN + relu)
    from interdiff_tpu.models.pointnet import (  # noqa: E402
        PointNet2Encoder, SAModuleMSG, SharedMLP)
    for ns, chans in ((16, (16, 16, 32)), (32, (32, 32, 64))):
        g0 = jnp.asarray(
            rng.standard_normal((B, M, ns, 4)).astype(np.float32))
        mlp = SharedMLP(chans)
        p = mlp.init(jax.random.PRNGKey(0), g0)
        chain(f"SharedMLP {chans} ns={ns} + maxpool",
              lambda g, m=mlp, pp=p: jnp.max(m.apply(pp, g), axis=2), g0)

    # ---- SA stages + whole encoder ----------------------------------------
    sa0 = SAModuleMSG(npoint=1024, radii=(0.05, 0.1), nsamples=(16, 32),
                      mlps=((16, 16, 32), (32, 32, 64)), fps_groups=16)
    p0 = sa0.init(jax.random.PRNGKey(0), xyz, feats)
    chain("SAModuleMSG stage1 (npoint=1024)",
          lambda x: sa0.apply(p0, x, jnp.sum(x, -1, keepdims=True)), xyz)

    f1 = sa0.apply(p0, xyz, feats)[1]
    sa1 = SAModuleMSG(npoint=1, radii=(0.1, 0.2), nsamples=(16, 32),
                      mlps=((64, 64, 128), (64, 96, 128)))
    p1 = sa1.init(jax.random.PRNGKey(0), new, f1)
    chain("SAModuleMSG stage2 (npoint=1)",
          lambda x: sa1.apply(p1, x, f1), new)

    pc = jnp.concatenate([xyz, feats], axis=-1)[:, None]  # [B,1,P,4]
    enc = PointNet2Encoder(c_in=1, c_out=256, num_keypoints=1)
    ep = enc.init(jax.random.PRNGKey(0), pc)
    chain("PointNet2Encoder fwd", lambda x: enc.apply(ep, x), pc)
    chain("PointNet2Encoder fwd+bwd",
          lambda x: jax.grad(
              lambda y: jnp.sum(enc.apply(ep, y)))(x), pc)

    # ---- full MDMSmpl.encode (pointnet + embeddings + 8-layer QaN stack) ---
    from interdiff_tpu.models.mdm_smpl import MDMSmpl  # noqa: E402
    model = MDMSmpl()
    T = 35
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    op6 = jnp.concatenate([xyz, xyz], axis=-1)  # [B,P,6]
    params = model.init(jax.random.PRNGKey(0), gt, op6,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    chain("MDMSmpl.encode (full)",
          lambda o: model.apply(params, gt, o, method=MDMSmpl.encode), op6)
    # op6 is loop-invariant here, so XLA hoists the whole pointnet subgraph
    # out of the fori_loop: the slope isolates embeddings + the QaN stack.
    chain("MDMSmpl.encode minus pointnet (QaN stack)",
          lambda g: model.apply(params, g, op6, method=MDMSmpl.encode), gt)
    # direct: the 8-layer encoder TransformerStack alone on [B,past,256]
    emb0 = jnp.asarray(rng.standard_normal(
        (B, model.past_len, model.embed_dim)).astype(np.float32))
    chain("encoder TransformerStack alone",
          lambda e: model.apply(params, e,
                                method=lambda m, x: m.encoder(x)), emb0)

    # ---- full train step + adamw, chained through TrainState --------------
    # the state feeds forward naturally (state_{i+1} = step(state_i)), so no
    # feedback mix is needed and donation stays inside the loop carry.
    from interdiff_tpu.diffusion.gaussian import GaussianDiffusion  # noqa: E402
    from interdiff_tpu.train.trainer import (  # noqa: E402
        TrainState, adamw, make_smpl_train_step)

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
        "obj_points": op6,
    }
    step = make_smpl_train_step(model, diffusion)
    key = jax.random.PRNGKey(1)
    state0 = TrainState.create(params, adamw(3e-4))

    def chain_state(name, step_fn, reps=4):
        def run_k(k):
            @jax.jit
            def g(state):
                return jax.lax.fori_loop(
                    0, k, lambda _, s: step_fn(s), state)

            def variant(i):
                p = jax.tree.map(
                    lambda a: a * (1.0 + 1e-6 * i)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    state0.params)
                return state0.replace(params=p)

            jax.block_until_ready(g(variant(k * 100)))  # compile + warm
            times = []
            for i in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(g(variant(k * 100 + i + 1)))
                times.append((time.perf_counter() - t0) * 1e3)
            return statistics.median(times)

        t_lo, t_hi = run_k(K_LO), run_k(K_HI)
        per = (t_hi - t_lo) / (K_HI - K_LO)
        print(f"{name:46s} {per:8.2f} ms   (T1={t_lo:7.2f}  T9={t_hi:7.2f})",
              flush=True)

    chain_state("FULL smpl train step (chained)",
                lambda s: step(s, batch, key)[0])
    grads = jax.tree.map(jnp.ones_like, params)
    chain_state("adamw apply_gradients (chained)",
                lambda s: s.apply_gradients(grads))


if __name__ == "__main__":
    main()
