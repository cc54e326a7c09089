"""Drive the fused ball-query+group kernel (`ops/pallas_group.py`) on the
real chip: Mosaic lowering check, bit-equality vs the XLA pipeline, and
slope-timed perf at the train shape (B=32, M=N=1024, S=16/32, C=4).

Interpret-mode tests (tests/test_pallas_group.py) do NOT catch TPU
lowering-constraint errors — run this after any kernel change (same
protocol as scripts/pallas_tpu_attempt.py for the NN kernel).

    python scripts/pallas_group_attempt.py [--batch 32 --points 1024,2048]

``--points`` is a comma list and DEFAULTS to both production stage-1
shapes: N=1024 (train) and N=2048 (the reference eval point count,
`/root/reference/interdiff/data/prepare_behave.py:92`) — the round-4
fused-SA kernel was "chip-verified" only at 1024 and OOMed scoped vmem at
2048 in the driver bench (BENCH_r04).  Stage-2 (N=1024, M=1) never
reaches the kernels: its 99-channel data fails the _MAX_C width gate.
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

from interdiff_tpu.ops.pallas_group import (  # noqa: E402
    fused_query_group,
    pairwise_sqdist_t,
)
from interdiff_tpu.ops.pointcloud import pairwise_sqdist, query_and_group  # noqa: E402

K_LO, K_HI = 1, 9


def chain(name, op, x0, reps=5):
    """Slope-timed per-op ms: delegates to utils/profiling.slope_time,
    which blocks EVERY dispatch (async-queued reps get acked by the tunnel
    before executing) and takes the median per rep (a single tunnel hiccup
    otherwise skews the slope)."""
    from interdiff_tpu.utils.profiling import slope_time

    per = slope_time(op, x0, k_lo=K_LO, k_hi=K_HI, reps=reps)
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--points", type=str, default="1024,2048",
                    help="comma list; every production stage-1 shape "
                    "must be gated (train 1024, eval 2048)")
    ap.add_argument("--quick", action="store_true",
                    help="correctness/lowering gate only - skip the "
                    "slope-timed perf chains (each chain compiles two "
                    "fori_loop graphs over the tunnel)")
    args = ap.parse_args()
    for p in (int(s) for s in args.points.split(",")):
        print(f"===== gate at points={p} =====", flush=True)
        run_gate(args.batch, p, args.quick)


def run_gate(B, P, quick):
    M = min(1024, P)

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(
        rng.uniform(-0.4, 0.4, (B, P, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, P, 1)).astype(np.float32))
    new = xyz[:, :M]

    # ---- correctness on the chip (bit equality vs XLA path) ---------------
    # everything jitted: EAGER references compile op-by-op over the tunnel
    # (one remote compile per primitive) and can eat a 30-min timeout
    # before the first result lands
    for radius, ns in ((0.05, 16), (0.1, 32)):
        print(f"compiling equality pair r={radius} ns={ns} ...", flush=True)
        ref = np.asarray(jax.jit(
            lambda x, f, rr=radius, n=ns: query_and_group(
                x, x[:, :M], f, rr, n))(xyz, feats))
        got = np.asarray(jax.jit(
            lambda x, f, rr=radius, n=ns: fused_query_group(
                x, x[:, :M], f, rr, n))(xyz, feats))
        eq = np.array_equal(got, ref)
        print(f"bit-equal r={radius} ns={ns}: {eq}", flush=True)
        if not eq:
            diff = np.abs(got - ref)
            print("  max abs diff", diff.max(),
                  "at", np.unravel_index(diff.argmax(), diff.shape))
            sys.exit(1)

    # ---- fully-fused SA scale correctness (ops/pallas_sa.py): Mosaic
    # lowering + equality vs the XLA reference on folded weights ----------
    from interdiff_tpu.ops.pallas_sa import (  # noqa: E402
        _sa_reference,
        fused_sa_scale,
    )

    prng = np.random.default_rng(7)

    def mk_params(chans):
        out = []
        for cin, cout in chans:
            out.append((
                jnp.asarray(prng.standard_normal((cin, cout)),
                            jnp.float32) * 0.3,
                jnp.asarray(1.0 + 0.1 * prng.standard_normal(cout),
                            jnp.float32),
                jnp.asarray(0.1 * prng.standard_normal(cout), jnp.float32),
            ))
        return tuple(out)

    sa_cfg = (
        ("scale1", 0.05, 16, ((4, 16), (16, 16), (16, 32))),
        ("scale2", 0.1, 32, ((4, 32), (32, 32), (32, 64))),
    )
    sa_params = {name: mk_params(ch) for name, _, _, ch in sa_cfg}
    # ONE shared distance tensor for both sides: the selection is
    # threshold-based, so each side must see identical distance BITS —
    # recomputing d2 under a different matmul precision flips borderline
    # in-radius decisions and yields O(1) output diffs that look like
    # kernel bugs (measured 3.99e-01 before sharing).  With the selection
    # pinned, the remaining diff is pure MLP arithmetic: the kernel's f32
    # rank-1 FMAs vs the f32-pinned reference matmuls.
    d2t_shared = jax.jit(lambda x: pairwise_sqdist_t(x, x[:, :M]))(xyz)
    d2_ref = jnp.swapaxes(d2t_shared, 1, 2)
    for name, r, ns, ch in sa_cfg:
        print(f"compiling fused-SA pair {name} ...", flush=True)
        got = np.asarray(jax.jit(
            lambda x, d, n=ns, rr=r, p=sa_params[name]: fused_sa_scale(
                x, x[:, :M], jnp.sum(x, -1, keepdims=True), p, rr, n,
                True, d))(xyz, d2t_shared))
        with jax.default_matmul_precision("highest"):
            want = np.asarray(jax.jit(
                lambda x, d, n=ns, rr=r, p=sa_params[name]: _sa_reference(
                    x, x[:, :M], jnp.sum(x, -1, keepdims=True), p, rr, n,
                    True, d))(xyz, d2_ref))
        err = np.abs(got - want).max()
        print(f"fused-SA {name} max|diff| vs f32-pinned shared-d2 "
              f"reference: {err:.2e}", flush=True)
        if not np.isfinite(err) or err > 1e-4:
            sys.exit(1)

    # ---- fused-SA grad path: exercises the with_grouped kernel variant
    # (dynamic per-slot store on the untiled S axis) + the saved-residual
    # dense-MLP VJP on chip; reference grads differentiate the XLA
    # pipeline on the SAME shared d2 bits.  Since round 5 the production
    # backward pins its _mlp_max replay to HIGHEST matmul precision
    # (advisor r4: the default bf16 replay could argmax a different
    # neighbour than the kernel's f32 running max), so the reference side
    # is pinned too — both grads are then identical f32 dense ops over the
    # identical grouped tensor ---------------------------------------------
    for name, r, ns, ch in sa_cfg:
        print(f"compiling fused-SA grad pair {name} ...", flush=True)
        gp = jax.jit(jax.grad(
            lambda p, x, d, n=ns, rr=r: jnp.sum(fused_sa_scale(
                x, x[:, :M], jnp.sum(x, -1, keepdims=True), p, rr, n,
                True, d))))(sa_params[name], xyz, d2t_shared)
        with jax.default_matmul_precision("highest"):
            gw = jax.jit(jax.grad(
                lambda p, x, d, n=ns, rr=r: jnp.sum(_sa_reference(
                    x, x[:, :M], jnp.sum(x, -1, keepdims=True), p, rr, n,
                    True, d))))(sa_params[name], xyz, d2_ref)
        gerr = max(float(np.abs(np.asarray(a) - np.asarray(b)).max() /
                         (np.abs(np.asarray(b)).max() + 1e-12))
                   for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gw)))
        print(f"fused-SA {name} grad max rel diff: {gerr:.2e}", flush=True)
        if not np.isfinite(gerr) or gerr > 1e-4:
            sys.exit(1)

    if quick:
        print("quick gate ok (correctness + lowering only)", flush=True)
        return

    # ---- perf: fused vs XLA pipeline, per scale and per MSG module --------
    for ns, r in ((16, 0.05), (32, 0.1)):
        chain(f"XLA   query_and_group ns={ns}",
              lambda x, n=ns, rr=r: query_and_group(
                  x, x[:, :M], jnp.sum(x, -1, keepdims=True), rr, n), xyz)
        chain(f"FUSED query_group     ns={ns}",
              lambda x, n=ns, rr=r: fused_query_group(
                  x, x[:, :M], jnp.sum(x, -1, keepdims=True), rr, n), xyz)

    def msg_xla(x):
        f = jnp.sum(x, -1, keepdims=True)
        d2 = pairwise_sqdist(x[:, :M], x)
        return [query_and_group(x, x[:, :M], f, r, n, d2=d2)
                for r, n in ((0.05, 16), (0.1, 32))]

    def msg_fused(x):
        f = jnp.sum(x, -1, keepdims=True)
        d2t = pairwise_sqdist_t(x, x[:, :M])
        return [fused_query_group(x, x[:, :M], f, r, n, True, d2t)
                for r, n in ((0.05, 16), (0.1, 32))]

    chain("XLA   both scales (shared d2)", msg_xla, xyz)
    chain("FUSED both scales (shared d2t)", msg_fused, xyz)

    # ---- fused-SA perf ----------------------------------------------------
    def sa_both(x):
        f = jnp.sum(x, -1, keepdims=True)
        d2t = pairwise_sqdist_t(x, x[:, :M])
        return [fused_sa_scale(x, x[:, :M], f, sa_params[name], r, ns,
                               True, d2t)
                for name, r, ns, _ in sa_cfg]

    def sa_both_xla(x):
        f = jnp.sum(x, -1, keepdims=True)
        return [_sa_reference(x, x[:, :M], f, sa_params[name], r, ns, True)
                for name, r, ns, _ in sa_cfg]

    chain("XLA   SA both scales (group+MLP+max)", sa_both_xla, xyz)
    chain("FUSED SA both scales (one kernel/scale)", sa_both, xyz)

    # ---- whole encoder forward --------------------------------------------
    from interdiff_tpu.models.pointnet import PointNet2Encoder  # noqa: E402

    pc = jnp.concatenate([xyz, feats], axis=-1)[:, None]  # [B,1,P,4]
    enc = PointNet2Encoder(c_in=1, c_out=256, num_keypoints=1)
    ep = enc.init(jax.random.PRNGKey(0), pc)
    chain("PointNet2Encoder fwd (fused routing)",
          lambda x: enc.apply(ep, x), pc)

    def enc_grad(x):
        return jax.grad(lambda p: jnp.sum(enc.apply(p, x)))(ep)

    chain("PointNet2Encoder fwd+bwd (fused routing)", enc_grad, pc)


if __name__ == "__main__":
    main()
