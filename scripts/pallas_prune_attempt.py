"""Drive the segment-pruned signed-NN kernel on the real chip: Mosaic
lowering check, contract equality vs the full kernel, and slope-timed
perf at the full correction-gate shape (800 x 2048 queries x 6890 verts).

SUPERSEDED as the primary gate by `scripts/pallas_prune_variants.py`,
which adds variant/seg A/B, temporally-coherent clip-walk geometry
(`--clip_len 24` — this script's per-row IID centres inflate the kernel's
8-row block-OR flags to 1-(1-p)^8, an adversarial layout no production
consumer produces), and block-level flag reporting.  Kept as the
quick single-config driver; it exercises whatever production defaults
`signed_nearest_pruned_pallas` ships (round-5: fori walk, auto
seg=ceil(M/4) to a lane tile).

    python scripts/pallas_prune_attempt.py [--rows 800 --queries 2048 --verts 6890]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=800)  # B * future frames
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--delta", type=float, default=0.25)
    args = ap.parse_args()
    R, Q, V = args.rows, args.queries, args.verts

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)

    # representative geometry: the SAME construction as the bench's
    # stand-in body (Fibonacci-sphere ellipsoid, vertices ORDERED BY
    # HEIGHT — segments of consecutive verts are horizontal bands, the
    # spatial coherence the segment pruning exploits; real SMPL topology
    # is likewise patch-coherent), posed with per-frame wobble, plus a
    # compact 0.35 m object whose per-frame centre wanders near the body
    # (an interaction object is close to the body most of the time)
    idx = np.arange(V, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * idx
    yy = 1.0 - 2.0 * (idx + 0.5) / V
    rr = np.sqrt(np.maximum(1.0 - yy * yy, 0.0))
    unit = np.stack([rr * np.cos(phi), yy, rr * np.sin(phi)], axis=1)
    base = (unit * np.array([0.25, 0.85, 0.15])).astype(np.float32)
    wobble = 1.0 + 0.05 * rng.standard_normal((R, 1, 1)).astype(np.float32)
    body = base[None] * wobble  # [R, V, 3]
    normals = np.broadcast_to(unit.astype(np.float32), body.shape).copy()
    centers = (rng.standard_normal((R, 1, 3)) * 0.5).astype(np.float32)
    obj = (rng.standard_normal((R, Q, 3)) * 0.175).astype(np.float32) \
        + centers

    a = jnp.asarray(obj)
    b = jnp.asarray(body)
    n = jnp.asarray(normals)

    from interdiff_tpu.ops.pallas_nn import (  # noqa: E402
        signed_nearest_pallas,
        signed_nearest_pruned_pallas,
    )

    # flagged-fraction report (host-side mirror of the kernel's flags)
    seg = 512
    Vp = V + (-V) % seg
    bp = np.pad(body, ((0, 0), (0, Vp - V), (0, 0)),
                constant_values=1e6)
    qlo, qhi = obj.min(axis=1), obj.max(axis=1)
    excess = np.maximum(np.maximum(qlo[:, None] - bp, bp - qhi[:, None]), 0)
    boxd2 = (excess ** 2).sum(-1)
    segmin = boxd2.reshape(R, Vp // seg, seg).min(-1)
    frac = float((segmin < args.delta ** 2).mean())
    print(f"flagged segment fraction (frame-level): {frac:.3f}", flush=True)

    print("compiling pruned kernel ...", flush=True)
    d_p, s_p, i_p = jax.block_until_ready(
        signed_nearest_pruned_pallas(a, b, n, delta=args.delta))
    print("compiling full kernel ...", flush=True)
    d_f, s_f, i_f = jax.block_until_ready(signed_nearest_pallas(a, b, n))

    d_p, s_p, i_p = map(np.asarray, (d_p, s_p, i_p))
    d_f, s_f, i_f = map(np.asarray, (d_f, s_f, i_f))
    d2 = args.delta ** 2
    near = d_f < d2
    print(f"near-query fraction: {near.mean():.3f}", flush=True)
    ok = (np.array_equal(d_p[near], d_f[near])
          and np.array_equal(s_p[near], s_f[near])
          and np.array_equal(i_p[near], i_f[near])
          and np.all(d_p[~near] == np.float32(d2))
          and np.all(s_p[~near] == 1.0) and np.all(i_p[~near] == 0))
    print("contract (bit-equal near / forced far):", ok, flush=True)
    if not ok:
        bad = near & (d_p != d_f)
        print("  near mismatches:", int(bad.sum()),
              " max|dd|:", float(np.abs(d_p - d_f)[near].max()))
        sys.exit(1)

    from interdiff_tpu.utils.profiling import slope_time  # noqa: E402

    t_full = slope_time(
        lambda x: signed_nearest_pallas(x, b, n)[0], a, reps=5)
    print(f"full   signed-NN sweep {R}x{Q}x{V}: {t_full:8.2f} ms",
          flush=True)
    t_pr = slope_time(
        lambda x: signed_nearest_pruned_pallas(
            x, b, n, delta=args.delta)[0], a, reps=5)
    print(f"pruned signed-NN sweep {R}x{Q}x{V}: {t_pr:8.2f} ms "
          f"({t_full / t_pr:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
