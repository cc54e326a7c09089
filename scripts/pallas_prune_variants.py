"""Chip A/B over pruned signed-NN kernel formulations.

The unrolled segment walk (HEAD) measured 271 ms vs 65 ms full at 72.5%
flags — ~4x SLOWER per unit of flagged work, matching the old grid-axis
formulation's penalty, so grid-step count was NOT the culprit.  This
script discriminates the remaining hypotheses on the chip:

  * code size / region count: the fori variant has ONE loop body
    (Mosaic code ~ the full kernel's) vs n_seg unrolled when-regions;
  * per-segment reduction overhead: seg=1024/2048 quarters the number of
    min/argmin/select-sum reductions per query row;
  * skip cost at low flag fractions: --center_scale 0.12 pins the object
    near the body centre so few segments flag.

    python scripts/pallas_prune_variants.py --configs fori:512,fori:2048,unrolled:2048
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


def geometry(R, Q, V, center_scale, rng, clip_len=0):
    """Height-ordered Fibonacci ellipsoid body + compact object (same body
    as pallas_prune_attempt.py / the bench stand-in).

    clip_len=0: per-row IID object centres — an ADVERSARIAL layout for the
    kernel's 8-row block-OR flags (P[block flagged] = 1-(1-p)^8; at
    frame-level p=0.13 the block-level fraction is 0.67, which is what
    made the early 'pruning never wins' measurements: every production
    consumer reshapes [B, T] -> B*T so an 8-row block holds ~8 CONSECUTIVE
    frames of one clip, not 8 independent clips).  clip_len>0 groups rows
    into clips whose centre does a small per-frame random walk (0.03 m
    std, ~BEHAVE hand-object speeds) around a clip-level base — the
    temporally-coherent layout the consumers actually produce."""
    idx = np.arange(V, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * idx
    yy = 1.0 - 2.0 * (idx + 0.5) / V
    rr = np.sqrt(np.maximum(1.0 - yy * yy, 0.0))
    unit = np.stack([rr * np.cos(phi), yy, rr * np.sin(phi)], axis=1)
    base = (unit * np.array([0.25, 0.85, 0.15])).astype(np.float32)
    wobble = 1.0 + 0.05 * rng.standard_normal((R, 1, 1)).astype(np.float32)
    body = base[None] * wobble
    normals = np.broadcast_to(unit.astype(np.float32), body.shape).copy()
    if clip_len:
        n_clips = (R + clip_len - 1) // clip_len
        cbase = rng.standard_normal((n_clips, 1, 3)) * center_scale
        walk = np.cumsum(rng.standard_normal((n_clips, clip_len, 3)) * 0.03,
                         axis=1)
        centers = (cbase + walk).reshape(-1, 3)[:R, None, :].astype(
            np.float32)
    else:
        centers = (rng.standard_normal((R, 1, 3)) * center_scale
                   ).astype(np.float32)
    obj = (rng.standard_normal((R, Q, 3)) * 0.175).astype(np.float32) \
        + centers
    return obj, body, normals


def flag_frac(obj, body, seg, delta):
    """(frame-level, block-level) flagged fractions; the KERNEL consumes
    the block-level one (OR over each 8-row batch block)."""
    R, V = body.shape[0], body.shape[1]
    Vp = V + (-V) % seg
    bp = np.pad(body, ((0, 0), (0, Vp - V), (0, 0)), constant_values=1e6)
    qlo, qhi = obj.min(axis=1), obj.max(axis=1)
    excess = np.maximum(np.maximum(qlo[:, None] - bp, bp - qhi[:, None]), 0)
    boxd2 = (excess ** 2).sum(-1)
    segmin = boxd2.reshape(R, Vp // seg, seg).min(-1)
    flags = segmin < delta ** 2
    rp = (-R) % 8
    bflags = np.pad(flags, ((0, rp), (0, 0))).reshape(-1, 8,
                                                      flags.shape[1])
    return float(flags.mean()), float(bflags.any(axis=1).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=800)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--delta", type=float, default=0.25)
    ap.add_argument("--center_scale", type=float, default=0.5)
    ap.add_argument("--clip_len", type=int, default=0,
                    help=">0: temporally-coherent per-clip centre walks")
    ap.add_argument("--configs", type=str,
                    default="fori:512,fori:2048,unrolled:2048")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()
    R, Q, V = args.rows, args.queries, args.verts

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    obj, body, normals = geometry(R, Q, V, args.center_scale, rng,
                                  clip_len=args.clip_len)
    a, b, n = map(jnp.asarray, (obj, body, normals))

    from interdiff_tpu.ops.pallas_nn import (  # noqa: E402
        signed_nearest_pallas,
        signed_nearest_pruned_pallas,
    )
    from interdiff_tpu.utils.profiling import slope_time  # noqa: E402

    d_f = s_f = i_f = None
    if not args.skip_full:
        d_f, s_f, i_f = map(np.asarray, jax.block_until_ready(
            signed_nearest_pallas(a, b, n)))
        t_full = slope_time(lambda x: signed_nearest_pallas(x, b, n)[0],
                            a, reps=args.reps)
        print(f"full    {R}x{Q}x{V}: {t_full:8.2f} ms", flush=True)

    d2 = args.delta ** 2
    for cfg in args.configs.split(","):
        variant, seg = cfg.split(":")
        seg = int(seg)
        ff, fb = flag_frac(obj, body, seg, args.delta)
        fn = lambda x, v=variant, s=seg: signed_nearest_pruned_pallas(
            x, b, n, delta=args.delta, seg=s, variant=v)[0]
        print(f"[{variant}:{seg}] flags frame={ff:.3f} block={fb:.3f} "
              "compiling ...", flush=True)
        d_p, s_p, i_p = map(np.asarray, jax.block_until_ready(
            signed_nearest_pruned_pallas(a, b, n, delta=args.delta,
                                         seg=seg, variant=variant)))
        if d_f is not None:
            near = d_f < d2
            ok = (np.array_equal(d_p[near], d_f[near])
                  and np.array_equal(s_p[near], s_f[near])
                  and np.array_equal(i_p[near], i_f[near])
                  and np.all(d_p[~near] == np.float32(d2))
                  and np.all(s_p[~near] == 1.0)
                  and np.all(i_p[~near] == 0))
            print(f"[{variant}:{seg}] contract:", ok, flush=True)
            if not ok:
                bad = near & ((d_p != d_f) | (s_p != s_f) | (i_p != i_f))
                for r, q in np.argwhere(bad)[:6]:
                    print(f"    [{r},{q}] d {d_p[r, q]:.8f}/{d_f[r, q]:.8f}"
                          f" s {s_p[r, q]:.6f}/{s_f[r, q]:.6f}"
                          f" i {i_p[r, q]}/{i_f[r, q]}", flush=True)
                continue
        t = slope_time(fn, a, reps=args.reps)
        print(f"[{variant}:{seg}] {R}x{Q}x{V}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
