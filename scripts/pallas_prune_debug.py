"""Diagnose the lanefold pruned-NN kernel's on-chip contract failure:
which outputs mismatch, by how much, and in which lanes/segments.

    python scripts/pallas_prune_debug.py [--variant lanefold --seg 512]
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

from pallas_prune_variants import geometry  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--delta", type=float, default=0.25)
    ap.add_argument("--center_scale", type=float, default=0.5)
    ap.add_argument("--variant", type=str, default="lanefold")
    ap.add_argument("--seg", type=int, default=512)
    args = ap.parse_args()
    R, Q, V = args.rows, args.queries, args.verts

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    obj, body, normals = geometry(R, Q, V, args.center_scale, rng)
    a, b, n = map(jnp.asarray, (obj, body, normals))

    from interdiff_tpu.ops.pallas_nn import (  # noqa: E402
        signed_nearest_pallas,
        signed_nearest_pruned_pallas,
    )

    d_f, s_f, i_f = map(np.asarray, jax.block_until_ready(
        signed_nearest_pallas(a, b, n)))
    d_p, s_p, i_p = map(np.asarray, jax.block_until_ready(
        signed_nearest_pruned_pallas(a, b, n, delta=args.delta,
                                     seg=args.seg, variant=args.variant)))
    d2 = args.delta ** 2
    near = d_f < d2
    print("near fraction:", near.mean(), flush=True)
    for name, p, f in (("dist", d_p, d_f), ("sdot", s_p, s_f),
                       ("idx", i_p, i_f)):
        bad = near & (p != f)
        print(f"{name}: near mismatches {int(bad.sum())}/{int(near.sum())}",
              flush=True)
        if bad.any():
            bi = np.argwhere(bad)[:8]
            for r, q in bi:
                print(f"  [{r},{q}] pruned={p[r, q]} full={f[r, q]} "
                      f"(idx p={i_p[r, q]} f={i_f[r, q]}, "
                      f"d p={d_p[r, q]:.8f} f={d_f[r, q]:.8f})", flush=True)
    far_ok = (np.all(d_p[~near] == np.float32(d2))
              and np.all(s_p[~near] == 1.0) and np.all(i_p[~near] == 0))
    print("far forcing ok:", far_ok, flush=True)
    if not far_ok:
        badf = ~near & ((d_p != np.float32(d2)) | (s_p != 1.0) | (i_p != 0))
        bi = np.argwhere(badf)[:8]
        for r, q in bi:
            print(f"  far [{r},{q}] d={d_p[r, q]} s={s_p[r, q]} "
                  f"i={i_p[r, q]} (full d={d_f[r, q]:.6f})", flush=True)


if __name__ == "__main__":
    main()
