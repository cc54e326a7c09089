"""Lower + time the Pallas row-gather kernel on the real chip.

Correctness vs the XLA gather at train shapes, then a tile_k sweep and a
`query_and_group` before/after.  Uses the axon-artifact guards from
profile_pointnet_parts.py: unique input per dispatch (the tunnel memoizes
results on (executable, args)) and K-chained fori_loop slope timing.

Run detached WITHOUT the CPU override:

  (python scripts/pallas_gather_attempt.py > /tmp/pgather.log 2>&1;
   echo EXIT=$? >> /tmp/pgather.log) &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from interdiff_tpu.ops.pallas_gather import (  # noqa: E402
    _xla_gather_rows,
    gather_rows_pallas,
)
from interdiff_tpu.ops.pointcloud import ball_query, query_and_group  # noqa: E402

K_LO, K_HI = 1, 9


def chain(name, op, x0, reps=5):
    """Slope timing with the tunnel-memo guards (see module docstring)."""
    def run_k(k):
        @jax.jit
        def g(x):
            def body(_, x):
                out = op(x)
                s = sum(jnp.mean(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out))
                return x * (1.0 + 1e-12 * s)
            return jax.lax.fori_loop(0, k, body, x)

        variants = [x0 * (1.0 + 1e-6 * (i + k)) for i in range(reps + 1)]
        out = g(variants[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for v in variants[1:]:
            out = g(v)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    t_lo, t_hi = run_k(K_LO), run_k(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(f"{name:52s} {per:8.2f} ms   (T1={t_lo:7.2f}  T9={t_hi:7.2f})",
          flush=True)
    return per


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, N, C = 32, 1024, 4
    data = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    # ---- correctness on the chip (small then full) -------------------------
    for (b, n, c, k) in [(2, 64, 4, 100), (B, N, C, 1024 * 32)]:
        d = data[:b, :n, :c]
        idx = jnp.asarray(rng.integers(0, n, size=(b, k)), jnp.int32)
        t0 = time.time()
        out = gather_rows_pallas(d, idx)
        jax.block_until_ready(out)
        print(f"compile+run ({b},{n},{c})x{k}: {time.time()-t0:.1f}s",
              flush=True)
        ref = _xla_gather_rows(d, idx)
        exact = bool(jnp.all(out == ref))
        print(f"  exact match vs XLA gather: {exact}", flush=True)
        if not exact:
            raise SystemExit("MISMATCH — do not ship")

    # ---- tile_k sweep at the hot shape (K = M*ns = 32768) ------------------
    idx_full = jnp.asarray(rng.integers(0, N, size=(B, 1024 * 32)), jnp.int32)
    for tk in (128, 256, 512, 1024, 2048):
        try:
            chain(f"pallas gather tile_k={tk} [32,32768]<-[32,1024,4]",
                  lambda x, t=tk: gather_rows_pallas(x, idx_full, tile_k=t),
                  data)
        except Exception as e:  # noqa: BLE001 — sweep past OOM points
            print(f"tile_k={tk}: FAILED {type(e).__name__}: {e}", flush=True)
    chain("XLA gather (same shape, for reference)",
          lambda x: _xla_gather_rows(x, idx_full), data)

    # ---- query_and_group end-to-end (production entry) ---------------------
    xyz = data[..., :3]
    feats = data[..., 3:]
    for ns, r in ((16, 0.05), (32, 0.1)):
        chain(f"query_and_group ns={ns} (pallas path)",
              lambda x, n=ns, rr=r: query_and_group(
                  x, x[:, :1024], jnp.sum(x, -1, keepdims=True), rr, n), xyz)
    # ball_query alone: the remaining non-gather cost for context
    chain("ball_query ns=32 (for context)",
          lambda x: ball_query(x, x[:, :1024], 0.1, 32), xyz)
    _ = feats


if __name__ == "__main__":
    main()
