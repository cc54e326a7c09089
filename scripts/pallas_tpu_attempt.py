"""One hardware attempt at the Pallas NN kernel (VERDICT round-1 item 9).

Tries to lower + execute `nearest_neighbor_pallas` on the real chip at a
small grid, timing compile and steady-state against the chunked-XLA
production path.  Mosaic kernels historically stall compiling over the
axon tunnel; this script logs whichever outcome happens so the attempt is
documented either way.  Run detached WITHOUT the CPU override:

  (python scripts/pallas_tpu_attempt.py > /tmp/pallas_attempt.log 2>&1 &)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print("backend:", jax.default_backend(), jax.devices())

    from interdiff_tpu.ops.pallas_nn import nearest_neighbor_pallas

    rng = np.random.default_rng(0)
    # small grid first: 8 batch rows, 128 queries, 256 refs
    for (B, N, M) in [(8, 128, 256), (8, 1024, 2048), (35, 6890, 2048)]:
        a = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
        print(f"--- pallas B={B} N={N} M={M}: compiling...", flush=True)
        t0 = time.time()
        d, i = nearest_neighbor_pallas(a, b)
        jax.block_until_ready((d, i))
        t_compile = time.time() - t0
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            d, i = nearest_neighbor_pallas(a, b)
        jax.block_until_ready((d, i))
        t_run = (time.time() - t0) / reps
        print(f"pallas ok: compile {t_compile:.1f}s, run {t_run*1e3:.2f}ms",
              flush=True)

        # cross-check + baseline: the chunked XLA path, FORCED off-pallas —
        # on TPU point2point_signed/nearest_neighbor default to the kernel
        # under test, which would make this a pallas-vs-pallas comparison
        from interdiff_tpu.ops.signed_distance import nearest_neighbor

        xla_nn = jax.jit(lambda a, b: nearest_neighbor(
            a, b, chunk=512, use_pallas=False))
        t0 = time.time()
        d_x, i_x = xla_nn(a, b)
        jax.block_until_ready((d_x, i_x))
        t_xla_c = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            d_x, i_x = xla_nn(a, b)
        jax.block_until_ready((d_x, i_x))
        t_xla = (time.time() - t0) / reps
        ok = np.allclose(np.asarray(d), np.asarray(d_x), atol=1e-3)
        print(f"xla chunked: compile {t_xla_c:.1f}s, run {t_xla*1e3:.2f}ms; "
              f"values match: {ok}", flush=True)

    # fused signed-NN kernel (NN + pseudonormal dot at argmin in one sweep)
    from interdiff_tpu.ops.pallas_nn import signed_nearest_pallas
    from interdiff_tpu.ops.signed_distance import signed_nearest

    for (B, N, M) in [(8, 128, 256), (800, 2048, 6890)]:
        a = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
        nrm = jnp.asarray(rng.standard_normal((B, M, 3)), jnp.float32)
        print(f"--- signed pallas B={B} N={N} M={M}: compiling...",
              flush=True)
        t0 = time.time()
        d, s, _ = signed_nearest_pallas(a, b, nrm)
        jax.block_until_ready((d, s))
        t_compile = time.time() - t0
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            d, s, _ = signed_nearest_pallas(a, b, nrm)
        jax.block_until_ready((d, s))
        t_run = (time.time() - t0) / reps
        print(f"signed pallas ok: compile {t_compile:.1f}s, "
              f"run {t_run*1e3:.2f}ms", flush=True)
        d_ref, s_ref = signed_nearest(a, b, nrm, chunk=512,
                                      use_pallas=False)
        ok_d = np.allclose(np.asarray(d), np.asarray(d_ref), atol=1e-3)
        sign_agree = float(np.mean(np.sign(np.asarray(s))
                                   == np.sign(np.asarray(s_ref))))
        print(f"signed vs fallback: dist match {ok_d}, "
              f"sign agreement {sign_agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
