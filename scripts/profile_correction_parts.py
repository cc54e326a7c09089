"""Time each subgraph of the correction denoised_fn at bench shapes.

The correction-in-scan bench (`INTERDIFF_BENCH_CORRECTION=1`) runs the
denoised_fn (FK + normals + fused signed-NN + marker-NN + projector) at
11 activations per 100-step schedule.  This script decomposes one
activation on the real chip so optimization effort lands on the actual
hot op, and checks the parts SUM to the full denoised_fn.

All timings are SLOPE-based (`utils/profiling.slope_time`): K-chained
fori_loop at K=1/9 cancels per-dispatch overhead (~1-2 ms over the axon
tunnel), which polluted the round-3 standalone numbers.

Run on the chip (no platform override):
    python scripts/profile_correction_parts.py [--body_v 6890 --points 2048]
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

from interdiff_tpu.cli.common import synthetic_smpl_body  # noqa: E402
from interdiff_tpu.geometry.normals import vertex_normals  # noqa: E402
from interdiff_tpu.geometry.rotations import (  # noqa: E402
    matrix_to_axis_angle,
    rotation_6d_to_matrix,
)
from interdiff_tpu.models.correction import ObjProjectorSmpl  # noqa: E402
from interdiff_tpu.ops.signed_distance import (  # noqa: E402
    nearest_neighbor,
    signed_nearest,
)
from interdiff_tpu.smpl.model import smpl_forward  # noqa: E402
from interdiff_tpu.utils.checkpoint import load_correction_smpl  # noqa: E402
from interdiff_tpu.utils.profiling import slope_time  # noqa: E402


def bench(name, op, x0, reps=5):
    per = slope_time(op, x0, reps=reps)
    print(f"{name:32s} {per:8.2f} ms", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--body_v", type=int, default=6890)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--past", type=int, default=10)
    ap.add_argument("--future", type=int, default=25)
    args = ap.parse_args()

    B, T, V, P = args.batch, args.past + args.future, args.body_v, args.points
    Tf = args.future
    rng = np.random.default_rng(0)
    smpl = synthetic_smpl_body(rng, num_verts=V)
    faces = np.asarray(smpl.faces)

    body6 = jnp.asarray(rng.standard_normal((B, T, 22, 6)), jnp.float32)
    obj6 = jnp.asarray(rng.standard_normal((B, T, 6)), jnp.float32)
    pose_full = jnp.asarray(rng.standard_normal((B * T, 156)) * 0.2,
                            jnp.float32)
    betas = jnp.zeros((B * T, 10), jnp.float32)
    trans = jnp.asarray(rng.standard_normal((B * T, 3)), jnp.float32)
    verts_fut = jnp.asarray(rng.standard_normal((B * Tf, V, 3)), jnp.float32)
    obj_fut = jnp.asarray(rng.standard_normal((B * Tf, P, 3)), jnp.float32)
    markers = jnp.asarray(rng.standard_normal((B * T, 67, 3)), jnp.float32)
    obj_pts_bt = jnp.asarray(rng.standard_normal((B * T, P, 3)), jnp.float32)

    print("platform:", jax.devices()[0].platform, flush=True)
    print(f"shapes: B={B} T={T} Tf={Tf} V={V} P={P}", flush=True)
    total = 0.0
    total += bench("rot6d->matrix+aa (body)",
                   lambda b: matrix_to_axis_angle(rotation_6d_to_matrix(b)),
                   body6)
    total += bench("smpl_forward (B*T bodies)",
                   lambda p: smpl_forward(smpl, p, betas, trans)[0],
                   pose_full)
    total += bench("vertex_normals (future)",
                   lambda v: vertex_normals(v, faces), verts_fut)
    normals_fut = jnp.asarray(rng.standard_normal((B * Tf, V, 3)),
                              jnp.float32)
    total += bench("o2h fused signed-NN",
                   lambda a: signed_nearest(a, verts_fut, normals_fut,
                                            chunk=512), obj_fut)
    total += bench("marker NN (67 x P)",
                   lambda a: nearest_neighbor(a, obj_pts_bt, chunk=512),
                   markers)

    projector = ObjProjectorSmpl(past_len=args.past, future_len=args.future)
    pp, _ = load_correction_smpl()
    contact = jnp.zeros((B, 67), jnp.float32)
    obj9 = jnp.concatenate([obj6, trans.reshape(B, T, 3)], axis=-1)
    total += bench("projector.sample",
                   lambda o: projector.apply(
                       pp, o, markers.reshape(B, T, 67, 3), contact,
                       method=ObjProjectorSmpl.sample), obj9)

    print(f"{'SUM of parts (one activation)':32s} {total:8.2f} ms",
          flush=True)

    # ground truth: the FULL denoised_fn exactly as compiled into the scan
    from interdiff_tpu.eval.smpl_short import (
        SmplEvalConfig, make_correction_denoised_fn)

    cfg = SmplEvalConfig(past_len=args.past, future_len=args.future,
                         correction_t_max=50, correction_every=5)
    gt = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    hand = jnp.asarray(rng.standard_normal((B, T, 90)), jnp.float32)
    markers_idx = np.linspace(0, V - 1, 67).astype(np.int32)
    obj_pts3 = jnp.asarray(rng.standard_normal((B, P, 3)), jnp.float32)
    dfn = make_correction_denoised_fn(
        cfg, smpl, projector, pp, gt=gt, hand_pose=hand,
        betas=betas.reshape(B, T, 10), obj_points=obj_pts3,
        markers_idx=markers_idx)
    x = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    t_active = jnp.full((B,), 50, jnp.int32)
    t_idle = jnp.full((B,), 51, jnp.int32)
    t_full = bench("FULL denoised_fn (active)",
                   lambda xx: dfn(xx, t_active), x)
    bench("FULL denoised_fn (idle)", lambda xx: dfn(xx, t_idle), x)
    print(f"\nunattributed (full - parts) = {t_full - total:+.2f} ms "
          f"({abs(t_full - total) / max(t_full, 1e-9) * 100:.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
