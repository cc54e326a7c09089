"""Standalone reconstruction diagnostic for the SMPL correction net.

The protocol eval injects the projector into the sampling scan, where its
output blends over the *sampled* object stream — so a bad projector shows
up only as degraded end metrics.  This script isolates the projector:
feed it GROUND-TRUTH past object + GT markers + GT contact from the real
BEHAVE sequence (the exact inputs the trainer optimises on) and measure
its future-object prediction against GT, next to the trivial
"repeat the last past frame" baseline the DCT padding starts from.

If the trained net beats repeat-last, correction has learned a real
contact-to-object mapping; if it does not, more training (not eval
plumbing) is the bottleneck.

Run fast on the CPU mesh:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/diag_correction_recon.py \
        --motion_path /tmp/behave_real/sequence
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion_path", default="/tmp/behave_real/sequence")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--past_len", type=int, default=10)
    ap.add_argument("--future_len", type=int, default=25)
    ap.add_argument("--ckpt", default="artifacts/correction_real_params",
                    help="orbax dir or reference .ckpt")
    args = ap.parse_args()

    from interdiff_tpu.cli.common import load_correction_variables
    from interdiff_tpu.data.behave import (
        BehaveDataset,
        collate,
        load_behave_sequences,
    )
    from interdiff_tpu.cli.common import synthetic_smpl_body
    from interdiff_tpu.geometry.rotations import (
        axis_angle_to_matrix,
        matrix_to_rotation_6d,
        rotation_6d_to_matrix,
        matrix_to_axis_angle,
        axis_angle_to_quaternion,
    )
    from interdiff_tpu.eval.metrics import quat_min_error
    from interdiff_tpu.models.correction import ObjProjectorSmpl

    body = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    smpl_models = {"male": body, "female": body}
    seqs = load_behave_sequences(args.motion_path, smpl_models=smpl_models,
                                 mode="train")
    ds = BehaveDataset(seqs, past_len=args.past_len,
                       future_len=args.future_len,
                       rng=np.random.default_rng(0))
    n = min(args.batch, len(ds))
    batch = collate([ds[i] for i in range(0, len(ds),
                                          max(1, len(ds) // n))][:n])

    markers = jnp.asarray(batch["markers"])  # [B,T,67,7]
    contact = markers[:, args.past_len:, :, 6].sum(axis=1)  # [B,67]
    rot6d = matrix_to_rotation_6d(
        axis_angle_to_matrix(jnp.asarray(batch["obj_angles"])))
    obj_gt = jnp.concatenate([rot6d, jnp.asarray(batch["obj_trans"])],
                             axis=-1)  # [B,T,9]

    projector = ObjProjectorSmpl(past_len=args.past_len,
                                 future_len=args.future_len)
    variables = load_correction_variables(args.ckpt)

    pred = projector.apply(variables, obj_gt, markers[..., :3], contact,
                           method=ObjProjectorSmpl.sample)

    def report(name, p):
        fut_p, fut_g = p[:, args.past_len:], obj_gt[:, args.past_len:]
        trans = jnp.linalg.norm(fut_p[..., 6:] - fut_g[..., 6:],
                                axis=-1).mean()
        aa_p = matrix_to_axis_angle(rotation_6d_to_matrix(fut_p[..., :6]))
        aa_g = matrix_to_axis_angle(rotation_6d_to_matrix(fut_g[..., :6]))
        rot = quat_min_error(axis_angle_to_quaternion(aa_p),
                             axis_angle_to_quaternion(aa_g), ord=1).mean()
        print(f"{name:28s} future obj_trans {float(trans):.4f} "
              f"obj_rot {float(rot):.4f}")

    last_past = jnp.repeat(obj_gt[:, args.past_len - 1:args.past_len],
                           args.future_len, axis=1)
    repeat_last = jnp.concatenate(
        [obj_gt[:, :args.past_len], last_past], axis=1)
    print(f"windows={n} contact>0 on "
          f"{int((contact.sum(-1) > 0).sum())}/{n}")
    report("repeat-last-past baseline", repeat_last)
    report(f"projector [{args.ckpt}]", pred)


if __name__ == "__main__":
    main()
