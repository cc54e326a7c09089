"""Classify the penetrate metric's far-field negative signs on the REAL
staged sequence: are object points that the vertex-pseudonormal sign test
calls "inside" while lying > delta from every body vertex GENUINELY
inside the posed stand-in body, or sign-test artifacts?

Ground truth = generalized winding number (sum of signed solid angles over
all faces; ~4pi inside a watertight mesh, ~0 outside) — exact for the
closed stand-in surface whatever its pose.  This discriminates the two
readings of the protocol-eval discrepancy (full-sweep penetrate 0.1809 vs
0.0295 with delta=0.25 pruning): a true inside point farther than 0.25 m
from all 6890 surface verts needs a >=0.5 m-thick body (the stand-in's
max half-thickness is ~0.16 m), so the prediction is ~0% truly inside.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_penetrate_signs.py \
        --motion_path /tmp/behave_real/sequence
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def winding_number(points, verts, faces):
    """Generalized winding number of each point w.r.t. the mesh.
    points [K,3], verts [V,3], faces [F,3] -> [K] (inside ~= 1)."""
    tri = verts[faces]  # [F,3,3]
    K = points.shape[0]
    w = np.zeros(K)
    # chunk faces to bound memory
    for f0 in range(0, len(tri), 4096):
        t = tri[f0:f0 + 4096]  # [f,3,3]
        a = t[None, :, 0] - points[:, None]  # [K,f,3]
        b = t[None, :, 1] - points[:, None]
        c = t[None, :, 2] - points[:, None]
        la = np.linalg.norm(a, axis=-1)
        lb = np.linalg.norm(b, axis=-1)
        lc = np.linalg.norm(c, axis=-1)
        num = np.einsum("kfi,kfi->kf", a, np.cross(b, c))
        den = (la * lb * lc + np.einsum("kfi,kfi->kf", a, b) * lc
               + np.einsum("kfi,kfi->kf", b, c) * la
               + np.einsum("kfi,kfi->kf", c, a) * lb)
        w += np.arctan2(num, den).sum(axis=1)
    return w / (2.0 * np.pi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion_path", default="/tmp/behave_real/sequence")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--delta", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=233)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from interdiff_tpu.cli.common import load_eval_sequences, \
        synthetic_smpl_body
    from interdiff_tpu.data.behave import BehaveDataset, collate
    from interdiff_tpu.eval.smpl_short import (SmplEvalConfig,
                                               postprocess_sample)
    from interdiff_tpu.models.mdm_smpl import smpl_gt_from_raw
    from interdiff_tpu.geometry.normals import vertex_normals
    from interdiff_tpu.ops.signed_distance import signed_nearest

    rng = np.random.default_rng(args.seed)
    # exactly the eval CLI's --synthetic_body construction
    # (cli/common.load_smpl_models: rng(0), 6890 verts)
    smpl = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    seqs = load_eval_sequences(args.motion_path,
                               {"male": smpl, "female": smpl})
    ds = BehaveDataset(seqs, past_len=10, future_len=25, rng=rng,
                       fields="light")
    batch = collate([ds[i] for i in range(8)])
    cfg = SmplEvalConfig()
    gt = smpl_gt_from_raw(
        jnp.asarray(batch["body_pose"][..., :66]),
        jnp.asarray(batch["body_trans"]),
        jnp.asarray(batch["obj_angles"]),
        jnp.asarray(batch["obj_trans"]))
    hand = jnp.asarray(batch["body_pose"][..., 66:])
    betas = jnp.asarray(batch["body_betas"]) \
        if "body_betas" in batch else jnp.zeros(gt.shape[:2] + (10,))
    post = postprocess_sample(cfg, smpl, gt, hand, betas)
    verts = np.asarray(post["verts"])  # [B,T,V,3]
    obj = np.asarray(post["obj_pred"])  # [B,T,6]

    # GT object points posed per frame (same math as smpl_metrics)
    from interdiff_tpu.geometry.rotations import axis_angle_to_matrix

    pts = np.asarray(batch["obj_points"])[..., :3]  # [B,P,3]
    rot = np.asarray(axis_angle_to_matrix(jnp.asarray(obj[..., :3])))
    posed = np.einsum("btij,bpj->btpi", rot, pts) + obj[:, :, None, 3:]

    B, T = verts.shape[:2]
    v_flat = jnp.asarray(verts.reshape(B * T, -1, 3))
    normals = vertex_normals(v_flat, jnp.asarray(smpl.faces))
    q = jnp.asarray(posed.reshape(B * T, -1, 3))
    sq, sdot = signed_nearest(q, v_flat, normals, use_pallas=False)
    sq, sdot = np.asarray(sq), np.asarray(sdot)

    neg = sdot < 0
    far = sq >= args.delta ** 2
    print(f"points: {neg.size}  sign<0: {neg.mean():.4f}  "
          f"sign<0 & far: {(neg & far).mean():.4f}  "
          f"sign<0 & near: {(neg & ~far).mean():.4f}", flush=True)

    # winding-test a sample of far-negative points frame by frame
    rows = np.unique(np.argwhere(neg & far)[:, 0])
    rng2 = np.random.default_rng(0)
    checked = truly_inside = 0
    for r in rows[rng2.permutation(len(rows))[:args.frames]]:
        cand = np.argwhere(neg[r] & far[r])[:, 0]
        cand = cand[rng2.permutation(len(cand))[:64]]
        w = winding_number(posed.reshape(B * T, -1, 3)[r][cand],
                           verts.reshape(B * T, -1, 3)[r],
                           np.asarray(smpl.faces))
        inside = np.abs(w) > 0.5
        checked += len(cand)
        truly_inside += int(inside.sum())
        print(f"frame-row {r}: {len(cand)} far-neg pts, "
              f"winding-inside {int(inside.sum())} "
              f"(|w| med {np.median(np.abs(w)):.3f})", flush=True)
    print(f"TOTAL far-negative checked {checked}, truly inside "
          f"{truly_inside} ({truly_inside / max(checked, 1):.3f})",
          flush=True)

    # control: near-negative points should be mostly genuinely inside
    rows_n = np.unique(np.argwhere(neg & ~far)[:, 0])
    checked = truly_inside = 0
    for r in rows_n[rng2.permutation(len(rows_n))[:args.frames]]:
        cand = np.argwhere(neg[r] & ~far[r])[:, 0]
        cand = cand[rng2.permutation(len(cand))[:64]]
        w = winding_number(posed.reshape(B * T, -1, 3)[r][cand],
                           verts.reshape(B * T, -1, 3)[r],
                           np.asarray(smpl.faces))
        checked += len(cand)
        truly_inside += int((np.abs(w) > 0.5).sum())
    print(f"CONTROL near-negative checked {checked}, truly inside "
          f"{truly_inside} ({truly_inside / max(checked, 1):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
