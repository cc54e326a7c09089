"""Stage the reference's shipped BEHAVE sample sequence into a writable
directory so the real-data CLIs can run on it.

The snapshot ships `Date01_Sub01_backpack_back/{object,smpl}_fit_all.npz`
(1408 frames) and `objects/backpack/backpack_f1000.ply` but not the
`contact.npz` / `info.json` the loader needs (`dataset_smpl.py:44-56`) —
this tool copies the npz, writes info.json, and generates contact.npz with
our `prepare_behave` (the reference's offline label generator role), using
the synthetic stand-in body for the unshipped SMPL-H pkls.

Run: python scripts/stage_behave_sample.py [--out /tmp/behave_real]
Then: python -m interdiff_tpu.cli.train_diffusion_smpl \
          --motion_path /tmp/behave_real/sequence --synthetic_body ...
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_SEQ = ("/root/reference/interdiff/data/behave/sequence/"
           "Date01_Sub01_backpack_back")
REF_OBJ = "/root/reference/interdiff/data/behave/objects"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/behave_real")
    ap.add_argument("--frames", type=int, default=0,
                    help="truncate to the first N frames (0 = all 1408)")
    ap.add_argument("--num_samples", type=int, default=2048,
                    help="object surface points for contact.npz "
                         "(`prepare_behave.py:92`)")
    args = ap.parse_args()

    seq_dir = os.path.join(args.out, "sequence", os.path.basename(REF_SEQ))
    os.makedirs(seq_dir, exist_ok=True)

    n = args.frames or None
    with np.load(os.path.join(REF_SEQ, "object_fit_all.npz"),
                 allow_pickle=True) as f:
        np.savez(os.path.join(seq_dir, "object_fit_all.npz"),
                 angles=f["angles"][:n], trans=f["trans"][:n])
    with np.load(os.path.join(REF_SEQ, "smpl_fit_all.npz"),
                 allow_pickle=True) as f:
        np.savez(os.path.join(seq_dir, "smpl_fit_all.npz"),
                 poses=f["poses"][:n], betas=f["betas"][:n],
                 trans=f["trans"][:n])
    with open(os.path.join(seq_dir, "info.json"), "w") as f:
        json.dump({"gender": "male", "cat": "backpack"}, f)

    stale = os.path.join(seq_dir, "human_normal.npz")
    if os.path.exists(stale):  # cached normals from a previous staging
        os.remove(stale)

    obj_dir = os.path.join(args.out, "objects", "backpack")
    os.makedirs(obj_dir, exist_ok=True)
    shutil.copy(os.path.join(REF_OBJ, "backpack/backpack_f1000.ply"), obj_dir)

    from interdiff_tpu.cli.common import synthetic_smpl_body
    from interdiff_tpu.data.prepare_behave import prepare_sequence

    body = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    t0 = time.time()
    out = prepare_sequence(seq_dir, os.path.join(args.out, "objects"),
                           {"male": body, "female": body},
                           num_samples=args.num_samples, overwrite=True)
    print(f"contact labels: {out} ({time.time() - t0:.1f}s)")
    print("staged:", args.out)


if __name__ == "__main__":
    main()
