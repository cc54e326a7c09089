"""Post-hoc refinement over the test split — `interdiff/optimization.py`
__main__ equivalent: 200 jitted Adam iterations per clip.

Usage:
  python -m interdiff_tpu.cli.optimization --motion_path ... \
      --model_path <SMPLH pkl dir> [--limit N]
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = ArgumentParser()
    parser.add_argument("--motion_path", default=None)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--past_len", type=int, default=10)
    parser.add_argument("--future_len", type=int, default=10)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--out_dir", default="./results/optimization")
    parser.add_argument("--config", default=None,
                        help="YAML path config (BEHAVE.yml/HOI.yml style)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="refine N synthetic clips (no data needed)")
    parser.add_argument("--synthetic_body", action="store_true",
                        help="REAL motion data from --motion_path with the "
                             "synthetic stand-in body (SMPLH pkls are not "
                             "shipped in this image)")
    args = parser.parse_args()
    if args.config:
        from interdiff_tpu.data.paths import load_paths

        _paths = load_paths(args.config)
        args.motion_path = args.motion_path or _paths.motion_path
        args.model_path = args.model_path or _paths.model_path
    if not args.synthetic and not (
            args.motion_path and (args.model_path or args.synthetic_body)):
        parser.error("--motion_path and --model_path (or --config) required")

    from interdiff_tpu.data.behave import BehaveDataset, load_behave_sequences
    from interdiff_tpu.eval.optimization import OptimConfig, optimize_clip
    from interdiff_tpu.smpl.loader import smpl_model_from_pkl

    if args.synthetic:
        _run_synthetic(args)
        return

    from interdiff_tpu.cli.common import load_eval_sequences, load_smpl_models

    smpl_models = load_smpl_models(args)
    seqs = load_eval_sequences(args.motion_path, smpl_models)
    # optimize_clip consumes only pose streams + the point-cloud template
    ds = BehaveDataset(seqs, past_len=args.past_len,
                       future_len=args.future_len, fields="light")
    if not len(ds):
        parser.error(f"no clip windows under {args.motion_path}")
    os.makedirs(args.out_dir, exist_ok=True)

    fit = jax.jit(lambda smpl, **kw: optimize_clip(smpl, **kw),
                  static_argnums=())
    for i in range(len(ds)):
        clip = ds[i]
        gender = "male" if clip["gender"] == 0 else "female"
        smpl = smpl_models[gender]
        out = optimize_clip(
            smpl,
            body_pose=jnp.asarray(clip["body_pose"][:, :66]),
            hand_pose=jnp.asarray(clip["body_pose"][:, 66:]),
            body_trans=jnp.asarray(clip["body_trans"]),
            betas=jnp.asarray(clip["body_betas"]),
            obj_angles=jnp.asarray(clip["obj_angles"]),
            obj_trans=jnp.asarray(clip["obj_trans"]),
            obj_points=jnp.asarray(clip["obj_points"][:, :3]),
        )
        np.savez(os.path.join(args.out_dir, f"clip_{i}.npz"),
                 **{k: np.asarray(v) for k, v in out.items()})
        print(i, "best_loss", float(out["best_loss"]))
        if args.limit and i + 1 >= args.limit:
            break




def _run_synthetic(args):
    """Smoke-refine synthetic clips with a synthetic SMPL-H-shaped body."""
    import jax
    import jax.numpy as jnp

    from interdiff_tpu.cli.common import synthetic_smpl_body
    from interdiff_tpu.eval.optimization import OptimConfig, optimize_clip

    rng = np.random.default_rng(233)
    smpl = synthetic_smpl_body(rng)

    os.makedirs(args.out_dir, exist_ok=True)
    T = args.past_len + args.future_len
    for i in range(args.synthetic):
        out = optimize_clip(
            smpl,
            body_pose=jnp.asarray(
                rng.standard_normal((T, 66)).astype(np.float32) * 0.2),
            hand_pose=jnp.asarray(
                rng.standard_normal((T, 90)).astype(np.float32) * 0.05),
            body_trans=jnp.asarray(
                rng.standard_normal((T, 3)).astype(np.float32) * 0.1),
            betas=jnp.zeros((T, 10)),
            obj_angles=jnp.asarray(
                rng.standard_normal((T, 3)).astype(np.float32) * 0.3),
            obj_trans=jnp.zeros((T, 3)),
            obj_points=jnp.asarray(
                rng.standard_normal((64, 3)).astype(np.float32) * 0.05),
            cfg=OptimConfig(nn_chunk=None))
        np.savez(os.path.join(args.out_dir, f"synthetic_{i}.npz"),
                 **{k: np.asarray(v) for k, v in out.items()})
        print(i, "best_loss", float(out["best_loss"]))


if __name__ == "__main__":
    main()
