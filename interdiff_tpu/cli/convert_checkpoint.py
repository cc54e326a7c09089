"""Convert a reference PyTorch-Lightning checkpoint to an orbax save.

Bridges the reference's distributed weights (`interdiff/README.md`:
`diffusion.ckpt`, `diffusion_skeleton.ckpt`, `correction.ckpt`,
`obj_skeleton.ckpt`) into the flat StandardCheckpointer layout every
`--diffusion_ckpt`/`--correction_ckpt` consumer and `restore_params`
already read — e.g. to fine-tune a reference-trained model with our
trainers, or to stop paying the torch-unpickle cost at eval startup.
(The eval CLIs also accept `.ckpt` files directly via
`cli/common.maybe_reference_mdm`; this tool is for persisting the
converted tree.)

Usage:
  python -m interdiff_tpu.cli.convert_checkpoint \
      --ckpt /path/diffusion.ckpt --kind mdm_smpl --out /path/orbax_dir
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

KINDS = ("mdm_smpl", "mdm_skeleton", "correction_smpl",
         "correction_skeleton")


def convert(ckpt: str, kind: str, out: str) -> dict:
    """-> the embedded hyper_parameters (also written to <out>/hparams.json;
    module construction needs them, see `mdm_smpl_from_checkpoint`)."""
    from interdiff_tpu.utils import checkpoint as ck

    loader = {
        "mdm_smpl": ck.load_mdm_smpl,
        "mdm_skeleton": ck.load_mdm_skeleton,
        "correction_smpl": ck.load_correction_smpl,
        "correction_skeleton": ck.load_correction_skeleton,
    }[kind]
    variables, hp = loader(ckpt)

    import orbax.checkpoint as ocp

    out = os.path.abspath(out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, variables)
    ckptr.wait_until_finished()  # the save is async; hparams.json goes in
    # after the directory is finalised
    hp_json = {k: v for k, v in hp.items()
               if isinstance(v, (int, float, str, bool, type(None)))}
    with open(os.path.join(out, "hparams.json"), "w") as f:
        json.dump(hp_json, f, indent=1)
    return hp


def main():
    parser = ArgumentParser()
    parser.add_argument("--ckpt", required=True,
                        help="Lightning .ckpt file (state_dict under "
                             "'model.', as LitInteraction saves)")
    parser.add_argument("--kind", required=True, choices=KINDS)
    parser.add_argument("--out", required=True,
                        help="orbax output directory (must not exist)")
    args = parser.parse_args()
    hp = convert(args.ckpt, args.kind, args.out)
    print(f"converted {args.ckpt} ({args.kind}) -> {args.out}; "
          f"hparams keys: {sorted(hp)}")


if __name__ == "__main__":
    main()
