"""The Lightning->orbax converter CLI: a shipped reference checkpoint
converts to a flat orbax save that the existing consumers
(`cli/common.load_correction_variables` / `restore_params`) read back
tree-identical, with hparams persisted alongside."""

import json
import sys

import jax
import numpy as np
import pytest

pytest.importorskip("torch")

SMPL_CKPT = "/root/reference/interdiff/checkpoints/correction.ckpt"


def test_convert_correction_roundtrip(tmp_path, monkeypatch, capsys):
    from interdiff_tpu.cli.common import load_correction_variables
    from interdiff_tpu.cli.convert_checkpoint import main
    from interdiff_tpu.utils.checkpoint import load_correction_smpl

    out = tmp_path / "correction_orbax"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--ckpt", SMPL_CKPT, "--kind", "correction_smpl",
        "--out", str(out)])
    main()
    assert "converted" in capsys.readouterr().out

    direct, hp = load_correction_smpl(SMPL_CKPT)
    restored = load_correction_variables(str(out))
    jax.tree.map(np.testing.assert_array_equal, restored, direct)

    hp_saved = json.load(open(out / "hparams.json"))
    assert hp_saved["embedding_dim"] == hp["embedding_dim"] == 64
    assert hp_saved["past_len"] == 10 and hp_saved["future_len"] == 25
