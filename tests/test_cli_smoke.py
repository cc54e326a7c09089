"""In-process smoke tests for the SMPL eval CLIs' --synthetic modes: the
full CLI glue (arg parsing, synthetic body/batches, sampling, diverse-fold
metric reduction, rollout save) runs end-to-end on the CPU mesh with tiny
shapes and a 5-step respaced schedule."""

import sys

import numpy as np


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main()


def test_eval_smpl_short_synthetic_fold(monkeypatch, capsys):
    from interdiff_tpu.cli.eval_smpl_short import main

    _run(main, ["--synthetic", "1", "--batch_size", "2",
                "--diverse_samples", "2", "--diverse_fold", "2",
                "--respacing", "5", "--mode", "no_correction"], monkeypatch)
    out = capsys.readouterr().out
    assert "global_mpjpe" in out and "penetrate" in out


def test_eval_smpl_long_synthetic(monkeypatch, tmp_path, capsys):
    from interdiff_tpu.cli.eval_smpl_long import main

    _run(main, ["--synthetic", "1", "--batch_size", "2", "--rollouts", "1",
                "--respacing", "5", "--mode", "no_correction",
                "--out_dir", str(tmp_path)], monkeypatch)
    out = capsys.readouterr().out
    assert "rolled out 60 frames" in out  # 35 + 25 (one extra chunk)
    roll = np.load(tmp_path / "rollout_0.npy")
    assert roll.shape[1] == 60 and np.isfinite(roll).all()
