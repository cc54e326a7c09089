"""In-process smoke tests for the four trainer CLIs' --synthetic modes: the
full CLI glue (arg parsing, synthetic batches, data-parallel step over the
8-device mesh, orbax checkpointing, metrics.jsonl) runs end-to-end with tiny
models and one epoch.  This is the layer unit tests of the train *steps*
don't cover — an arg-wiring or val-split bug (e.g. the round-1 advisor's
StopIteration at startup) only surfaces here."""

import json
import os
import sys

import numpy as np


def _run(main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main()


def _check_run_dir(results_dir):
    metrics = os.path.join(results_dir, "metrics.jsonl")
    assert os.path.isfile(metrics)
    rows = [json.loads(line) for line in open(metrics)]
    assert rows, "no metrics logged"
    assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)
    assert os.path.isdir(os.path.join(results_dir, "ckpt"))
    return rows


def test_train_diffusion_smpl_synthetic(monkeypatch, tmp_path, capsys):
    from interdiff_tpu.cli.train_diffusion_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--use_pointnet2", "0", "--embedding_dim", "32",
                "--ff_size", "64", "--num_layers", "2", "--val_every", "1",
                "--results_dir", str(tmp_path)], monkeypatch)
    assert "loss" in capsys.readouterr().out
    _check_run_dir(str(tmp_path))


def test_train_diffusion_smpl_val_diverse(monkeypatch, tmp_path, capsys):
    """--val_diverse N validates with the reference's test-mode calc_loss:
    the metrics line carries the per-clip min-over-samples *_min terms."""
    import json
    import os

    from interdiff_tpu.cli.train_diffusion_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--use_pointnet2", "0", "--embedding_dim", "32",
                "--ff_size", "64", "--num_layers", "2", "--val_every", "1",
                "--val_diverse", "2", "--val_respacing", "5",
                "--results_dir", str(tmp_path)], monkeypatch)
    capsys.readouterr()
    rows = [json.loads(l) for l in
            open(os.path.join(tmp_path, "metrics.jsonl"))]
    val = [r for r in rows if "val_loss" in r][-1]
    assert "body_rot_future_min" in val and "obj_nonrot_v_past_min" in val
    assert val["body_rot_future_min"] <= val["body_rot_future"] + 1e-6


def test_train_diffusion_smpl_ema(monkeypatch, tmp_path, capsys):
    """--ema_decay writes a second flat param save under ckpt_ema/ that the
    eval CLIs can load like any orbax checkpoint; --render_interval renders
    a validation-sample mesh gif (the reference's render_interval)."""
    from interdiff_tpu.cli.train_diffusion_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--use_pointnet2", "0", "--embedding_dim", "32",
                "--ff_size", "64", "--num_layers", "2", "--val_every", "1",
                "--val_respacing", "5", "--ema_decay", "0.5",
                "--render_interval", "1",
                "--results_dir", str(tmp_path)], monkeypatch)
    capsys.readouterr()
    _check_run_dir(str(tmp_path))
    assert os.path.isdir(os.path.join(tmp_path, "ckpt_ema"))
    gifs = os.listdir(os.path.join(tmp_path, "render"))
    assert any(g.endswith(".gif") for g in gifs)

    import orbax.checkpoint as ocp

    raw = ocp.CheckpointManager(os.path.join(tmp_path, "ckpt"))
    ema = ocp.CheckpointManager(os.path.join(tmp_path, "ckpt_ema"))
    assert ema.latest_step() == raw.latest_step()
    p_raw = raw.restore(raw.latest_step())
    p_ema = ema.restore(ema.latest_step())
    import jax

    leaves_r, leaves_e = jax.tree.leaves(p_raw), jax.tree.leaves(p_ema)
    assert len(leaves_r) == len(leaves_e)
    assert any(np.abs(np.asarray(r) - np.asarray(e)).max() > 1e-7
               for r, e in zip(leaves_r, leaves_e))


def test_train_diffusion_skeleton_synthetic(monkeypatch, tmp_path, capsys):
    from interdiff_tpu.cli.train_diffusion_skeleton import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--ff_size", "32", "--val_every", "1",
                "--render_interval", "1",
                "--results_dir", str(tmp_path)], monkeypatch)
    assert "loss" in capsys.readouterr().out
    _check_run_dir(str(tmp_path))
    gifs = os.listdir(os.path.join(tmp_path, "render"))
    assert any(g.endswith(".gif") for g in gifs)


def test_train_correction_smpl_synthetic(monkeypatch, tmp_path, capsys):
    from interdiff_tpu.cli.train_correction_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--results_dir", str(tmp_path)], monkeypatch)
    assert "loss" in capsys.readouterr().out
    _check_run_dir(str(tmp_path))


def test_train_correction_skeleton_synthetic(monkeypatch, tmp_path, capsys):
    from interdiff_tpu.cli.train_correction_skeleton import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--results_dir", str(tmp_path)], monkeypatch)
    assert "loss" in capsys.readouterr().out
    _check_run_dir(str(tmp_path))


def test_train_diffusion_smpl_steps_per_dispatch(monkeypatch, tmp_path,
                                                 capsys):
    """--steps_per_dispatch 2 chains both synthetic batches into ONE scan
    dispatch (train/trainer.py::chain_steps); the run completes, logs a
    finite (mean) loss and checkpoints normally."""
    from interdiff_tpu.cli.train_diffusion_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--use_pointnet2", "0", "--embedding_dim", "32",
                "--ff_size", "64", "--num_layers", "2", "--val_every", "1",
                "--steps_per_dispatch", "2",
                "--results_dir", str(tmp_path)], monkeypatch)
    out = capsys.readouterr().out
    assert "done: 2 steps" in out
    _check_run_dir(str(tmp_path))


def test_train_diffusion_smpl_bn_train_mode(monkeypatch, tmp_path, capsys):
    """--bn_train_mode 1: batch-statistic encoder BN, running stats held
    outside the optimizer, merged back for validation + checkpoint."""
    from interdiff_tpu.cli.train_diffusion_smpl import main

    _run(main, ["--synthetic", "2", "--epochs", "1", "--batch_size", "8",
                "--bn_train_mode", "1", "--synthetic_points", "1024",
                "--embedding_dim", "32", "--ff_size", "64",
                "--num_layers", "2", "--val_every", "1",
                "--val_respacing", "4",
                "--results_dir", str(tmp_path / "bn")], monkeypatch)
    out = capsys.readouterr().out
    assert "val_loss" in out
    assert (tmp_path / "bn").exists()
