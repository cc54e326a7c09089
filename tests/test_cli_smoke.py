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


def _write_tiny_ply(path):
    """A 4-vertex tetrahedron ply for the object-mesh render branch."""
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 4\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n0.2 0 0\n0 0.2 0\n0 0 0.2\n"
        "3 0 1 2\n3 0 1 3\n3 0 2 3\n3 1 2 3\n")
    return str(path)


def test_eval_smpl_long_synthetic(monkeypatch, tmp_path, capsys):
    import json

    from interdiff_tpu.cli.eval_smpl_long import main

    mesh = _write_tiny_ply(tmp_path / "tiny.ply")
    _run(main, ["--synthetic", "1", "--batch_size", "2", "--rollouts", "1",
                "--respacing", "5", "--mode", "no_correction",
                "--out_dir", str(tmp_path), "--obj_mesh", mesh,
                "--render_dir", str(tmp_path / "gifs")], monkeypatch)
    out = capsys.readouterr().out
    assert "rolled out 60 frames" in out  # 35 + 25 (one extra chunk)
    roll = np.load(tmp_path / "rollout_0.npy")
    assert roll.shape[1] == 60 and np.isfinite(roll).all()
    # per-window drift metrics are computed, printed and persisted
    assert "rollout drift summary" in out and "window 1" in out
    drift = json.load(open(tmp_path / "drift_metrics.json"))
    assert len(drift) == 2  # first window + 1 rollout chunk
    for w in drift:
        assert set(w) == {"global_mpjpe", "local_mpjpe", "body_translation",
                          "obj_translation"}
        assert all(np.isfinite(v) and v > 0 for v in w.values())
    # the full-horizon render covers every rolled-out frame (and exercised
    # the object-mesh faces branch via --obj_mesh)
    from PIL import Image

    gif = Image.open(tmp_path / "gifs" / "rollout0.gif")
    assert gif.n_frames == 60


def test_eval_smpl_short_render_object_mesh(monkeypatch, tmp_path, capsys):
    """--obj_mesh routes the render through the mesh_viz faces branch
    (`viz/mesh_viz.py:79` obj_is_cloud=False), the path the reference's
    object rendering takes (`eval_smpl_short.py:317-327`)."""
    from interdiff_tpu.cli.eval_smpl_short import main

    mesh = _write_tiny_ply(tmp_path / "tiny.ply")
    _run(main, ["--synthetic", "1", "--batch_size", "2",
                "--diverse_samples", "1", "--diverse_fold", "1",
                "--respacing", "5", "--mode", "no_correction",
                "--obj_mesh", mesh,
                "--render_dir", str(tmp_path / "gifs")], monkeypatch)
    from PIL import Image

    gif = Image.open(tmp_path / "gifs" / "batch1.gif")
    # gif encoders may merge identical quantised consecutive frames, so pin
    # "a real animation came out", not an exact count
    assert gif.n_frames > 1


def test_optimization_cli_from_samples(monkeypatch, tmp_path, capsys):
    """The generate-then-refine pipeline end-to-end: sample futures from
    the (randomly-initialized) diffusion model, vmapped 200-iter refiner
    shrunk to 4 iters, penetration reported before/after."""
    import json

    from interdiff_tpu.cli.optimization import main

    _run(main, ["--synthetic", "1", "--diffusion_ckpt", "",
                "--respacing", "5", "--iters", "4", "--batch_size", "2",
                "--past_len", "3", "--future_len", "4",
                "--ratio_denom", "2",  # full-strength annealing knob plumbed
                "--out_dir", str(tmp_path)], monkeypatch)
    out = capsys.readouterr().out
    assert "penetrate_before" in out and "penetrate_after" in out
    summary = json.load(open(tmp_path / "summary.json"))
    assert summary["batches"] == 1
    assert np.isfinite(summary["penetrate_before"])
    assert np.isfinite(summary["penetrate_after"])
    refined = np.load(tmp_path / "refined_1.npz")
    assert refined["pose"].shape == (2, 7, 156)

    # batched bounded-dispatch path (--dispatch_chunk): same pipeline, the
    # refine runs as a host loop over lax.map'd fori_loop segments
    _run(main, ["--synthetic", "1", "--diffusion_ckpt", "",
                "--respacing", "5", "--iters", "4", "--batch_size", "2",
                "--past_len", "3", "--future_len", "4",
                "--dispatch_chunk", "3",  # full segment + remainder
                "--out_dir", str(tmp_path / "chunked")], monkeypatch)
    out = capsys.readouterr().out
    assert "penetrate_after" in out
    refined_c = np.load(tmp_path / "chunked" / "refined_1.npz")
    assert refined_c["pose"].shape == (2, 7, 156)
    assert np.isfinite(refined_c["pose"]).all()
    assert np.isfinite(refined["pose"]).all()
    # the best-iterate tracker must have fired (keep_after < iters-1);
    # best_loss=inf would mean the refiner silently returned initial params
    assert np.isfinite(refined["best_loss"]).all()


def test_eval_smpl_short_mesh_devices(monkeypatch, capsys):
    """--mesh_devices 2: sampling + FK/metrics sharded over a 2-device data
    mesh through the production CLI path."""
    from interdiff_tpu.cli.eval_smpl_short import main

    _run(main, ["--synthetic", "1", "--batch_size", "2",
                "--diverse_samples", "2", "--diverse_fold", "2",
                "--respacing", "5", "--mode", "no_correction",
                "--mesh_devices", "2"], monkeypatch)
    out = capsys.readouterr().out
    assert "global_mpjpe" in out and "penetrate" in out


def test_eval_skeleton_mesh_devices(monkeypatch, capsys):
    """Skeleton eval CLI end-to-end with the batch sharded over a 2-device
    data mesh (also the first in-process cover of this CLI's glue)."""
    from interdiff_tpu.cli.eval_skeleton import main

    _run(main, ["--synthetic", "1", "--batch_size", "4",
                "--respacing", "5", "--mode", "no_correction",
                "--mesh_devices", "2"], monkeypatch)
    out = capsys.readouterr().out
    assert "mpjpe_h" in out and "rotation_error" in out


def test_load_mdm_window_mismatch_raises(monkeypatch):
    """A reference .ckpt replaces the CLI-built module, so its embedded
    past/future window must match the CLI flags — a silent mismatch would
    run the eval with inconsistent conditioning (dataset windows and
    inpaint masks come from the flags)."""
    import pytest

    from interdiff_tpu.cli import common
    from interdiff_tpu.models.mdm_smpl import MDMSmpl

    ckpt_model = MDMSmpl(past_len=10, future_len=25)
    hp = {"past_len": 10, "future_len": 25}
    monkeypatch.setattr(common, "maybe_reference_mdm",
                        lambda path, track: (ckpt_model, {"params": {}}, hp))
    # matching windows pass through
    m, p = common.load_mdm("x.ckpt", "smpl", None, lambda: None,
                           past_len=10, future_len=25)
    assert m is ckpt_model
    with pytest.raises(ValueError, match="past_len"):
        common.load_mdm("x.ckpt", "smpl", None, lambda: None,
                        past_len=20, future_len=15)

    # skeleton track: MDMSkeleton has no future_len attribute, so the check
    # must come from the checkpoint's embedded hyper_parameters (ADVICE r3)
    from interdiff_tpu.models.mdm_skeleton import MDMSkeleton

    skel = MDMSkeleton(past_len=10)
    monkeypatch.setattr(
        common, "maybe_reference_mdm",
        lambda path, track: (skel, {"params": {}},
                             {"past_len": 10, "future_len": 10}))
    with pytest.raises(ValueError, match="future_len"):
        common.load_mdm("x.ckpt", "skeleton", None, lambda: None,
                        past_len=10, future_len=25)
    m, _ = common.load_mdm("x.ckpt", "skeleton", None, lambda: None,
                           past_len=10, future_len=10)
    assert m is skel
