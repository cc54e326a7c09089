"""Integration test on the REAL BEHAVE sample sequence shipped with the
reference snapshot (`interdiff/data/behave/sequence/Date01_Sub01_backpack_back`,
1408 frames) and the real simplified backpack scan
(`objects/backpack/backpack_f1000.ply`).

Chains the production data path end-to-end on real files:
`prepare_behave.prepare_sequence` (contact-label generation, the
`data/prepare_behave.py` equivalent) -> `load_behave_sequences`
(`dataset_smpl.py:44-70` load path) -> `BehaveDataset`/`collate`
(clip windows + canonicalization, `dataset_smpl.py:90-189`) ->
`smpl_gt_from_raw` (train-ready state tensor).

The SMPL-H pkls are not in the image, so FK runs on the full-size
synthetic body (V=6890 so the SSM-67 marker gather is real-indexed);
everything else — npz parsing, mesh I/O, surface sampling, signed
distance, canonicalization — runs on the real files.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

REF_SEQ = ("/root/reference/interdiff/data/behave/sequence/"
           "Date01_Sub01_backpack_back")
REF_OBJ = "/root/reference/interdiff/data/behave/objects"
N_FRAMES = 72  # 2 clip windows of (10+25) frames; full FK on 1408 is slow

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SEQ), reason="reference sample sequence absent")


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    """Writable copy of the sample sequence, sliced to N_FRAMES, plus the
    info.json the snapshot does not ship."""
    root = tmp_path_factory.mktemp("behave")
    seq_dir = root / "sequence" / "Date01_Sub01_backpack_back"
    seq_dir.mkdir(parents=True)
    with np.load(os.path.join(REF_SEQ, "object_fit_all.npz"),
                 allow_pickle=True) as f:
        np.savez(seq_dir / "object_fit_all.npz",
                 angles=f["angles"][:N_FRAMES], trans=f["trans"][:N_FRAMES])
    with np.load(os.path.join(REF_SEQ, "smpl_fit_all.npz"),
                 allow_pickle=True) as f:
        np.savez(seq_dir / "smpl_fit_all.npz",
                 poses=f["poses"][:N_FRAMES], betas=f["betas"][:N_FRAMES],
                 trans=f["trans"][:N_FRAMES])
    (seq_dir / "info.json").write_text(
        json.dumps({"gender": "male", "cat": "backpack"}))

    from interdiff_tpu.cli.common import synthetic_smpl_body

    body = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
    return root, {"male": body, "female": body}


def test_real_backpack_ply_loads():
    from interdiff_tpu.data.mesh_io import load_mesh, sample_surface

    mesh = load_mesh(os.path.join(REF_OBJ, "backpack/backpack_f1000.ply"))
    assert mesh.vertices.shape[1] == 3 and len(mesh.faces) > 500
    assert np.isfinite(mesh.vertices).all()
    # real scan is roughly backpack-sized (extents under a metre)
    ext = mesh.vertices.max(0) - mesh.vertices.min(0)
    assert (ext > 0.05).all() and (ext < 2.0).all()
    pts, fidx = sample_surface(mesh, 256, rng=np.random.default_rng(0))
    assert pts.shape == (256, 3) and np.isfinite(pts).all()
    assert (fidx >= 0).all() and (fidx < len(mesh.faces)).all()


def test_prepare_then_load_then_batch(staged):
    root, smpl_models = staged
    seq_dir = os.path.join(root, "sequence", "Date01_Sub01_backpack_back")

    from interdiff_tpu.data.prepare_behave import prepare_sequence

    out = prepare_sequence(seq_dir, REF_OBJ, smpl_models, num_samples=256)
    with np.load(out, allow_pickle=True) as f:
        d = f["arr_0"].item()
    assert d["object_points"].shape == (256, 6)
    assert np.isfinite(d["object_points"]).all()
    assert len(d["object_contact_vertex_label"]) == N_FRAMES
    assert len(d["human_contact_vertex_label"]) == N_FRAMES
    assert set(d["foot_contact_joint_label"]) <= {10, 11}

    from interdiff_tpu.data.behave import (
        BehaveDataset,
        collate,
        load_behave_sequences,
    )

    seqs = load_behave_sequences(os.path.join(root, "sequence"),
                                 smpl_models=smpl_models, mode="train")
    assert len(seqs) == 1
    (seq,) = seqs
    assert seq.obj_name == "backpack" and seq.num_frames == N_FRAMES
    assert seq.human_verts.shape == (N_FRAMES, 6890, 6)
    # Date01* belongs to the train split, never to test (`dataset_smpl.py:31`)
    assert load_behave_sequences(os.path.join(root, "sequence"),
                                 smpl_models=smpl_models, mode="test") == []

    ds = BehaveDataset(seqs, past_len=10, future_len=25,
                       rng=np.random.default_rng(0))
    assert len(ds) == 2
    batch = collate([ds[0], ds[1]])
    T = 35
    assert batch["body_pose"].shape == (2, T, 156)
    assert batch["human_verts"].shape == (2, T, 6890, 7)
    assert batch["markers"].shape == (2, T, 67, 7)
    assert batch["obj_points_frames"].shape == (2, T, 256, 7)
    for v in batch.values():
        assert np.isfinite(np.asarray(v, dtype=np.float64)).all()

    # canonicalization invariants on real motion (`dataset_smpl.py:119-131`):
    # frame-0 pelvis at the origin, frame-0 global orient yaw-aligned (the
    # x-column of its rotation matrix has no z-component)
    assert np.abs(batch["pelvis"][:, 0]).max() < 1e-5
    from interdiff_tpu.geometry.rotations_np import rotvec_to_matrix_np

    for b in range(2):
        R0 = rotvec_to_matrix_np(batch["body_pose"][b, 0, :3]
                                 .astype(np.float64))
        assert abs(R0[2, 0]) < 1e-5

    # train-ready state tensor for the flagship model
    import jax.numpy as jnp

    from interdiff_tpu.models.mdm_smpl import smpl_gt_from_raw

    gt = smpl_gt_from_raw(jnp.asarray(batch["body_pose"][..., :66]),
                          jnp.asarray(batch["body_trans"]),
                          jnp.asarray(batch["obj_angles"]),
                          jnp.asarray(batch["obj_trans"]))
    assert gt.shape == (2, T, 144)
    assert bool(jnp.isfinite(gt).all())


def test_optimization_cli_dataset_mode(staged, monkeypatch, tmp_path, capsys):
    """The reference's own regime (`optimization.py:216-219`): refine real
    dataset clips and report the penetration delta."""
    import sys

    root, smpl_models = staged
    from interdiff_tpu.cli.optimization import main

    # order-independent: stage the contact labels this mode's loader needs
    seq_dir = os.path.join(root, "sequence", "Date01_Sub01_backpack_back")
    if not os.path.exists(os.path.join(seq_dir, "contact.npz")):
        from interdiff_tpu.data.prepare_behave import prepare_sequence

        prepare_sequence(seq_dir, REF_OBJ, smpl_models, num_samples=256)

    monkeypatch.setattr(sys, "argv", [
        "optimization", "--motion_path", os.path.join(root, "sequence"),
        "--synthetic_body", "--iters", "4", "--limit", "1",
        "--past_len", "10", "--future_len", "25",
        "--out_dir", str(tmp_path)])
    main()
    out = capsys.readouterr().out
    assert "penetrate_before" in out and "penetrate_after" in out
    assert os.path.exists(os.path.join(tmp_path, "clip_0.npz"))
    summary = json.loads(
        open(os.path.join(tmp_path, "summary.json")).read())
    assert summary["mode"] == "dataset" and summary["clips"] == 1
    assert np.isfinite(summary["penetrate_before"])
    assert np.isfinite(summary["penetrate_after"])


def test_train_correction_render(staged, monkeypatch, tmp_path, capsys):
    """--render_interval on the correction trainer: pred-vs-gt object
    trajectory gifs through the mesh renderer (the reference renders them
    during validation, `train_correction_smpl.py:192-259`)."""
    import sys

    root, smpl_models = staged
    from interdiff_tpu.cli.train_correction_smpl import main

    # order-independent: stage the contact labels the correction loader needs
    seq_dir = os.path.join(root, "sequence", "Date01_Sub01_backpack_back")
    if not os.path.exists(os.path.join(seq_dir, "contact.npz")):
        from interdiff_tpu.data.prepare_behave import prepare_sequence

        prepare_sequence(seq_dir, REF_OBJ, smpl_models, num_samples=256)

    monkeypatch.setattr(sys, "argv", [
        "prog", "--motion_path", os.path.join(root, "sequence"),
        "--synthetic_body", "--epochs", "1", "--batch_size", "4",
        "--render_interval", "1", "--results_dir", str(tmp_path)])
    main()
    capsys.readouterr()
    gifs = os.listdir(os.path.join(tmp_path, "render"))
    assert any(g.endswith("_pred.gif") for g in gifs)
    assert any(g.endswith("_gt.gif") for g in gifs)
