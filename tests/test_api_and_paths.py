"""Top-level API exports + YAML path-config tests."""

import numpy as np


def test_top_level_exports():
    import interdiff_tpu

    assert interdiff_tpu.GaussianDiffusion is not None
    assert interdiff_tpu.MDMSmpl is not None
    assert interdiff_tpu.ObjProjectorSkeleton is not None
    assert "SmplModel" in dir(interdiff_tpu)


def test_load_paths(tmp_path):
    from interdiff_tpu.data.paths import load_paths

    cfg = tmp_path / "BEHAVE.yml"
    cfg.write_text(
        "MOTION_PATH: /data/behave/sequences\n"
        "OBJECT_TEMPLATE: /data/behave/objects\n"
        "SPLIT_PATH: /data/behave/split.json\n"
        "MODEL_PATH:\n")  # empty, like the shipped BEHAVE.yml
    p = load_paths(cfg)
    assert p.motion_path == "/data/behave/sequences"
    assert p.object_path == "/data/behave/objects"
    assert p.model_path is None

    cfg2 = tmp_path / "HOI.yml"
    cfg2.write_text("MOTION_PATH: /data/hoi/motion\n")
    p2 = load_paths(cfg2)
    assert p2.motion_path == "/data/hoi/motion"


def test_fit_batch_size_guards_small_corpora():
    from interdiff_tpu.cli.common import fit_batch_size

    assert fit_batch_size(5, 32) == 5     # shrink to fit
    assert fit_batch_size(64, 32) == 32   # plenty of clips -> unchanged
    assert fit_batch_size(0, 32) == 32    # empty corpus handled upstream


def test_restore_params_manager_layout_without_template(tmp_path):
    """A CheckpointManager save (the trainers' layout) must restore its
    full composite tree with template=None — the load path used by
    load_correction_variables on orbax dirs. A bare mgr.restore(step)
    silently drops the 'default' item; restore_params must not."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from interdiff_tpu.cli.common import restore_params

    tree = {"params": {"w": jnp.arange(4.0)},
            "batch_stats": {"mean": jnp.ones((2,))}}
    mgr = ocp.CheckpointManager(tmp_path / "ckpt")
    mgr.save(0, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()
    mgr.close()

    restored = restore_params(str(tmp_path / "ckpt"), None)
    assert set(restored) == {"params", "batch_stats"}
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(4.0))
    np.testing.assert_allclose(
        np.asarray(restored["batch_stats"]["mean"]), np.ones((2,)))


def test_load_smpl_models_synthetic_body():
    from types import SimpleNamespace

    from interdiff_tpu.cli.common import load_smpl_models

    models = load_smpl_models(SimpleNamespace(synthetic_body=True))
    assert set(models) == {"male", "female"}
    assert models["male"] is models["female"]  # one shared stand-in body
    assert models["male"].v_template.shape[0] == 6890
