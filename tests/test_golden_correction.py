"""Golden-file regression: the converted reference checkpoints must keep
producing byte-stable outputs on fixed inputs across refactors (the golden
arrays in tests/golden/ were recorded from the initial verified conversion
of `interdiff/checkpoints/{correction,obj_skeleton}.ckpt`)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CKPT_DIR = "/root/reference/interdiff/checkpoints"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT_DIR), reason="reference checkpoints not mounted")


def test_smpl_correction_golden():
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.utils.checkpoint import load_correction_smpl

    z = np.load(os.path.join(GOLDEN_DIR, "correction_smpl.npz"))
    variables, _ = load_correction_smpl()
    proj = ObjProjectorSmpl(num_markers=67, n_pre=10, past_len=10,
                            future_len=25)
    out = proj.apply(variables, jnp.asarray(z["obj9"]),
                     jnp.asarray(z["markers"]), jnp.asarray(z["contact"]))
    np.testing.assert_allclose(np.asarray(out), z["out"], atol=2e-5)


def test_skeleton_correction_golden():
    from interdiff_tpu.models.correction import ObjProjectorSkeleton
    from interdiff_tpu.utils.checkpoint import load_correction_skeleton

    z = np.load(os.path.join(GOLDEN_DIR, "correction_skeleton.npz"))
    variables, _ = load_correction_skeleton()
    proj = ObjProjectorSkeleton(num_joints=21, past_len=10, future_len=10)
    qp, tp = proj.apply(variables, jnp.asarray(z["quat"]),
                        jnp.asarray(z["trans"]), jnp.asarray(z["joints"]))
    np.testing.assert_allclose(np.asarray(qp), z["quat_out"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(tp), z["trans_out"], atol=2e-5)
