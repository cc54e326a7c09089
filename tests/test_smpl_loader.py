"""Chumpy-free SMPL pkl loader tests: a synthetic model pkl is created with
stub chumpy classes (the real model pkls are not in this snapshot), then
loaded through the shim unpickler and run through the JAX forward."""

import pickle
import sys
import types

import numpy as np
import jax.numpy as jnp


def _install_fake_chumpy():
    """Register stub chumpy modules so pickles carry chumpy class paths."""
    chumpy = types.ModuleType("chumpy")
    ch_mod = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)

    # make instances pickle as chumpy.ch.Ch (the real model pkls' class path)
    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    ch_mod.Ch = Ch
    chumpy.ch = ch_mod
    chumpy.Ch = Ch
    sys.modules["chumpy"] = chumpy
    sys.modules["chumpy.ch"] = ch_mod
    return Ch


class _FakeSparse:
    """Mimics the scipy-sparse J_regressor (exposes .toarray())."""

    def __init__(self, dense):
        self._dense = np.asarray(dense)

    def toarray(self):
        return self._dense


def _write_fake_smpl_pkl(path, rng, V=30, J=5, num_betas=4):
    Ch = _install_fake_chumpy()
    data = {
        "v_template": Ch(rng.standard_normal((V, 3))),
        "shapedirs": Ch(rng.standard_normal((V, 3, num_betas + 2))),
        "posedirs": Ch(rng.standard_normal((V, 3, 9 * (J - 1))) * 0.01),
        "J_regressor": _FakeSparse(rng.random((J, V))),
        "weights": Ch(np.full((V, J), 1.0 / J)),
        "kintree_table": np.stack([
            np.array([2**32 - 1, 0, 1, 1, 2], dtype=np.int64),
            np.arange(J, dtype=np.int64)]),
        "f": np.array([[0, 1, 2]], dtype=np.uint32),
        "betas": Ch(np.zeros(num_betas)),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


def test_loader_shim_and_forward(tmp_path, rng):
    from interdiff_tpu.smpl.loader import (
        convert_pkl_to_npz,
        load_smpl_pkl,
        smpl_model_from_npz,
        smpl_model_from_pkl,
    )
    from interdiff_tpu.smpl.model import smpl_forward

    pkl = tmp_path / "SMPLH_test.pkl"
    _write_fake_smpl_pkl(pkl, rng)
    try:
        data = load_smpl_pkl(pkl)
        assert data["v_template"].shape == (30, 3)
        assert data["J_regressor"].shape == (5, 30)

        model = smpl_model_from_pkl(pkl, num_betas=4)
        assert model.shapedirs.shape == (30, 3, 4)  # truncated to num_betas
        assert model.parents[0] == 0  # 2**32-1 root fixed

        verts, jtr, _, _ = smpl_forward(
            model, jnp.zeros((2, 15)), jnp.zeros((2, 4)), jnp.zeros((2, 3)))
        assert verts.shape == (2, 30, 3)
        np.testing.assert_allclose(np.asarray(verts[0]),
                                   data["v_template"], atol=1e-5)

        # npz round trip
        npz = tmp_path / "model.npz"
        convert_pkl_to_npz(pkl, npz, num_betas=4)
        model2 = smpl_model_from_npz(npz)
        verts2, _, _, _ = smpl_forward(
            model2, jnp.zeros((2, 15)), jnp.zeros((2, 4)), jnp.zeros((2, 3)))
        np.testing.assert_allclose(np.asarray(verts2), np.asarray(verts),
                                   atol=1e-6)
    finally:
        sys.modules.pop("chumpy", None)
        sys.modules.pop("chumpy.ch", None)
