"""Synthetic tiny-model fixtures shared by the test suite and the driver's
multi-chip dry run (`__graft_entry__.dryrun_multichip`).

Real SMPL-H pkls aren't shipped in this image (see README "Data reality"),
so structure-exercising paths — the correction-in-scan sampler, FK, signed
distances — run against a small synthetic `SmplModel` with the same tree
shape as SMPL-H (52 joints, 156-dim poses)."""

from __future__ import annotations

import numpy as np

from interdiff_tpu.smpl.model import SmplModel


def tiny_smpl_model(rng: np.random.Generator, V: int = 64,
                    J: int = 22 + 30) -> SmplModel:
    """Synthetic SMPL-H-shaped model (52 joints so 156-dim poses work):
    binary-tree kinematic topology, random-but-small shape dirs, uniform
    skinning weights.  Deterministic given ``rng``."""
    parents = np.zeros(J, dtype=np.int64)
    for j in range(1, J):
        parents[j] = (j - 1) // 2  # binary-tree topology
    return SmplModel.create(
        v_template=rng.standard_normal((V, 3)) * 0.2,
        shapedirs=rng.standard_normal((V, 3, 10)) * 0.01,
        posedirs=rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        j_regressor=np.abs(rng.random((J, V)))
        / np.abs(rng.random((J, V))).sum(1, keepdims=True),
        weights=np.full((V, J), 1.0 / J),  # uniform skinning weights
        parents=parents,
        faces=np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]], dtype=np.int32),
    )


def make_tiny_correction_sampler(model, diffusion, gt, *,
                                 num_markers: int = 40, n_pre: int = 4,
                                 body_seed: int = 3, proj_seed: int = 1):
    """Correction-in-scan sampler over the tiny synthetic body: FK +
    signed-distance gate + freshly-initialised projector behind lax.cond,
    gate active on every scan step.  Shared by
    `__graft_entry__.dryrun_multichip` and
    `tests/test_parallel.py::test_data_parallel_correction_sampler_*` so the
    driver dry run and the CI pin exercise the identical construction."""
    import jax
    import jax.numpy as jnp

    from interdiff_tpu.eval.smpl_short import SmplEvalConfig, make_sampler
    from interdiff_tpu.models.correction import ObjProjectorSmpl

    B, T = gt.shape[:2]
    cfg = SmplEvalConfig(correction_t_max=diffusion.num_timesteps * 10,
                         correction_every=1, nn_chunk=None)
    projector = ObjProjectorSmpl(num_markers=num_markers, n_pre=n_pre)
    proj_params = projector.init(
        jax.random.PRNGKey(proj_seed), gt[..., 135:],
        jnp.zeros((B, T, num_markers, 3), jnp.float32),
        jnp.zeros((B, num_markers), jnp.float32))
    return make_sampler(
        cfg, model, diffusion,
        smpl=tiny_smpl_model(np.random.default_rng(body_seed)),
        projector=projector, projector_params=proj_params,
        use_correction=True, markers_idx=np.arange(num_markers))
