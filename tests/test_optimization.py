"""Post-hoc optimization tests (`interdiff/optimization.py` equivalent):
the jitted Adam fori_loop runs, returns the expected pytree, and reduces
its own objective on a penetrating configuration."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.eval.optimization import (
    OptimConfig,
    optimize_clip,
    optimize_clip_chunked,
)
from interdiff_tpu.smpl.model import SmplModel


def _tiny_smpl(rng, V=40, J=52):
    parents = np.zeros(J, dtype=np.int64)
    for j in range(1, J):
        parents[j] = (j - 1) // 2
    w = np.abs(rng.random((V, J)))
    w /= w.sum(1, keepdims=True)
    return SmplModel.create(
        v_template=rng.standard_normal((V, 3)) * 0.3,
        shapedirs=rng.standard_normal((V, 3, 10)) * 0.01,
        posedirs=rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        j_regressor=np.abs(rng.random((J, V)))
        / np.abs(rng.random((J, V))).sum(1, keepdims=True),
        weights=w, parents=parents,
        faces=np.array([[0, 1, 2], [1, 2, 3]], dtype=np.int32))


def test_optimize_clip_runs_and_improves(rng):
    smpl = _tiny_smpl(rng)
    T, P = 12, 32
    body_pose = jnp.asarray(
        rng.standard_normal((T, 66)).astype(np.float32) * 0.2)
    hand_pose = jnp.asarray(
        rng.standard_normal((T, 90)).astype(np.float32) * 0.05)
    trans = jnp.asarray(rng.standard_normal((T, 3)).astype(np.float32) * 0.1)
    betas = jnp.zeros((T, 10))
    obj_angles = jnp.asarray(
        rng.standard_normal((T, 3)).astype(np.float32) * 0.3)
    # object centered inside the body -> guaranteed penetration to fix
    obj_trans = jnp.zeros((T, 3))
    obj_points = jnp.asarray(
        rng.standard_normal((P, 3)).astype(np.float32) * 0.05)

    cfg = OptimConfig(iters=30, keep_after=5, nn_chunk=None)
    out = optimize_clip(smpl, body_pose=body_pose, hand_pose=hand_pose,
                        body_trans=trans, betas=betas, obj_angles=obj_angles,
                        obj_trans=obj_trans, obj_points=obj_points, cfg=cfg)

    assert out["pose"].shape == (T, 156)
    assert out["trans"].shape == (T, 3)
    assert out["obj_angles"].shape == (T, 3)
    assert out["obj_trans"].shape == (T, 3)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()

    # the optimizer moved the object away from its anchored start
    assert float(jnp.abs(out["obj_trans"] - obj_trans).max()) > 1e-5
    assert np.isfinite(float(out["best_loss"]))

    # pen_fix_body (object-only penetration resolution): the stop-grad
    # branch compiles, stays finite, and still moves the object — while the
    # body receives NO gradient from the penetration term, so with every
    # body-anchor weight unchanged the refined pose must stay closer to its
    # start than in the surface-chasing default whenever penetration is the
    # dominant term (asserted weakly: both runs finite + object moved)
    out_fix = optimize_clip(
        smpl, body_pose=body_pose, hand_pose=hand_pose, body_trans=trans,
        betas=betas, obj_angles=obj_angles, obj_trans=obj_trans,
        obj_points=obj_points,
        cfg=OptimConfig(iters=30, keep_after=5, nn_chunk=None,
                        pen_fix_body=True, ratio_denom=10.0))
    for v in out_fix.values():
        assert np.isfinite(np.asarray(v)).all()
    assert float(jnp.abs(out_fix["obj_trans"] - obj_trans).max()) > 1e-5

    # bounded-dispatch variant (axon watchdog kills long single dispatches):
    # a host loop over short segments must reproduce the one-dispatch
    # descent — same step_fn, index delivered via the fori_loop bounds, so
    # the split exercises both the full-chunk and the remainder graph.
    # Equivalence is asserted tightly over FEW iterations (the two lowerings
    # — one fori_loop vs segmented while_loops — fuse differently, and f32
    # rounding differences amplify chaotically through Adam steps)…
    kwargs = dict(body_pose=body_pose, hand_pose=hand_pose, body_trans=trans,
                  betas=betas, obj_angles=obj_angles, obj_trans=obj_trans,
                  obj_points=obj_points)
    cfg6 = OptimConfig(iters=6, keep_after=1, nn_chunk=None)
    out6 = optimize_clip(smpl, cfg=cfg6, **kwargs)
    out6_chunked = optimize_clip_chunked(smpl, cfg=cfg6, dispatch_chunk=4,
                                         **kwargs)
    # raw descent quantities agree to (fusion-dependent) f32 rounding,
    # ~1e-4; "pose" additionally goes through matrix_to_axis_angle, which
    # amplifies ~1e-7 matrix perturbations near its singularities on this
    # random tiny body.  A segment-index off-by-one would shift the
    # annealing ratio and move the traced terms by >=1e-2 relative, so
    # rtol=1e-3 still discriminates structural bugs from rounding.
    tols = {"pose": dict(rtol=0.0, atol=2e-3)}
    for k in out6:
        np.testing.assert_allclose(
            np.asarray(out6_chunked[k]), np.asarray(out6[k]),
            err_msg=k, **tols.get(k, dict(rtol=1e-3, atol=2e-4)))
    # …and the trace must be aligned with the single-dispatch one row-for-row
    # across the segment boundary (an off-by-one in the segment start would
    # shift the annealing ratio and every row after iteration 4)
    tr6, tr6c = np.asarray(out6["terms"]), np.asarray(out6_chunked["terms"])
    assert tr6.shape == tr6c.shape == (6, tr6.shape[1])
    np.testing.assert_allclose(tr6c, tr6, rtol=1e-3, atol=2e-4)
    assert tr6c[0, 0] == 0.0  # iter-0 pen weight is exactly 0 (ratio 0/350)
    assert (np.abs(tr6c[1:, 3]) > 0).all()  # every row actually written

    # gross-divergence guard over the long run (chaos-scale tolerance)
    cfg30 = OptimConfig(iters=30, keep_after=5, nn_chunk=None)
    out_chunked = optimize_clip_chunked(smpl, cfg=cfg30, dispatch_chunk=12,
                                        **kwargs)
    np.testing.assert_allclose(np.asarray(out_chunked["pose"]),
                               np.asarray(out["pose"]), atol=5e-2)
