"""Post-hoc test-time refinement — contract from `interdiff/optimization.py`:
200 Adam(lr 1e-3) iterations over body/hand/global rotations (as raw
rotation matrices, per the reference), body/object translations and object
rotation, minimising penetration + contact-vert regularisation + foot-skate
lock + 1st/2nd-order smoothness + anchors to the initial values; keep the
best iterate after iteration 150.

TPU-native redesign: the reference re-runs SMPL FK + chamfer on CUDA from a
Python loop (SURVEY.md §3.5 hot loop).  Here the full 200-step Adam descent
— FK, vertex normals, signed distance, all regularisers, the best-iterate
tracker — is ONE jitted `lax.fori_loop` via `jax.value_and_grad` + optax.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from interdiff_tpu.geometry.normals import vertex_normals
from interdiff_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
)
from interdiff_tpu.ops.signed_distance import (
    nearest_neighbor,
    safe_sqrt,
    signed_nearest,
)
from interdiff_tpu.smpl.model import SmplModel, smpl_forward


@dataclass(frozen=True)
class OptimConfig:
    iters: int = 200
    lr: float = 1e-3
    keep_after: int = 150
    ratio_denom: float = 350.0  # penetration annealing (`optimization.py:141`)
    foot_static_thresh: float = 0.008
    nn_chunk: Optional[int] = 512
    # Ablation knob: stop-grad the body in the penetration term so it can
    # only push the OBJECT out.  Measured on the real BEHAVE sequence
    # (stand-in body, 8 GT clips) the body gradient is the WORKHORSE, not a
    # failure mode — fraction-inside after refinement is 0.255 with it and
    # 0.284 without (deep clip 0: 0.436->0.255 vs 0.436->0.572): the body
    # excavating away from embedded points flips whole regions outside.
    # The per-term trace shows the systematic fraction creep on shallow
    # clips comes from the weight-1000 smoothness terms flattening true
    # motion acceleration while the annealed pen weight is still ~0
    # (iters 0-25), sweeping the object into the body; penetration DEPTH
    # meanwhile falls monotonically in every measured configuration
    # (e.g. 1.11->0.17, 0.23->0.04 m) — the |signed|-of-inside-points
    # objective (`optimization.py:68,77`) targets depth, not count.
    pen_fix_body: bool = False


# columns of the per-iteration diagnostics trace returned by optimize_clip
TERM_NAMES = ("loss_dist_o", "loss_verts_reg", "reg_anchors", "loss_smooth",
              "pen_depth", "pen_frac")


def _first_second_order(x: jax.Array, w2: float, w1: float) -> jax.Array:
    """w2 * ||accel||^2 + w1 * ||vel||^2 smoothness (`:89-107`)."""
    acc = (x[1:-1] - x[:-2]) - (x[2:] - x[1:-1])
    vel = x[1:] - x[:-1]
    return w2 * jnp.mean(acc ** 2) + w1 * jnp.mean(vel ** 2)


def _refiner_pieces(smpl: SmplModel, cfg: OptimConfig):
    """(init_fn, step_fn, finalize_fn) for the per-clip Adam refinement.

    All clip inputs are FUNCTION ARGUMENTS (not closure constants), so both
    the single-dispatch `optimize_clip` and the bounded-dispatch
    `optimize_clip_chunked` can jit these once per shape.  Everything the
    step needs — anchors, GT verts, foot-contact masks — rides in the carry
    as device arrays."""
    tx = optax.adam(cfg.lr)

    def init_fn(body_pose, hand_pose, body_trans, betas, obj_angles,
                obj_trans, obj_points):
        T = body_pose.shape[0]
        glo_rot0 = axis_angle_to_matrix(body_pose[:, :3].reshape(T, 1, 3))
        body_rot0 = axis_angle_to_matrix(body_pose[:, 3:].reshape(T, -1, 3))
        hand_rot0 = axis_angle_to_matrix(hand_pose.reshape(T, -1, 3))
        obj_rot0 = axis_angle_to_matrix(obj_angles)

        verts_gt, jtr_gt, _, _ = smpl_forward(
            smpl, jnp.concatenate([body_pose, hand_pose], axis=1), betas,
            body_trans)
        lf, rf = jtr_gt[:, 10], jtr_gt[:, 11]
        xz = jnp.array([0, 2])
        left_static = (jnp.linalg.norm(lf[1:][:, xz] - lf[:-1][:, xz],
                                       axis=1) + 1e-6) < cfg.foot_static_thresh
        right_static = (jnp.linalg.norm(rf[1:][:, xz] - rf[:-1][:, xz],
                                        axis=1) + 1e-6) < cfg.foot_static_thresh

        params0 = {
            "body_rot": body_rot0, "transl": body_trans, "glo_rot": glo_rot0,
            "obj_transl": obj_trans, "obj_rot": obj_rot0,
            "hand_rot": hand_rot0,
        }
        aux = {
            "verts_gt": verts_gt, "left_static": left_static,
            "right_static": right_static, "betas": betas,
            "obj_points": obj_points, "anchors": {
                "body_rot": body_rot0, "glo_rot": glo_rot0,
                "obj_rot": obj_rot0, "transl": body_trans,
                "obj_transl": obj_trans,
            },
        }
        trace0 = jnp.zeros((cfg.iters, len(TERM_NAMES)), jnp.float32)
        return (params0, tx.init(params0), jnp.asarray(jnp.inf), params0,
                trace0, aux)

    def loss_fn(p, ratio, aux):
        T = p["transl"].shape[0]
        verts_gt = aux["verts_gt"]
        betas, obj_points = aux["betas"], aux["obj_points"]
        left_static, right_static = aux["left_static"], aux["right_static"]
        anchors = aux["anchors"]
        body_trans, obj_trans = anchors["transl"], anchors["obj_transl"]
        glo_rot0, body_rot0 = anchors["glo_rot"], anchors["body_rot"]
        obj_rot0 = anchors["obj_rot"]
        xz = jnp.array([0, 2])
        pose = matrix_to_axis_angle(jnp.concatenate(
            [p["glo_rot"], p["body_rot"], p["hand_rot"]], axis=1)
        ).reshape(T, -1)
        verts, jtr, _, _ = smpl_forward(smpl, pose, betas, p["transl"])

        pts = (jnp.einsum("pj,tij->tpi", obj_points, p["obj_rot"])
               + p["obj_transl"][:, None])
        normals = vertex_normals(verts, jnp.asarray(smpl.faces))
        # fused signed-NN (one sweep, custom VJP through queries, surface
        # AND normals) replaces the bidirectional chamfer whose h2o half
        # and argmin gathers were unused (`optimization.py:55-64`)
        if cfg.pen_fix_body:  # see OptimConfig.pen_fix_body
            pen_surf = jax.lax.stop_gradient(verts)
            pen_norm = jax.lax.stop_gradient(normals)
        else:
            pen_surf, pen_norm = verts, normals
        o2h_sq, o2h_dot = signed_nearest(pts, pen_surf, pen_norm,
                                         chunk=cfg.nn_chunk)
        # safe_sqrt: grad(sqrt)(0)=inf would NaN the Adam refinement the
        # moment a penetrating point crosses the surface (clamped sq == 0)
        o2h_signed = safe_sqrt(o2h_sq) * jnp.sign(o2h_dot)

        pen_w = jnp.where(ratio < 1.0, 20.0 * ratio, 20.0)
        inside = o2h_signed < 0
        w = jnp.where(inside, pen_w, 0.0)
        loss_dist_o = jnp.mean(jnp.sum(jnp.abs(o2h_signed) * w, axis=1))
        # unweighted penetration diagnostics (not part of the objective):
        # mean depth over inside points and fraction-inside, both over the
        # WHOLE window — the refiner has no past/future split, unlike the
        # eval `penetrate` metric and the CLI summaries, which slice future
        # frames only (cli/optimization.py::_make_penetration_fn); compare
        # trends, not absolute values, across the two
        n_in = jnp.maximum(inside.sum(), 1)
        pen_depth = jnp.sum(jnp.where(inside, -o2h_signed, 0.0)) / n_in
        pen_frac = inside.mean()

        # vert anchor on non-contact region (`:72-78`): "any object point
        # within 0.5 m" == nearest object point within 0.5 m — a chunked NN
        # instead of the reference's dense [T, P, V] distance tensor
        # (0.5 G elements at eval shapes); the mask is piecewise-constant
        # so the NN runs outside the gradient tape
        v_sq, _ = nearest_neighbor(jax.lax.stop_gradient(verts),
                                   jax.lax.stop_gradient(pts),
                                   chunk=cfg.nn_chunk)
        contact_v = v_sq < 0.25  # [T, V]
        w_verts = jnp.where(contact_v, 0.0, 1e-2)
        loss_verts_reg = jnp.mean(jnp.sum(
            jnp.abs(verts - verts_gt).sum(2) * w_verts, axis=1))

        lfj, rfj = jtr[:, 10], jtr[:, 11]
        dl = (lfj[1:][:, xz] - lfj[:-1][:, xz]) ** 2
        dr = (rfj[1:][:, xz] - rfj[:-1][:, xz]) ** 2
        nl = jnp.maximum(left_static.sum(), 1)
        nr = jnp.maximum(right_static.sum(), 1)
        loss_left = jnp.sum(dl.mean(1) * left_static) / nl
        loss_right = jnp.sum(dr.mean(1) * right_static) / nr

        reg = (0.1 * jnp.mean(jnp.abs(p["obj_transl"] - obj_trans))
               + 0.1 * jnp.mean(jnp.abs(p["obj_rot"] - obj_rot0))
               + 0.1 * jnp.mean(jnp.abs(p["transl"] - body_trans))
               + 0.1 * jnp.mean(jnp.abs(p["glo_rot"] - glo_rot0))
               + 0.005 * jnp.mean(jnp.abs(p["body_rot"] - body_rot0)
                                  .sum(axis=(1, 2))))

        # body_rot smoothness sums over joint/matrix dims before the time
        # mean (`optimization.py:106`), unlike the plain means above
        br = p["body_rot"]
        br_acc = (br[1:-1] - br[:-2]) - (br[2:] - br[1:-1])
        br_vel = br[1:] - br[:-1]
        loss_body_v = (1000 * jnp.mean(jnp.sum(br_acc ** 2, axis=(1, 2)))
                       + 100 * jnp.mean(jnp.sum(br_vel ** 2, axis=(1, 2)))
                       + 1000 * (loss_left + loss_right))
        loss_v = (_first_second_order(p["transl"], 10, 10)
                  + _first_second_order(p["glo_rot"], 5, 5)
                  + _first_second_order(p["hand_rot"], 50, 50)
                  + _first_second_order(p["obj_transl"], 1000, 100)
                  + _first_second_order(p["obj_rot"], 1000, 100)
                  + loss_body_v)

        total = loss_dist_o + loss_verts_reg + reg + loss_v
        # per-term trace, the reference's per-iteration loss_dict print
        # (`optimization.py:139-142`) as a single [iters, K] device array
        terms = jnp.stack([loss_dist_o, loss_verts_reg, reg, loss_v,
                           pen_depth, pen_frac])
        return total, terms

    def step_fn(i, carry):
        params, opt_state, best_loss, best_params, trace, aux = carry
        ratio = i.astype(jnp.float32) / cfg.ratio_denom
        (loss, terms), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, ratio, aux)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        take = jnp.logical_and(i > cfg.keep_after, loss < best_loss)
        best_loss = jnp.where(take, loss, best_loss)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(take, p, b), best_params, params)
        trace = jax.lax.dynamic_update_index_in_dim(
            trace, terms, i, axis=0)
        return params, opt_state, best_loss, best_params, trace, aux

    def finalize_fn(carry):
        _, _, best_loss, best, trace, _ = carry
        T = best["transl"].shape[0]
        return {
            "pose": jnp.concatenate([
                matrix_to_axis_angle(best["glo_rot"]).reshape(T, -1),
                matrix_to_axis_angle(best["body_rot"]).reshape(T, -1),
                matrix_to_axis_angle(best["hand_rot"]).reshape(T, -1)],
                axis=1),
            "trans": best["transl"],
            "obj_angles": matrix_to_axis_angle(best["obj_rot"]),
            "obj_trans": best["obj_transl"],
            "best_loss": best_loss,
            "terms": trace,  # [iters, len(TERM_NAMES)]
        }

    return init_fn, step_fn, finalize_fn


def optimize_clip(
    smpl: SmplModel,
    *,
    body_pose: jax.Array,  # [T, 66] axis-angle (global + body)
    hand_pose: jax.Array,  # [T, 90]
    body_trans: jax.Array,  # [T, 3]
    betas: jax.Array,  # [T, 10]
    obj_angles: jax.Array,  # [T, 3]
    obj_trans: jax.Array,  # [T, 3]
    obj_points: jax.Array,  # [P, 3]
    cfg: OptimConfig = OptimConfig(),
) -> Dict[str, jax.Array]:
    """Refine one clip; returns axis-angle pose/trans dict (the arrays the
    reference writes back into the data dict, `optimization.py:168-173`).
    The whole descent is ONE dispatch — jit-friendly (usable under
    `lax.map` for batches)."""
    init_fn, step_fn, finalize_fn = _refiner_pieces(smpl, cfg)
    carry = init_fn(body_pose, hand_pose, body_trans, betas, obj_angles,
                    obj_trans, obj_points)
    carry = jax.lax.fori_loop(0, cfg.iters, step_fn, carry)
    return finalize_fn(carry)


def make_chunked_refiner(smpl: SmplModel, cfg: OptimConfig,
                         dispatch_chunk: int = 100):
    """`optimize_clip` with BOUNDED dispatch lengths: returns a callable
    running a host loop over jitted `fori_loop` segments of at most
    `dispatch_chunk` iterations.

    RPC-tunneled TPU workers (axon) kill executions that run too long —
    one dispatch of 8 lax.map'd clips x 350 iterations (2800 sequential
    refiner steps) reproducibly crashed the worker while 8 x 200 = 1600
    completed, so long refinements must be split.  Segment boundaries
    synchronise (`block_until_ready`) to keep one bounded execution in
    flight at a time; the math is identical to `optimize_clip` (same
    step_fn, the iteration index arrives via the fori_loop bounds).
    Call OUTSIDE jit.  The jitted pieces live on the returned callable, so
    repeated calls (a clip loop) compile at most three graphs per shape
    (init, full segment, remainder segment)."""
    if dispatch_chunk < 1:
        raise ValueError(f"dispatch_chunk must be >= 1, got {dispatch_chunk}")
    init_fn, step_fn, finalize_fn = _refiner_pieces(smpl, cfg)

    from functools import partial

    # donate the carry: it is dead after each segment (the host loop
    # rebinds immediately), letting XLA update the params/opt_state/trace
    # buffers in place instead of reallocating every bounded dispatch
    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def run_segment(carry, start, length):
        return jax.lax.fori_loop(start, start + length, step_fn, carry)

    init_j = jax.jit(init_fn)
    finalize_j = jax.jit(finalize_fn)

    def refine(*, body_pose, hand_pose, body_trans, betas, obj_angles,
               obj_trans, obj_points) -> Dict[str, jax.Array]:
        carry = init_j(body_pose, hand_pose, body_trans, betas,
                       obj_angles, obj_trans, obj_points)
        s = 0
        while s < cfg.iters:
            length = min(dispatch_chunk, cfg.iters - s)
            carry = run_segment(carry, jnp.asarray(s, jnp.int32), length)
            jax.block_until_ready(carry)
            s += length
        return finalize_j(carry)

    return refine


def optimize_clip_chunked(
    smpl: SmplModel,
    *,
    cfg: OptimConfig = OptimConfig(),
    dispatch_chunk: int = 100,
    **clip_arrays,
) -> Dict[str, jax.Array]:
    """One-shot convenience over `make_chunked_refiner` (re-jits per call —
    build the refiner once for clip loops)."""
    return make_chunked_refiner(smpl, cfg, dispatch_chunk)(**clip_arrays)


def make_chunked_refiner_batch(smpl: SmplModel, cfg: OptimConfig,
                               dispatch_chunk: int = 100):
    """Batched `make_chunked_refiner`: every array gains a leading clip
    axis, clips run sequentially inside each dispatch via `lax.map` (NOT
    vmap — one compile, and no batching rewrite of the HIGHEST-precision
    rotation matmuls, whose vmap form trips an XLA:CPU verifier bug), and
    the iteration axis is split into bounded dispatches.

    This is the variant the sample→refine pipeline needs: its refine is
    one dispatch of B lax.map'd clips x iters, so the execution length
    scales with BOTH factors (8 x 350 crashed the axon worker; see
    `make_chunked_refiner`)."""
    if dispatch_chunk < 1:
        raise ValueError(f"dispatch_chunk must be >= 1, got {dispatch_chunk}")
    init_fn, step_fn, finalize_fn = _refiner_pieces(smpl, cfg)

    from functools import partial

    init_j = jax.jit(lambda arrs: jax.lax.map(lambda a: init_fn(*a), arrs))

    @partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
    def run_segment(carry, start, length):
        return jax.lax.map(
            lambda c: jax.lax.fori_loop(start, start + length, step_fn, c),
            carry)

    finalize_j = jax.jit(lambda carry: jax.lax.map(finalize_fn, carry))

    def refine(body_pose, hand_pose, body_trans, betas, obj_angles,
               obj_trans, obj_points) -> Dict[str, jax.Array]:
        carry = init_j((body_pose, hand_pose, body_trans, betas,
                        obj_angles, obj_trans, obj_points))
        s = 0
        while s < cfg.iters:
            length = min(dispatch_chunk, cfg.iters - s)
            carry = run_segment(carry, jnp.asarray(s, jnp.int32), length)
            jax.block_until_ready(carry)
            s += length
        return finalize_j(carry)

    return refine
