"""Train steps (optax AdamW) + data-parallel sharding over a device mesh.

Replaces the reference's PyTorch-Lightning single-GPU loops
(`interdiff/train_diffusion_{smpl,skeleton}.py`, `train_correction_*.py`):
one jitted step function per track, parameters replicated, batch sharded
over the mesh's ``data`` axis — gradients are reduced by XLA's automatic
collectives (the pjit equivalent of DDP allreduce; the reference has no
distributed path at all, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion
from interdiff_tpu.models.mdm_skeleton import MDMSkeleton
from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw
from interdiff_tpu.train.losses import (
    SkeletonLossWeights,
    SmplLossWeights,
    skeleton_diffusion_losses,
    smpl_diffusion_losses,
)


@struct.dataclass
class TrainState:
    """Minimal train state (params + optax [+ schedule-sampler state]
    [+ EMA shadow params])."""

    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # LossSecondMomentState when the loss-aware schedule sampler is active
    # (`diffusion/resample.py`), None under the uniform default
    sampler_state: Any = None
    # EMA shadow of ``params`` when ``ema_rate > 0`` — the reference ships
    # `update_ema` (`diffusion/nn.py:56` upstream) but never calls it from
    # any trainer; here it is wired as functional state updated inside the
    # jitted step (replicated under `data_parallel_step`, so every host
    # sees the same shadow)
    ema_params: Any = None
    ema_rate: float = struct.field(pytree_node=False, default=0.0)
    # non-trainable model collections (encoder BN ``batch_stats``) when the
    # step runs with ``bn_train_mode=True`` — updated by batch statistics
    # inside the step, NEVER seen by the optimizer.  None in the default
    # mode (where batch_stats, if any, ride inside ``params`` frozen-ish).
    model_state: Any = None

    @classmethod
    def create(cls, params, tx, *, sampler_state=None, ema_rate: float = 0.0,
               model_state=None):
        # the shadow must be a distinct buffer — aliasing `params` would make
        # donation under `data_parallel_step` donate the same buffer twice
        ema = (jax.tree.map(jnp.copy, params) if ema_rate > 0.0 else None)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx,
                   sampler_state=sampler_state,
                   ema_params=ema, ema_rate=ema_rate,
                   model_state=model_state)

    def apply_gradients(self, grads):
        from interdiff_tpu.diffusion.nn import update_ema

        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:  # structural (trace-time) switch
            new_ema = update_ema(new_ema, new_params, rate=self.ema_rate)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=new_ema)


def adamw(lr: float = 3e-4, weight_decay: float = 0.0
          ) -> optax.GradientTransformation:
    """AdamW with the reference defaults (`train_diffusion_smpl.py:177-183`,
    lr 3e-4, l2_norm 0)."""
    return optax.adamw(lr, weight_decay=weight_decay)


def sample_timesteps(key: jax.Array, batch: int, num_timesteps: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """UniformSampler (`diffusion/resample.py:42-55`): t ~ U, weights = 1."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


# ---------------------------------------------------------------------------
# skeleton track
# ---------------------------------------------------------------------------

def skeleton_gt_from_batch(batch: Dict[str, jax.Array]) -> jax.Array:
    """Batch dict -> state tensor [B, T, 106]."""
    B, T = batch["skeleton"].shape[:2]
    return jnp.concatenate([
        batch["skeleton"].reshape(B, T, -1),
        batch["obj_points"].reshape(B, T, -1),
        batch["poses"],
    ], axis=-1)


def make_skeleton_train_step(
    model: MDMSkeleton, diffusion: GaussianDiffusion, *,
    weights: SkeletonLossWeights = SkeletonLossWeights(),
) -> Callable:
    """Returns ``step(state, batch, key) -> (state, metrics)``; jit/pjit it
    with the batch sharded on axis 0."""

    def loss_fn(params, batch, key):
        k_t, k_noise = jax.random.split(key)
        gt = skeleton_gt_from_batch(batch)
        zero_pose = batch["zero_pose_obj"]
        memory = model.apply(
            params, batch["skeleton"], batch["obj_points"], batch["poses"],
            zero_pose, method=MDMSkeleton.encode, deterministic=True)[0]
        t, _ = sample_timesteps(k_t, gt.shape[0], diffusion.num_timesteps)
        noise = jax.random.normal(k_noise, gt.shape, gt.dtype)

        def model_fn(x, ts):
            return model.apply(params, x, ts, zero_pose, memory)

        pred, target = diffusion.training_losses(model_fn, gt, t, noise=noise)
        loss, terms = skeleton_diffusion_losses(
            pred, target, past_len=model.past_len,
            num_joints=model.num_joints, num_points=model.num_points,
            weights=weights)
        metrics = {k: v for k, v in terms.items()}
        metrics["loss"] = loss
        return loss, metrics

    def step(state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        return state.apply_gradients(grads), metrics

    return step


# ---------------------------------------------------------------------------
# SMPL track
# ---------------------------------------------------------------------------

def smpl_cond_inputs(batch: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """Batch dict -> (gt state [B,T,144], obj_points [B,P,6])."""
    gt = smpl_gt_from_raw(batch["body_pose"][..., :66], batch["body_trans"],
                          batch["obj_angles"], batch["obj_trans"])
    return gt, batch["obj_points"]


def split_bn_state(variables):
    """Full init variables -> (trainable ``{"params": ...}``, model_state
    with every other collection — encoder BN ``batch_stats``).  Use with
    ``make_smpl_train_step(bn_train_mode=True)`` + ``TrainState.create(
    trainable, tx, model_state=ms)``."""
    ms = {k: v for k, v in variables.items() if k != "params"}
    return {"params": variables["params"]}, ms


def merge_bn_state(params, model_state):
    """Recombine the split state into apply-able variables (validation,
    sampling, checkpoint save)."""
    return {**params, **(model_state or {})}


def make_smpl_train_step(
    model: MDMSmpl, diffusion: GaussianDiffusion, *,
    weights: SmplLossWeights = SmplLossWeights(),
    schedule_sampler: str = "uniform",
    bn_train_mode: bool = False,
) -> Callable:
    """Returns ``step(state, batch, key) -> (state, metrics)``.

    ``schedule_sampler``: ``"uniform"`` (the reference trainers hardcode
    this, `train_diffusion_smpl.py:43-44`), ``"loss-second-moment"``, or a
    ``LossSecondMomentResampler`` instance (to control history size) — the
    importance sampler the reference ships but never wires up
    (`diffusion/resample.py:57-104`, update branch at
    `train_diffusion_skeleton.py:163-164`).  The loss-aware variant needs
    ``TrainState.sampler_state`` initialised with the SAME resampler's
    ``init_state()`` (the history buffer width bakes into the state); its
    history update happens inside the jitted step, so under
    ``data_parallel_step`` the (replicated) state update sees the full
    global batch."""
    from interdiff_tpu.diffusion.resample import LossSecondMomentResampler

    resampler = None
    if isinstance(schedule_sampler, LossSecondMomentResampler):
        resampler = schedule_sampler
    elif schedule_sampler == "loss-second-moment":
        resampler = LossSecondMomentResampler(diffusion.num_timesteps)
    elif schedule_sampler != "uniform":
        raise ValueError(f"unknown schedule sampler: {schedule_sampler}")

    def loss_fn(params, batch, key, sampler_state, model_state):
        k_t, k_noise = jax.random.split(key)
        gt, obj_points = smpl_cond_inputs(batch)
        if bn_train_mode:
            # reference BN semantics (`interdiff/model/layers.py:118-139`
            # via pointnet2_ops build_shared_mlp under Lightning training):
            # batch statistics normalise, running stats update by momentum
            # and stay OUT of the optimizer.  Under `data_parallel_step`
            # the batch means are global (jit + sharding — XLA inserts the
            # cross-device reductions), matching single-device bitwise up
            # to reduction order.
            memory, new_ms = model.apply(
                merge_bn_state(params, model_state), gt, obj_points,
                method=MDMSmpl.encode, train_encoder=True,
                mutable=["batch_stats"])
        else:
            memory, new_ms = model.apply(params, gt, obj_points,
                                         method=MDMSmpl.encode), None
        if resampler is None:
            t, sampler_w = sample_timesteps(k_t, gt.shape[0],
                                            diffusion.num_timesteps)
        else:
            t, sampler_w = resampler.sample(k_t, gt.shape[0], sampler_state)
        noise = jax.random.normal(k_noise, gt.shape, gt.dtype)

        def model_fn(x, ts):
            return model.apply(params, x, ts, memory)

        pred, target = diffusion.training_losses(model_fn, gt, t, noise=noise)
        per_sample, terms = smpl_diffusion_losses(
            pred, target, past_len=model.past_len, smpl_dim=model.smpl_dim,
            weights=weights)
        loss = jnp.mean(per_sample * sampler_w)
        metrics = {k: jnp.mean(v) for k, v in terms.items()}
        metrics["loss"] = loss
        # per-timestep-quartile diagnostics (`train_diffusion_smpl.py:168-175`)
        quartile = (4 * t) // diffusion.num_timesteps
        for q in range(4):
            mask = (quartile == q).astype(jnp.float32)
            metrics[f"loss_q{q}"] = (jnp.sum(per_sample * mask)
                                     / jnp.maximum(jnp.sum(mask), 1.0))
        return loss, (metrics, t, per_sample, new_ms)

    def step(state: TrainState, batch, key):
        if resampler is not None and state.sampler_state is None:
            # caught at trace time with a clear message instead of an
            # AttributeError deep inside the traced loss_fn
            raise ValueError(
                "schedule_sampler is loss-aware but TrainState.sampler_state "
                "is None — create the state with TrainState.create(params, "
                "tx, sampler_state=resampler.init_state()) using the SAME "
                "resampler (the history width bakes into the state)")
        if bn_train_mode and state.model_state is None:
            raise ValueError(
                "bn_train_mode=True needs TrainState.model_state — split "
                "the init variables with trainer.split_bn_state and pass "
                "model_state= to TrainState.create")
        (_, (metrics, t, per_sample, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key,
                                   state.sampler_state, state.model_state)
        new_state = state.apply_gradients(grads)
        if bn_train_mode:
            new_state = new_state.replace(model_state=new_ms)
        if resampler is not None:
            # the reference's update_with_local_losses
            # (`train_diffusion_skeleton.py:163-164`)
            new_state = new_state.replace(sampler_state=resampler.update(
                state.sampler_state, t, jax.lax.stop_gradient(per_sample)))
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# correction networks (BatchNorm -> mutable batch_stats in the state)
# ---------------------------------------------------------------------------


@struct.dataclass
class CorrectionTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]), tx=tx)

    def apply_gradients(self, grads, new_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=new_stats, opt_state=new_opt)


def make_correction_smpl_train_step(projector, *, weights=None,
                                    nn_chunk: Optional[int] = 512,
                                    initialize: bool = False) -> Callable:
    """`train_correction_smpl.py:187-189,263` — contact/penetration + 8
    pose-MSE losses.  ``initialize`` is the epoch<10 mean-marker mode — a
    *static* compile-time switch (build one step per phase and swap at
    epoch 10).  ``step(state, batch, key, epoch) -> (state, metrics)``;
    ``batch`` needs obj_angles/obj_trans (axis-angle), markers [B,T,67,7]
    (xyz|normal|contact), human_verts [B,T,V,7], obj_points [B,P,>=3]."""
    from interdiff_tpu.geometry.rotations import (
        axis_angle_to_matrix as _aa2m,
        matrix_to_rotation_6d as _m2r6,
    )
    from interdiff_tpu.models.correction import ObjProjectorSmpl
    from interdiff_tpu.train.losses_correction import (
        CorrectionLossWeights,
        correction_smpl_losses,
    )

    weights = weights or CorrectionLossWeights()

    def loss_fn(params, batch_stats, batch, key, epoch):
        markers = batch["markers"]
        contact = markers[:, projector.past_len :, :, 6].sum(axis=1)  # [B,P]
        rot6d = _m2r6(_aa2m(batch["obj_angles"]))
        obj_gt = jnp.concatenate([rot6d, batch["obj_trans"]], axis=-1)
        (obj_pred), new_model_state = projector.apply(
            {"params": params, "batch_stats": batch_stats},
            obj_gt, markers[..., :3], contact,
            initialize=initialize, train=True, select_key=key,
            mutable=["batch_stats"], method=ObjProjectorSmpl.sample)
        loss, terms = correction_smpl_losses(
            obj_pred, obj_gt, past_len=projector.past_len,
            obj_points=batch["obj_points"], human_verts=batch["human_verts"],
            epoch=epoch, weights=weights, nn_chunk=nn_chunk)
        terms["loss"] = loss
        return loss, (terms, new_model_state["batch_stats"])

    def step(state: CorrectionTrainState, batch, key, epoch):
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key, epoch)
        return state.apply_gradients(grads, new_stats), metrics

    return step


def make_correction_skeleton_train_step(projector, *, weights=None
                                        ) -> Callable:
    """`train_correction_skeleton.py:128-160`: quaternion-space 8-term loss.
    ``step(state, batch, key, epoch) -> (state, metrics)``; batch needs
    skeleton [B,T,21,3] and poses [B,T,7] (trans | quat xyzw)."""
    from interdiff_tpu.models.correction import ObjProjectorSkeleton
    from interdiff_tpu.train.losses_correction import (
        CorrectionLossWeights,
        correction_skeleton_losses,
    )

    weights = weights or CorrectionLossWeights()

    def loss_fn(params, batch_stats, batch):
        poses = batch["poses"]
        quat_gt, trans_gt = poses[..., 3:7], poses[..., :3]
        (quat_p, trans_p), new_model_state = projector.apply(
            {"params": params, "batch_stats": batch_stats},
            quat_gt, trans_gt, batch["skeleton"], train=True,
            mutable=["batch_stats"], method=ObjProjectorSkeleton.sample)
        # layout [quat | trans] so [..., :-3]/[..., -3:] split like the ref
        obj_pred = jnp.concatenate([quat_p, trans_p], axis=-1)
        obj_gt = jnp.concatenate([quat_gt, trans_gt], axis=-1)
        loss, terms = correction_skeleton_losses(
            obj_pred, obj_gt, past_len=projector.past_len, weights=weights)
        terms["loss"] = loss
        return loss, (terms, new_model_state["batch_stats"])

    def step(state: CorrectionTrainState, batch, key, epoch):
        del key, epoch
        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, new_stats), metrics

    return step


# ---------------------------------------------------------------------------
# data-parallel wiring
# ---------------------------------------------------------------------------

def chain_steps(step_fn: Callable) -> Callable:
    """Wrap ``step(state, batch, key, *extras) -> (state, metrics)`` into
    ``step_many(state, stacked_batch, key, *extras)`` that runs one
    optimizer step per leading-axis slice of ``stacked_batch`` inside ONE
    ``lax.scan`` — K steps per dispatch.

    Why: on TPU each dispatch pays a fixed host/launch cost that the
    per-step compute does not amortise at this model size (v5e, B=32:
    slope-timed step 14.6 ms vs 21.5 ms per dispatched call over the axon
    tunnel).  Chaining K microbatches into one XLA execution hides all but
    the first of those costs — the standard production pattern for small
    step graphs.  Semantics are exactly K sequential ``step_fn`` calls with
    keys ``jax.random.split(key, K)`` (pinned by
    ``tests/test_train_eval_e2e.py::test_chain_steps_matches_sequential``);
    metrics come back stacked ``[K, ...]``.

    Compose with :func:`data_parallel_step` by passing
    ``batch_spec=PartitionSpec(None, data_axis)`` — the microbatch axis is
    leading, the data-parallel axis is second.  Keep K modest: one
    execution must stay well under the axon per-dispatch watchdog
    (CLAUDE.md), and per-step metrics/checkpoint hooks only see every K-th
    state on the host."""

    def step_many(state, stacked_batch, key, *extras):
        k = jax.tree.leaves(stacked_batch)[0].shape[0]
        keys = jax.random.split(key, k)

        def body(st, inp):
            b, kk = inp
            return step_fn(st, b, kk, *extras)

        return jax.lax.scan(body, state, (stacked_batch, keys))

    return step_many


def data_parallel_step(step_fn: Callable, mesh: jax.sharding.Mesh,
                       *, data_axis: str = "data",
                       extra_args: int = 1,
                       batch_spec=None) -> Callable:
    """jit a train step ``(state, batch, *extras) -> (state, metrics)`` with
    params replicated and batch sharded over ``data_axis``; XLA inserts the
    gradient psum over ICI.  ``extra_args`` counts the replicated trailing
    args (PRNG key, epoch, ...).  ``batch_spec`` overrides the batch
    PartitionSpec (default: shard the leading axis) — a
    :func:`chain_steps`-wrapped step wants ``PartitionSpec(None, data_axis)``
    so the microbatch axis stays whole."""
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    if batch_spec is None:
        batch_spec = jax.sharding.PartitionSpec(data_axis)
    sharded = jax.sharding.NamedSharding(mesh, batch_spec)

    def place_batch(batch):
        return jax.tree.map(lambda x: jax.device_put(x, sharded), batch)

    jitted = jax.jit(
        step_fn,
        in_shardings=(replicated, sharded) + (replicated,) * extra_args,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )
    jitted.place_batch = place_batch  # convenience for callers
    return jitted
