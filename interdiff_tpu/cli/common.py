"""Shared CLI plumbing: device mesh, seeding, synthetic-data fallbacks.

The reference duplicates ~40 argparse flags across 9 scripts (SURVEY.md §5);
here each script builds a typed config from a few flags and shares this
module.  `--synthetic N` runs any script without the (unshipped) BEHAVE /
HO-GCN data — random clips with the right shapes — so the full train/eval
paths can be smoke-tested end-to-end on any machine.
"""

from __future__ import annotations

import os
import pathlib
from typing import Dict, Iterator, Optional

import numpy as np


def make_mesh(data_axis: str = "data", *, batch_size: "int | None" = None):
    """1-D data mesh over the local devices.

    ``batch_size``: when given, only the largest device count that divides
    it is used — a global batch must shard evenly over the ``data`` axis,
    and a small staged corpus (fit_batch_size) or an odd --batch_size would
    otherwise crash at device_put with a divisibility error."""
    import jax

    devices = np.asarray(jax.devices())
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        if n < len(devices):
            print(f"batch {batch_size} not divisible by {len(devices)} "
                  f"devices; data mesh uses {n}")
        devices = devices[:n]
    return jax.sharding.Mesh(devices, (data_axis,))


def seed_everything(seed: int = 233) -> np.random.Generator:
    """Seed numpy and enable the persistent XLA compilation cache.

    Every CLI goes through here; over the axon TPU tunnel a cold compile of
    the sampling/training graphs takes 10-30 min, and the on-disk cache
    (INTERDIFF_COMPILE_CACHE, default /tmp/jax_cache) turns relaunches into
    seconds."""
    import jax

    cache = os.environ.get("INTERDIFF_COMPILE_CACHE", "/tmp/jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def synthetic_smpl_batches(rng: np.random.Generator, *, batch_size: int,
                           seq_len: int, num_points: int = 512,
                           num_verts: int = 64, steps: int = 4
                           ) -> Iterator[Dict[str, np.ndarray]]:
    """Random BEHAVE-shaped batches (collate() layout, behave.py)."""
    B, T = batch_size, seq_len
    for _ in range(steps):
        yield {
            "body_pose": rng.standard_normal((B, T, 156)).astype(np.float32) * 0.2,
            "body_betas": rng.standard_normal((B, T, 10)).astype(np.float32),
            "body_trans": rng.standard_normal((B, T, 3)).astype(np.float32),
            "obj_angles": rng.standard_normal((B, T, 3)).astype(np.float32),
            "obj_trans": rng.standard_normal((B, T, 3)).astype(np.float32),
            "markers": rng.standard_normal((B, T, 67, 7)).astype(np.float32),
            "human_verts": rng.standard_normal(
                (B, T, num_verts, 7)).astype(np.float32),
            "obj_points": rng.standard_normal(
                (B, num_points, 6)).astype(np.float32),
            "obj_points_frames": rng.standard_normal(
                (B, T, num_points, 7)).astype(np.float32),
            "ground_joint_label": np.zeros((B, T, 2), np.float32),
            "gender": np.zeros((B,), np.int32),
        }


def synthetic_skeleton_batches(rng: np.random.Generator, *, batch_size: int,
                               seq_len: int, steps: int = 4
                               ) -> Iterator[Dict[str, np.ndarray]]:
    """Random HO-GCN-shaped batches (collate_skeleton layout)."""
    B, T = batch_size, seq_len
    for _ in range(steps):
        quat = rng.standard_normal((B, T, 4)).astype(np.float32)
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        poses = np.concatenate(
            [rng.standard_normal((B, T, 3)).astype(np.float32), quat], axis=-1)
        yield {
            "skeleton": rng.standard_normal((B, T, 21, 3)).astype(np.float32),
            "obj_points": rng.standard_normal((B, T, 12, 3)).astype(np.float32),
            "poses": poses,
            "zero_pose_obj": rng.standard_normal((B, 12, 3)).astype(np.float32),
        }


def batch_iterator(dataset, collate_fn, *, batch_size: int,
                   rng: np.random.Generator, shuffle: bool = True,
                   drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Host-side minibatch loader (replaces torch DataLoader)."""
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for s in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                   batch_size):
        idx = order[s : s + batch_size]
        if len(idx) < batch_size and drop_last:
            break
        yield collate_fn([dataset[int(i)] for i in idx])


def snapshot_sources(results_dir: str, modules: "list[str]") -> None:
    """Copy the given source modules into the run dir — the reference's
    `on_train_start` source snapshotting (`train_diffusion_smpl.py:46-52`)."""
    import importlib
    import shutil

    dst = pathlib.Path(results_dir) / "src_snapshot"
    dst.mkdir(parents=True, exist_ok=True)
    for name in modules:
        try:
            mod = importlib.import_module(name)
            shutil.copy(mod.__file__, dst / pathlib.Path(mod.__file__).name)
        except Exception:
            pass


def synthetic_smpl_body(rng: np.random.Generator, *, num_verts: int = 128,
                        num_joints: int = 52):
    """SMPL-H-shaped synthetic body model (real pkls are not shipped):
    same array shapes and kinematic-tree depth.

    The template is a CLOSED watertight surface (Fibonacci-sphere ellipsoid
    triangulated by its convex hull, 2V-4 faces — V=6890 gives exactly the
    real SMPL-H's 13776) with spatially smooth skinning
    weights (softmax over per-joint surface anchors), so that skinned
    vertices stay a coherent surface and signed-distance/penetration
    numbers behave like they do on a real body instead of an open sheet.
    """
    from scipy.spatial import ConvexHull

    from interdiff_tpu.smpl.model import SmplModel

    V, J = num_verts, num_joints
    parents = np.zeros(J, dtype=np.int64)
    for j in range(1, J):
        parents[j] = (j - 1) // 2

    # Fibonacci sphere -> human-proportioned ellipsoid with smooth bumps
    i = np.arange(V, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    y = 1.0 - 2.0 * (i + 0.5) / V
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    unit = np.stack([r * np.cos(phi), y, r * np.sin(phi)], axis=1)
    hull = ConvexHull(unit)
    faces = hull.simplices.astype(np.int32)
    # orient every triangle outward (hull simplices are unordered)
    tri = unit[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.einsum("fi,fi->f", n, tri.mean(axis=1)) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    bump = 1.0 + 0.08 * np.sin(3.0 * phi + rng.random() * 6.28) \
        * np.cos(2.0 * np.arccos(np.clip(y, -1, 1)))
    v_template = (unit * bump[:, None]
                  * np.array([0.25, 0.85, 0.15])).astype(np.float64)

    # smooth weights: joints anchored on the surface, soft nearest-anchor
    anchors = v_template[rng.choice(V, size=J, replace=V < J)]
    d2 = ((v_template[:, None] - anchors[None]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.02)
    w /= w.sum(1, keepdims=True)
    jr = np.exp(-d2.T / 0.005)
    jr /= jr.sum(1, keepdims=True)

    return SmplModel.create(
        v_template=v_template,
        shapedirs=rng.standard_normal((V, 3, 10)) * 0.01,
        posedirs=rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        j_regressor=jr, weights=w, parents=parents, faces=faces)


def load_smpl_models(args) -> Dict[str, object]:
    """SMPL models for the real-data CLIs: the SMPLH pkls from
    ``--model_path``, or (``--synthetic_body``) the closed stand-in body for
    the unshipped pkls — one shared definition for all five SMPL CLIs."""
    if getattr(args, "synthetic_body", False):
        body = synthetic_smpl_body(np.random.default_rng(0), num_verts=6890)
        return {"male": body, "female": body}
    import os as _os

    from interdiff_tpu.smpl.loader import smpl_model_from_pkl

    return {
        g: smpl_model_from_pkl(_os.path.join(args.model_path,
                                             f"SMPLH_{g}.pkl"))
        for g in ("male", "female")
    }


def find_object_mesh(motion_path: str, obj_name: str) -> Optional[str]:
    """Locate the simplified object mesh for a sequence's category.

    The reference renders the SIMPLIFIED_MESH ply of the object
    (`eval_smpl_short.py:317-327`, map at `data/utils.py:18-62`:
    ``<objects root>/<cat>/<cat>_f1000.ply``); our staging script lays the
    objects tree next to the sequence dir (scripts/stage_behave_sample.py).
    Returns None when the mesh is not on disk (point-sphere rendering then).
    """
    base = os.path.dirname(os.path.abspath(motion_path).rstrip("/"))
    cand = os.path.join(base, "objects", obj_name, f"{obj_name}_f1000.ply")
    return cand if os.path.isfile(cand) else None


def load_object_mesh(path: str):
    """-> (vertices [Vm,3] f32 in the object's canonical frame — the same
    frame as the sampled `obj_points` template — and faces [F,3] i32)."""
    from interdiff_tpu.data.mesh_io import load_mesh

    mesh = load_mesh(path)
    return (np.asarray(mesh.vertices, np.float32),
            np.asarray(mesh.faces, np.int32))


def load_eval_sequences(motion_path: str, smpl_models, mode: str = "test"):
    """Load the eval split with a train-split fallback for partial corpora
    (e.g. the shipped sample sequence has no Date03* test sequences)."""
    from interdiff_tpu.data.behave import load_behave_sequences

    seqs = load_behave_sequences(motion_path, smpl_models=smpl_models,
                                 mode=mode)
    if not seqs and mode == "test":
        print("no Date03* test sequences under", motion_path,
              "- falling back to the train split")
        seqs = load_behave_sequences(motion_path, smpl_models=smpl_models,
                                     mode="train")
    return seqs


def maybe_reference_mdm(path: Optional[str], track: str):
    """Reference Lightning ``.ckpt`` FILE -> (parity-mode MDM module,
    converted flax variables, embedded hyper_parameters dict); None for
    orbax directories / no checkpoint.

    This is the `--diffusion_ckpt` bridge for checkpoints trained by the
    reference (`interdiff/README.md` distributes `diffusion.ckpt` /
    `diffusion_skeleton.ckpt`): the module is constructed from the embedded
    hyper_parameters and, for pointnet2-trained SMPL checkpoints, pinned to
    exact-FPS parity mode (see `utils/checkpoint.mdm_smpl_from_checkpoint`).
    """
    if not path or not os.path.isfile(path):
        return None
    from interdiff_tpu.utils.checkpoint import (
        mdm_skeleton_from_checkpoint,
        mdm_smpl_from_checkpoint,
    )

    loader = (mdm_smpl_from_checkpoint if track == "smpl"
              else mdm_skeleton_from_checkpoint)
    return loader(path)


def load_mdm(diffusion_ckpt: Optional[str], track: str, model,
             init_fn, *, past_len: int, future_len: int):
    """One load-or-init path for every eval CLI's ``--diffusion_ckpt``:
    reference Lightning ``.ckpt`` file (parity-mode module from the embedded
    hyper_parameters), orbax directory (restored into the CLI-built model),
    or no checkpoint (``init_fn()`` fresh params).  Returns (model, params).

    A reference ``.ckpt`` REPLACES the CLI-built module, so its embedded
    window sizes are validated against the CLI's --past_len/--future_len —
    the surrounding pipeline (dataset windows, inpaint masks, eval config)
    is built from the flags, and a silent mismatch would run to completion
    with inconsistent conditioning and meaningless metrics."""
    ref = maybe_reference_mdm(diffusion_ckpt, track)
    if ref is None:
        params = init_fn()
        if diffusion_ckpt:
            params = restore_params(diffusion_ckpt, params)
        return model, params
    model, params, hp = ref
    # validate against the checkpoint's embedded hyper_parameters:
    # MDMSkeleton carries no future_len attribute, so a module-attr check
    # would silently pass for the skeleton track (ADVICE r3)
    ckpt_future = int(hp.get("future_len",
                             getattr(model, "future_len", future_len)))
    if model.past_len != past_len or ckpt_future != future_len:
        raise ValueError(
            f"--diffusion_ckpt {diffusion_ckpt} embeds past_len="
            f"{model.past_len}, future_len={ckpt_future}, but the CLI runs "
            f"with --past_len {past_len} --future_len {future_len}; pass "
            "matching window flags (dataset windows and inpaint masks are "
            "built from them)")
    return model, params


def load_correction_variables(path: str, kind: str = "smpl"):
    """Load correction-net variables ``{'params', 'batch_stats'}`` from
    either the reference torch Lightning ``.ckpt`` file or an orbax
    directory written by our correction trainers (CheckpointManager layout
    or a flat StandardCheckpointer save such as
    ``artifacts/correction_real_params``)."""
    if os.path.isdir(path):
        return restore_params(path, None)
    from interdiff_tpu.utils.checkpoint import (
        load_correction_skeleton,
        load_correction_smpl,
    )

    loader = load_correction_smpl if kind == "smpl" else \
        load_correction_skeleton
    variables, _ = loader(path)
    return variables


def restore_params(ckpt_dir: str, template=None):
    """Restore a params pytree from either a CheckpointManager directory
    (training CLIs) or a flat StandardCheckpointer save (demo scripts).
    ``template=None`` restores the raw saved tree without shape checking."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    mgr = ocp.CheckpointManager(path)
    if mgr.latest_step() is not None:
        # an explicit StandardRestore() (even with no target) makes orbax
        # reconstruct the saved item's full tree from checkpoint metadata;
        # a bare mgr.restore(step) silently drops the "default" item
        args = ocp.args.StandardRestore(template) if template is not None \
            else ocp.args.StandardRestore()
        return mgr.restore(mgr.latest_step(), args=args)
    if template is None:
        return ocp.StandardCheckpointer().restore(path)
    return ocp.StandardCheckpointer().restore(path, target=template)


def fit_batch_size(num_clips: int, batch_size: int) -> int:
    """Shrink the batch to the corpus so drop_last batching cannot silently
    yield zero batches on a small staged corpus."""
    if 0 < num_clips < batch_size:
        print(f"only {num_clips} clip windows; shrinking batch "
              f"{batch_size} -> {num_clips}")
        return num_clips
    return batch_size


def add_profiler_args(parser) -> None:
    """`--profiler` / `--debug_nan` on every trainer, mirroring the
    reference's Simple/AdvancedProfiler flag (`train_diffusion_smpl.py:585,
    641`) and its always-on `set_detect_anomaly` (`:608`, gated here)."""
    parser.add_argument("--profiler", default=None,
                        choices=["simple", "trace"],
                        help="'simple' = per-section wall-clock summary; "
                             "'trace' = jax.profiler trace into "
                             "<results_dir>/trace")
    parser.add_argument("--debug_nan", action="store_true",
                        help="enable the jax NaN sanitizer (the reference "
                             "runs torch detect_anomaly unconditionally; "
                             "here it is opt-in)")


class TrainProfiler:
    """Owns the profiling state for one trainer run: a StepTimer for
    `--profiler simple`, a jax.profiler trace for `--profiler trace`."""

    def __init__(self, args, results_dir: str):
        from interdiff_tpu.utils.profiling import (
            StepTimer,
            enable_anomaly_detection,
        )

        if getattr(args, "debug_nan", False):
            enable_anomaly_detection(True)
        self.mode = getattr(args, "profiler", None)
        self.timer = StepTimer()
        self._trace_dir = os.path.join(results_dir, "trace")
        self._tracing = False
        if self.mode == "trace":
            import jax

            os.makedirs(self._trace_dir, exist_ok=True)
            jax.profiler.start_trace(self._trace_dir)
            self._tracing = True

    def section(self, name: str):
        if self.mode == "simple":
            return self.timer(name)
        import contextlib

        return contextlib.nullcontext()

    def finish(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            print("profiler trace written to", self._trace_dir)
        if self.mode == "simple":
            print(self.timer.summary())
