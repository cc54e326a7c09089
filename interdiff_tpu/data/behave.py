"""BEHAVE (SMPL-track) dataset pipeline.

Behavioural contract: `interdiff/data/dataset_smpl.py` — per-sequence npz
loading, SMPL-H forward at load time to cache vertices/joints, clip indexing
with jitter bias, and per-clip canonicalization (pelvis of frame 0 to the
origin, yaw-alignment of the global orient).

TPU-native redesign: instead of the reference's list-of-frame-dicts batches
(torch collate of nested dicts), a clip is a flat dict of dense numpy arrays
[T, ...] and a batch stacks them to [B, T, ...] — one host->device transfer
of a few contiguous arrays.  All canonicalization math is float32 numpy on
host, matching the reference's scipy path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from interdiff_tpu.data.constants import MARKERSET_SSM67_SMPLH
from interdiff_tpu.geometry.rotations_np import (
    rotvec_compose_np,
    rotvec_to_matrix_np,
)


def yaw_canonical_rotation(global_orient_rotvec: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """The frame-0 yaw alignment of `dataset_smpl.py:119-125`.

    Returns ``(rotation, rotation_v)`` where ``rotation = rotation_v^-1`` is
    applied (as ``x @ rotation.T``) to every world-space quantity.  The yaw
    angle comes from the x/z components of the first **column** of the
    global-orient rotation matrix.
    """
    R0 = rotvec_to_matrix_np(global_orient_rotvec.astype(np.float64))
    denom = np.sqrt(R0[0, 0] ** 2 + R0[2, 0] ** 2)
    cos, sin = R0[0, 0] / denom, R0[2, 0] / denom
    rotation_v = np.eye(3, dtype=np.float32)
    rotation_v[0, 0] = cos
    rotation_v[2, 2] = cos
    rotation_v[0, 2] = -sin
    rotation_v[2, 0] = sin
    rotation = np.linalg.inv(rotation_v).astype(np.float32)
    return rotation, rotation_v


def canonicalize_clip(
    *,
    poses: np.ndarray,  # [T, D_pose] axis-angle SMPL params
    betas: np.ndarray,  # [T, 10]
    trans: np.ndarray,  # [T, 3]
    pelvis: np.ndarray,  # [T, 3]
    obj_angles: np.ndarray,  # [T, 3]
    obj_trans: np.ndarray,  # [T, 3]
    human_verts: Optional[np.ndarray],  # [T, V, 6] xyz + normals (world)
    obj_points: np.ndarray,  # [P, 6] template xyz + normals
    obj_contact_idx: Sequence[np.ndarray],  # per-frame contact point indices
    human_contact_idx: Sequence[np.ndarray],  # per-frame contact vert indices
    left_foot: np.ndarray,  # [T_raw, 3] in RAW sequence order
    right_foot: np.ndarray,
    frame_indices: np.ndarray,  # [T] raw indices of the clip frames
    ground_joint_label_first: int,  # raw label (10/11) for frame 0 fallback
    heavy: bool = True,
) -> Dict[str, np.ndarray]:
    """Canonicalize one clip exactly like `dataset_smpl.py:106-189`.

    Returns a dict of dense float32 arrays (T = clip length, V = num verts,
    P = num object points):
      body_pose [T,D], body_betas [T,10], body_trans [T,3], pelvis [T,3],
      obj_angles [T,3], obj_trans [T,3], human_verts [T,V,7],
      markers [T,67,7], obj_points_frames [T,P,7], ground_joint_label [T,2],
      plus 'rotation'/'rotation_v'/'centroid'.

    ``heavy=False`` skips the per-vertex/per-point products (human_verts,
    markers, obj_points_frames) — diffusion training consumes only the pose
    streams, and on a one-core host building ~9 MB of unused arrays per
    clip dominates the step time (the reference always builds everything
    and hides it behind 4 DataLoader workers).
    """
    T = poses.shape[0]
    V = human_verts.shape[1] if heavy else 0
    P = obj_points.shape[0]

    centroid = pelvis[0].astype(np.float32).copy()
    rotation, rotation_v = yaw_canonical_rotation(poses[0, :3])

    out_pose = poses.astype(np.float32).copy()
    out_trans = trans.astype(np.float32).copy()
    out_pelvis = pelvis.astype(np.float32).copy()
    out_obj_angles = obj_angles.astype(np.float32).copy()
    out_obj_trans = obj_trans.astype(np.float32).copy()
    out_verts = np.zeros((T, V, 7), dtype=np.float32)
    out_obj_points = np.zeros((T, P, 7), dtype=np.float32) if heavy else None
    ground = np.zeros((T, 2), dtype=np.float32)

    Rt = rotation.T  # applied as x @ Rt

    for i in range(T):
        tr = out_trans[i] - centroid
        pv = out_pelvis[i] - centroid
        pelvis_original = pv - tr  # pelvis in the original smpl coords
        out_trans[i] = (tr + pelvis_original) @ Rt - pelvis_original
        out_pelvis[i] = pv @ Rt

        out_pose[i, :3] = rotvec_compose_np(rotation, out_pose[i, :3])

        out_obj_trans[i] = (out_obj_trans[i] - centroid) @ Rt
        out_obj_angles[i] = rotvec_compose_np(rotation, out_obj_angles[i])

        if heavy:
            v = human_verts[i, :, :3].astype(np.float32) - centroid
            out_verts[i, :, :3] = v @ Rt
            out_verts[i, :, 3:6] = (human_verts[i, :, 3:6]
                                    .astype(np.float32) @ Rt)

            rot = rotvec_to_matrix_np(out_obj_angles[i].astype(np.float64)
                                      ).astype(np.float32)
            out_obj_points[i, :, :3] = (obj_points[:, :3].astype(np.float32)
                                        @ rot.T + out_obj_trans[i])
            out_obj_points[i, :, 3:6] = (obj_points[:, 3:6]
                                         .astype(np.float32) @ rot.T)
            out_obj_points[i, obj_contact_idx[i], 6] = 1.0

            out_verts[i, human_contact_idx[i], 6] = 1.0

        raw_i = int(frame_indices[i])
        if raw_i > 0:
            dl = np.linalg.norm(left_foot[raw_i] - left_foot[raw_i - 1])
            dr = np.linalg.norm(right_foot[raw_i] - right_foot[raw_i - 1])
            ground[i, 0] = float(dl < 0.01)
            ground[i, 1] = float(dr < 0.01)
        else:
            ground[i, ground_joint_label_first - 10] = 1.0

    out = {
        "body_pose": out_pose,
        "body_betas": betas.astype(np.float32),
        "body_trans": out_trans,
        "pelvis": out_pelvis,
        "obj_angles": out_obj_angles,
        "obj_trans": out_obj_trans,
        "ground_joint_label": ground,
        "centroid": centroid,
        "rotation": rotation,
        "rotation_v": rotation_v,
    }
    if heavy:
        out["human_verts"] = out_verts
        out["markers"] = out_verts[:, MARKERSET_SSM67_SMPLH, :]
        out["obj_points_frames"] = out_obj_points
    return out


@dataclass
class BehaveSequence:
    """Preprocessed per-sequence record (the reference's `records` dict,
    `dataset_smpl.py:71-87`)."""

    seq_name: str
    gender: str
    obj_name: str
    poses: np.ndarray  # [N, 156]
    betas: np.ndarray  # [N, 10]
    trans: np.ndarray  # [N, 3]
    obj_angles: np.ndarray  # [N, 3]
    obj_trans: np.ndarray  # [N, 3]
    pelvis: np.ndarray  # [N, 3]
    left_foot: np.ndarray  # [N, 3]
    right_foot: np.ndarray  # [N, 3]
    human_verts: np.ndarray  # [N, V, 6] xyz+normals
    obj_points: np.ndarray  # [P, 6]
    obj_contact_idx: List[np.ndarray]
    human_contact_idx: List[np.ndarray]
    ground_joint_label: np.ndarray  # [N]

    @property
    def num_frames(self) -> int:
        return self.poses.shape[0]


class BehaveDataset:
    """Clip dataset over preprocessed sequences.

    ``mode`` split: train = sequences not starting with 'Date03', test = the
    'Date03*' sequences (`dataset_smpl.py:29-31`).  Clip windows of
    ``(past+future)*sample_rate`` frames with the reference's jitter bias
    (`:90-97`): every window except the last jitters its start uniformly in
    [0, fragment); the last window absorbs the remainder.
    """

    def __init__(self, sequences: Sequence[BehaveSequence], *,
                 past_len: int = 10, future_len: int = 25,
                 sample_rate: int = 1,
                 rng: Optional[np.random.Generator] = None,
                 fields: str = "full"):
        if fields not in ("full", "light"):
            raise ValueError("fields must be 'full' or 'light'")
        self.sequences = list(sequences)
        self.past_len = past_len
        self.future_len = future_len
        self.sample_rate = sample_rate
        self.fields = fields
        self.rng = rng or np.random.default_rng(233)
        self.idx2frame: List[Tuple[int, int, int]] = []
        fragment = (past_len + future_len) * sample_rate
        for k, seq in enumerate(self.sequences):
            n = seq.num_frames
            for i in range(n // fragment):
                if i == n // fragment - 1:
                    bias = n + 1 - (n // fragment) * fragment
                else:
                    bias = fragment
                self.idx2frame.append((k, i * fragment, bias))

    def __len__(self) -> int:
        return len(self.idx2frame)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        k, frame_idx, bias = self.idx2frame[idx]
        seq = self.sequences[k]
        start = int(self.rng.integers(bias)) + frame_idx
        T = self.past_len + self.future_len
        frames = np.arange(start, start + T * self.sample_rate,
                           self.sample_rate)
        heavy = self.fields == "full"
        clip = canonicalize_clip(
            poses=seq.poses[frames],
            betas=seq.betas[frames],
            trans=seq.trans[frames],
            pelvis=seq.pelvis[frames],
            obj_angles=seq.obj_angles[frames],
            obj_trans=seq.obj_trans[frames],
            human_verts=seq.human_verts[frames] if heavy else None,
            obj_points=seq.obj_points,
            obj_contact_idx=[seq.obj_contact_idx[i] for i in frames],
            human_contact_idx=[seq.human_contact_idx[i] for i in frames],
            left_foot=seq.left_foot,
            right_foot=seq.right_foot,
            frame_indices=frames,
            ground_joint_label_first=int(seq.ground_joint_label[start]),
            heavy=heavy,
        )
        clip["obj_points"] = seq.obj_points.astype(np.float32)
        clip["gender"] = np.int32(0 if seq.gender == "male" else 1)
        clip["start_frame"] = np.int32(start)
        return clip


_STACK_KEYS = (
    "body_pose", "body_betas", "body_trans", "pelvis", "obj_angles",
    "obj_trans", "human_verts", "markers", "obj_points_frames",
    "ground_joint_label", "obj_points", "gender", "start_frame",
)


def collate(clips: Sequence[Dict[str, np.ndarray]],
            keys: Sequence[str] = _STACK_KEYS) -> Dict[str, np.ndarray]:
    """Stack clip dicts into a [B, ...] batch dict (dense arrays only)."""
    return {k: np.stack([c[k] for c in clips]) for k in keys if k in clips[0]}


def load_behave_sequences(motion_path: str, *, smpl_models, mode: str = "train",
                          smpl_forward_fn=None) -> List[BehaveSequence]:
    """Load and preprocess raw BEHAVE sequences from disk.

    ``smpl_models`` maps gender -> :class:`interdiff_tpu.smpl.SmplModel`;
    the SMPL forward runs on the host (jax-CPU) once per sequence to cache
    vertices, joints and (lazily, saved to `human_normal.npz`) vertex
    normals — mirroring `dataset_smpl.py:44-70`.
    """
    import jax.numpy as jnp

    from interdiff_tpu.geometry.normals import vertex_normals
    from interdiff_tpu.smpl.model import smpl_forward

    names = sorted(os.listdir(motion_path))
    if mode == "train":
        names = [n for n in names if not n.startswith("Date03")]
    elif mode == "test":
        names = [n for n in names if n.startswith("Date03")]
    else:
        raise ValueError("mode must be train or test")

    sequences = []
    for name in names:
        seq_dir = os.path.join(motion_path, name)
        with np.load(os.path.join(seq_dir, "object_fit_all.npz"),
                     allow_pickle=True) as f:
            obj_angles, obj_trans = f["angles"], f["trans"]
        with np.load(os.path.join(seq_dir, "smpl_fit_all.npz"),
                     allow_pickle=True) as f:
            poses, betas, trans = f["poses"], f["betas"], f["trans"]
        with np.load(os.path.join(seq_dir, "contact.npz"),
                     allow_pickle=True) as f:
            d = f["arr_0"].item()
        info = json.load(open(os.path.join(seq_dir, "info.json")))
        gender, obj_name = info["gender"], info["cat"]

        model = smpl_models[gender]
        verts, jtr, _, _ = smpl_forward(
            model, jnp.asarray(poses, dtype=jnp.float32),
            jnp.asarray(betas, dtype=jnp.float32),
            jnp.asarray(trans, dtype=jnp.float32))
        verts = np.asarray(verts)
        jtr = np.asarray(jtr)

        normal_file = os.path.join(seq_dir, "human_normal.npz")
        if os.path.isfile(normal_file):
            with np.load(normal_file, allow_pickle=True) as f:
                normals = f["arr_0"].item()["normals"]
        else:
            normals = np.asarray(vertex_normals(
                jnp.asarray(verts), jnp.asarray(model.faces)))
            try:
                np.savez(normal_file, {"normals": normals})
            except OSError:
                pass  # read-only dataset mount

        sequences.append(BehaveSequence(
            seq_name=name, gender=gender, obj_name=obj_name,
            poses=poses, betas=betas, trans=trans,
            obj_angles=obj_angles, obj_trans=obj_trans,
            pelvis=np.float32(jtr[:, 0]),
            left_foot=np.float32(jtr[:, 10]),
            right_foot=np.float32(jtr[:, 11]),
            human_verts=np.concatenate(
                [verts, normals], axis=2).astype(np.float32),
            obj_points=d["object_points"],
            obj_contact_idx=list(d["object_contact_vertex_label"]),
            human_contact_idx=list(d["human_contact_vertex_label"]),
            ground_joint_label=np.asarray(d["foot_contact_joint_label"]),
        ))
    return sequences
