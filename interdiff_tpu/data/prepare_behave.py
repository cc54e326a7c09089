"""Offline contact-label generator — the `interdiff/data/prepare_behave.py`
equivalent, chumpy/igl/psbody-free.

For every sequence: sample 2048 surface points + normals from the
mean-centered full object scan, run SMPL-H forward for all frames, and per
frame label (i) object points within 0.02 m signed distance of the body
mesh (`prepare_behave.py:42-45`), (ii) human vertices within 0.02 m of any
contacting object point (`:48-52`), (iii) the higher-foot joint id (10/11,
`:104-105`), writing `contact.npz` in the reference's exact layout.

Runs once per dataset on the host; the signed distance uses our
pseudonormal mesh-distance op (igl-equivalent).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from typing import Dict, Optional

import numpy as np

from interdiff_tpu.data.mesh_io import load_mesh, sample_surface
from interdiff_tpu.ops.mesh_distance import signed_distance_to_mesh


def contact_labels_for_frame(object_points: np.ndarray, smpl_verts: np.ndarray,
                             smpl_faces: np.ndarray, thres: float = 0.02):
    """-> (object contact point indices, human contact vertex indices).

    Uses the native C++ BVH engine (`native/mesh_distance.cpp`) when built;
    falls back to the JAX brute-force mesh distance otherwise."""
    from interdiff_tpu.utils.native import native_available

    if native_available():
        from interdiff_tpu.utils.native import SignedDistanceMesh

        dist, _, _ = SignedDistanceMesh(smpl_verts, smpl_faces).query(
            object_points)
    else:
        dist, _, _ = signed_distance_to_mesh(object_points, smpl_verts,
                                             smpl_faces)
    contact_object_label = np.where(dist < thres)[0]
    if len(contact_object_label):
        d = np.linalg.norm(
            object_points[None, contact_object_label]
            - smpl_verts[:, None], axis=2)
        contact_human_label = np.where((d < thres).any(axis=1))[0]
    else:
        contact_human_label = np.array([], dtype=np.int64)
    return contact_object_label, contact_human_label


def prepare_sequence(seq_dir: str, object_path: str, smpl_models: Dict, *,
                     num_samples: int = 2048, overwrite: bool = False,
                     out_file: Optional[str] = None) -> str:
    """Generate contact.npz for one BEHAVE sequence directory."""
    import jax.numpy as jnp

    from interdiff_tpu.smpl.model import smpl_forward

    out = out_file or os.path.join(seq_dir, "contact.npz")
    if os.path.isfile(out) and not overwrite:
        return out

    with np.load(os.path.join(seq_dir, "object_fit_all.npz"),
                 allow_pickle=True) as f:
        obj_angles, obj_trans = f["angles"], f["trans"]
    with np.load(os.path.join(seq_dir, "smpl_fit_all.npz"),
                 allow_pickle=True) as f:
        poses, betas, trans = f["poses"], f["betas"], f["trans"]
    info = json.load(open(os.path.join(seq_dir, "info.json")))
    gender, obj_name = info["gender"], info["cat"]

    full = os.path.join(object_path, f"{obj_name}/{obj_name}.obj")
    if not os.path.isfile(full):
        # full scan absent -> simplified template (`data/utils.py:18-62`
        # SIMPLIFIED_MESH map); the shipped snapshot only carries these
        from interdiff_tpu.data.constants import SIMPLIFIED_MESH

        full = os.path.join(object_path, SIMPLIFIED_MESH[obj_name])
    mesh = load_mesh(full)
    verts_centered = mesh.vertices - mesh.vertices.mean(0)
    mesh.vertices = verts_centered
    pts, fidx = sample_surface(mesh, num_samples)
    normals = mesh.face_normals[fidx]
    object_all = np.concatenate([pts, normals], axis=1)

    model = smpl_models[gender]
    verts, jtr, _, _ = smpl_forward(
        model, jnp.asarray(poses, jnp.float32), jnp.asarray(betas, jnp.float32),
        jnp.asarray(trans, jnp.float32))
    verts = np.asarray(verts, np.float32)
    jtr = np.asarray(jtr)
    faces = np.asarray(model.faces)

    from interdiff_tpu.geometry.rotations_np import rotvec_to_matrix_np

    contact_dict = {
        "object_points": object_all,
        "object_contact_vertex_label": [],
        "human_contact_vertex_label": [],
        "foot_contact_joint_label": [],
    }
    for i in range(poses.shape[0]):
        foot_label = 10 if jtr[i, 10, 1] > jtr[i, 11, 1] else 11
        rot = rotvec_to_matrix_np(obj_angles[i])
        obj_v = pts @ rot.T + obj_trans[i]
        ol, hl = contact_labels_for_frame(obj_v, verts[i], faces)
        contact_dict["object_contact_vertex_label"].append(ol)
        contact_dict["human_contact_vertex_label"].append(hl)
        contact_dict["foot_contact_joint_label"].append(foot_label)

    np.savez(out, contact_dict)
    return out


def main():
    parser = ArgumentParser()
    parser.add_argument("--motion_path", required=True)
    parser.add_argument("--object_path", required=True)
    parser.add_argument("--model_path", required=True,
                        help="directory with SMPLH_{male,female}.pkl")
    parser.add_argument("-n", "--num_samples", type=int, default=2048)
    args = parser.parse_args()

    from interdiff_tpu.smpl.loader import smpl_model_from_pkl

    smpl_models = {
        g: smpl_model_from_pkl(os.path.join(args.model_path,
                                            f"SMPLH_{g}.pkl"))
        for g in ("male", "female")
    }
    for name in sorted(os.listdir(args.motion_path)):
        seq_dir = os.path.join(args.motion_path, name)
        if os.path.isdir(seq_dir):
            print(prepare_sequence(seq_dir, args.object_path, smpl_models,
                                   num_samples=args.num_samples))


if __name__ == "__main__":
    main()
