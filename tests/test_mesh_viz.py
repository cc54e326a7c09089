"""Renderer parity tests — frame layout, coloring, and rasterizer basics
pinned against the reference protocol (`interdiff/render/mesh_viz.py:33-155`,
`mesh_utils.py:20-206`)."""

import numpy as np
import pytest

from interdiff_tpu.viz import render3d
from interdiff_tpu.viz.mesh_viz import (COLORS, render_frame,
                                        visualize_body_obj)


@pytest.fixture
def simple_scene(rng):
    # a small closed-ish body (tetra fan) + object cube, T frames
    T = 3
    body = np.array([[0, 0.2, 0], [0.3, 1.2, 0.1], [-0.3, 1.2, 0.1],
                     [0, 1.0, -0.4], [0, 1.6, 0.0]], dtype=np.float64)
    bf = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [4, 1, 2], [4, 2, 3],
                   [4, 3, 1]], dtype=np.int32)
    cube = np.array([[x, y, z] for x in (0, .2) for y in (0, .2)
                     for z in (0, .2)], dtype=np.float64) + [0.6, 0.3, 0.0]
    cf = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
                   [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
                   [1, 5, 7], [1, 7, 3]], dtype=np.int32)
    bodies = np.stack([body + [0.02 * t, 0, 0] for t in range(T)])
    cubes = np.stack([cube + [0.02 * t, 0, 0] for t in range(T)])
    return bodies, bf, cubes, cf


def test_rasterizer_draws_and_zbuffers():
    # near triangle (z=-1) must occlude far one (z=-2) where they overlap
    far = (np.array([[-1.0, -0.5, -2.0], [1.0, -0.5, -2.0], [0.0, 1.0, -2.0]]),
           np.array([[0, 1, 2]]), np.array([1.0, 0.0, 0.0]))
    near = (np.array([[-0.3, -0.2, -1.0], [0.3, -0.2, -1.0], [0.0, 0.4, -1.0]]),
            np.array([[0, 1, 2]]), np.array([0.0, 0.0, 1.0]))
    # identity camera: feed verts already in camera space by inverting view
    view = render3d.view_matrix()
    inv = np.linalg.inv(view)

    def to_world(m):
        v, f, c = m
        return (v @ inv[:3, :3].T + inv[:3, 3], f, c)

    img = render3d.render_scene([to_world(far), to_world(near)],
                                width=64, height=64)
    assert img.shape == (64, 64, 3)
    red = (img[..., 0] > 150) & (img[..., 2] < 100)
    blue = (img[..., 2] > 150) & (img[..., 0] < 100)
    assert red.sum() > 20 and blue.sum() > 5
    # the near (blue) triangle sits inside the far one's footprint: the
    # center pixel must be blue, not red
    assert img[32, 32, 2] > img[32, 32, 0]


def test_multi_angle_layout_and_tile_order(simple_scene):
    """multi_angle tiles are v0|v1|v3|v2 => yaw 0/90/270/180
    (`mesh_viz.py:129-148`)."""
    bodies, bf, cubes, cf = simple_scene
    h = w = 48
    ground = render3d.ground_planes(-1, 1, -1, 1)
    frame = render_frame(bodies[0], bf, cubes[0], cf, ground, past=False,
                         h=h, w=w, multi_angle=True)
    assert frame.shape == (h, 4 * w, 3)
    rot = render3d.rot_y(90.0)
    yaws = {0: bodies[0], 1: bodies[0] @ rot.T,
            2: bodies[0] @ rot.T @ rot.T @ rot.T,
            3: bodies[0] @ rot.T @ rot.T}
    cubes_y = {0: cubes[0], 1: cubes[0] @ rot.T,
               2: cubes[0] @ rot.T @ rot.T @ rot.T,
               3: cubes[0] @ rot.T @ rot.T}
    for k in range(4):
        single = render_frame(yaws[k], bf, cubes_y[k], cf, ground,
                              past=False, h=h, w=w, multi_angle=False)
        np.testing.assert_array_equal(frame[:, k * w:(k + 1) * w], single)


def test_past_future_coloring(simple_scene, tmp_path):
    bodies, bf, cubes, cf = simple_scene
    path = str(tmp_path / "clip.gif")
    video = visualize_body_obj(bodies, bf, cubes, cf, past_len=0,
                               save_path=path, multi_angle=False,
                               h=64, w=64)
    # reference uses i <= past_len as "past" (`mesh_viz.py:100`): with
    # past_len=0 frame 0 is grey, frames 1+ are colored
    assert video.shape == (3, 3, 64, 64)
    f0 = video[0].transpose(1, 2, 0).astype(int)
    f2 = video[2].transpose(1, 2, 0).astype(int)

    def has_color(img, rgb, tol=28):
        return (np.abs(img - np.asarray(rgb)).sum(-1) < tol).any()

    # shading scales colors; check hue ratios instead of exact values:
    # past body is achromatic (r≈g≈b), future body is yellow-ish (b < r,g)
    nonwhite0 = f0[(f0.sum(-1) < 700) & (f0[..., 1] > 40)]
    nonwhite2 = f2[(f2.sum(-1) < 700) & (f2[..., 1] > 40)]
    assert nonwhite0.size and nonwhite2.size
    chroma0 = np.abs(nonwhite0 - nonwhite0.mean(-1, keepdims=True)).max()
    chroma2 = np.abs(nonwhite2 - nonwhite2.mean(-1, keepdims=True)).max()
    assert chroma0 < chroma2  # future frames are more colorful
    import os
    assert os.path.getsize(path) > 500


def test_floor_centering_invariance(simple_scene):
    """The scene is floored/centered on the body extent (`mesh_viz.py:63-79`):
    translating the whole scene must not change the render."""
    bodies, bf, cubes, cf = simple_scene
    a = visualize_body_obj(bodies, bf, cubes, cf, past_len=0,
                           multi_angle=False, h=48, w=48)
    b = visualize_body_obj(bodies + 5.0, bf, cubes + 5.0, cf, past_len=0,
                           multi_angle=False, h=48, w=48)
    np.testing.assert_array_equal(a, b)


def test_marker_pcd_path(simple_scene):
    bodies, bf, cubes, cf = simple_scene
    markers = np.tile(bodies[:, :1], (1, 67, 1)) + \
        np.linspace(0, 0.3, 67)[None, :, None]
    video = visualize_body_obj(bodies, bf, cubes, cf, past_len=0,
                               multi_angle=False, h=48, w=48, pcd=markers)
    assert video.shape == (3, 3, 48, 48)


def test_ground_planes_two_tone():
    planes = render3d.ground_planes(-1.0, 1.0, -2.0, 2.0)
    assert len(planes) == 2
    (v_out, _, c_out), (v_in, _, c_in) = planes
    # outer plane 1.6x the inner, lighter color (`mesh_utils.py:41-60`)
    assert np.allclose(v_out[:, 0].max() - v_out[:, 0].min(), 1.6 * 2.0)
    assert np.allclose(v_in[:, 0].max() - v_in[:, 0].min(), 2.0)
    assert c_out.mean() > c_in.mean()
    assert np.allclose(c_in, np.array([189, 195, 199]) / 255.0)


def test_point_cloud_object_renders_visible(simple_scene):
    """obj_faces=None: the object is a raw point cloud and must render as
    spheres, not vanish (degenerate placeholder faces are culled)."""
    bodies, bf, cubes, _ = simple_scene
    video = visualize_body_obj(bodies, bf, cubes, None, past_len=0,
                               multi_angle=False, h=64, w=64)
    f2 = video[2].transpose(1, 2, 0).astype(int)
    # pink-ish object pixels present (future object color, shaded):
    # r > g > b with a clear r-b gap
    pinkish = ((f2[..., 0] > f2[..., 1]) & (f2[..., 1] > f2[..., 2])
               & (f2[..., 0] - f2[..., 2] > 15) & (f2.sum(-1) < 700))
    assert pinkish.sum() > 3


def test_perspective_correct_depth():
    """Depth must interpolate as 1/z (perspective-correct), not affinely.
    Scene: a flat wall at camera z=-4 behind a large triangle spanning
    z=-1..-7.  True z of the near triangle's interior at the image center
    is ~2.3 (in front of the wall); affine interpolation overestimates it
    past 4, letting the wall incorrectly win the z-test (verified: the
    affine variant turns the center pixel wall-blue)."""
    view = render3d.view_matrix()
    inv = np.linalg.inv(view)

    def cam2world(v):
        return v @ inv[:3, :3].T + inv[:3, 3]

    wall = (cam2world(np.array([[-2.5, -2.5, -4.0], [2.5, -2.5, -4.0],
                                [0.0, 2.5, -4.0]])),
            np.array([[0, 1, 2]]), np.array([0.2, 0.2, 0.8]))
    near = (cam2world(np.array([[-2.0, -0.5, -1.0], [2.0, -0.5, -1.0],
                                [0.0, 0.5, -7.0]])),
            np.array([[0, 1, 2]]), np.array([0.9, 0.2, 0.2]))
    img = render3d.render_scene([wall, near], width=96, height=96)
    c = img[48, 48].astype(int)
    assert c[0] > c[2], f"near red triangle must win the center z-test: {c}"
