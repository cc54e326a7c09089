"""SMPL-track eval pipeline end-to-end on tiny shapes: sampler with the
physics-informed correction compiled into the scan (SMPL FK + signed
distance + projector behind lax.cond), postprocessing, metrics, rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.diffusion.gaussian import GaussianDiffusion
from interdiff_tpu.eval.smpl_long import (
    denormalize_chunk,
    recanonicalize_state,
    rollout,
)
from interdiff_tpu.eval.smpl_short import (
    SmplEvalConfig,
    make_sampler,
    postprocess_sample,
)
from interdiff_tpu.models.correction import ObjProjectorSmpl
from interdiff_tpu.models.mdm_smpl import MDMSmpl
STEPS = 6


def _tiny_smpl(rng, V=64, J=22 + 30):
    from interdiff_tpu.utils.fixtures import tiny_smpl_model

    return tiny_smpl_model(rng, V=V, J=J)


def _setup(rng, use_correction):
    cfg = SmplEvalConfig(past_len=3, future_len=4, correction_t_max=STEPS,
                         correction_every=2, nn_chunk=None)
    model = MDMSmpl(embed_dim=32, num_heads=4, ff_size=32, num_layers=4,
                    past_len=3, future_len=4, use_pointnet2=False)
    diffusion = GaussianDiffusion.create_named(steps=STEPS)
    smpl = _tiny_smpl(rng)
    T = cfg.seq_len
    B, P = 2, 16
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    obj_points6 = jnp.asarray(rng.standard_normal((B, P, 6)).astype(np.float32))
    hand = jnp.asarray(rng.standard_normal((B, T, 90)).astype(np.float32) * 0.1)
    betas = jnp.zeros((B, T, 10))

    params = model.init(jax.random.PRNGKey(0), gt, obj_points6,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    projector = projector_params = None
    markers_idx = None
    if use_correction:
        markers_idx = np.arange(40)  # 40 "markers" on the 64-vert test mesh
        projector = ObjProjectorSmpl(num_markers=40, n_pre=4, past_len=3,
                                     future_len=4)
        projector_params = projector.init(
            jax.random.PRNGKey(1), gt[..., 135:],
            jnp.zeros((B, T, 40, 3)), jnp.zeros((B, 40)))
    import functools

    sampler = functools.partial(jax.jit(make_sampler(
        cfg, model, diffusion, smpl=smpl, projector=projector,
        projector_params=projector_params, use_correction=use_correction,
        markers_idx=markers_idx)), params)
    return cfg, smpl, sampler, gt, obj_points6, hand, betas


def test_smpl_sampler_no_correction(rng):
    cfg, smpl, sampler, gt, pts, hand, betas = _setup(rng, False)
    x = sampler(jax.random.PRNGKey(2), gt, pts, hand, betas)
    assert x.shape == gt.shape
    assert np.isfinite(np.asarray(x)).all()
    # inpainted past == gt
    np.testing.assert_allclose(np.asarray(x[:, :3]), np.asarray(gt[:, :3]),
                               atol=1e-5)
    out = postprocess_sample(cfg, smpl, x, hand, betas)
    assert out["body_pred"].shape == (2, 7, 66 + 90 + 3)
    assert out["verts"].shape == (2, 7, 64, 3)


def test_smpl_sampler_with_correction(rng):
    cfg, smpl, sampler, gt, pts, hand, betas = _setup(rng, True)
    x = sampler(jax.random.PRNGKey(3), gt, pts, hand, betas)
    assert np.isfinite(np.asarray(x)).all()
    # NOTE: unlike the plain sampler, past frames may legitimately deviate
    # from gt here — the reference applies the projector blend AFTER the
    # inpainting override (`gaussian_diffusion.py:307-311` then `:354-360`),
    # so corrected samples rewrite the object block on all frames.
    body_past = x[..., :135][:, :3]
    np.testing.assert_allclose(np.asarray(body_past),
                               np.asarray(gt[..., :135][:, :3]), atol=1e-5)


def test_recanonicalize_roundtrip(rng):
    cfg = SmplEvalConfig(past_len=3, future_len=4)
    B, T = 2, 7
    x = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    pelvis = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    nb = recanonicalize_state(x, pelvis, cfg)
    back = denormalize_chunk(nb["gt"], nb["centroid"], cfg)
    # the past window of the denormalized state equals the original tail
    np.testing.assert_allclose(np.asarray(back[:, :3]),
                               np.asarray(x[:, -3:]), atol=1e-5)


def test_rollout_extends_trajectory(rng):
    cfg, smpl, sampler, gt, pts, hand, betas = _setup(rng, False)

    def pelvis_fn(x, h, b):
        return postprocess_sample(cfg, smpl, x, h, b)["pelvis"]

    full = rollout(sampler, pelvis_fn, jax.random.PRNGKey(4), gt, pts, hand,
                   betas, num_chunks=2, cfg=cfg)
    assert full.shape == (2, 7 + 2 * cfg.future_len, 144)
    assert np.isfinite(np.asarray(full)).all()


def test_rollout_global_frame_accumulates_centroids(rng):
    """Chunk k >= 2 is sampled in chunk (k-1)'s canonical frame; its global
    placement needs the SUM of all centroids subtracted so far.  A perfect
    constant-velocity sampler must produce a globally straight trajectory —
    before the fix, chunks >= 2 were offset by the earlier centroids
    (translation came out [0..7, 5,6,7, 5,6,7] instead of [0..13])."""
    cfg = SmplEvalConfig(past_len=2, future_len=3)
    B, T, D = 1, cfg.seq_len, cfg.smpl_dim + 3
    v = jnp.asarray([1.0, 0.5, -0.25])

    def stub_sampler(key, gt, pts, hand, betas):
        # continue the past window's body/object velocity exactly
        del key, pts, hand, betas
        def extend(tr):
            vel = tr[:, cfg.past_len - 1] - tr[:, cfg.past_len - 2]
            steps = jnp.arange(1, cfg.future_len + 1, dtype=tr.dtype)
            fut = tr[:, cfg.past_len - 1][:, None] \
                + steps[None, :, None] * vel[:, None]
            return jnp.concatenate([tr[:, :cfg.past_len], fut], axis=1)
        body_tr = extend(gt[..., D - 3 : D])
        obj_tr = extend(gt[..., D + 6 : D + 9])
        x = jnp.zeros_like(gt)
        x = x.at[..., D - 3 : D].set(body_tr)
        return x.at[..., D + 6 : D + 9].set(obj_tr)

    def pelvis_fn(x, hand, betas):  # pelvis rides the body translation
        return x[..., D - 3 : D]

    ramp = jnp.arange(T, dtype=jnp.float32)[None, :, None] * v
    gt = jnp.zeros((B, T, 144))
    gt = gt.at[..., D - 3 : D].set(ramp).at[..., D + 6 : D + 9].set(ramp)
    full = rollout(stub_sampler, pelvis_fn, jax.random.PRNGKey(0), gt,
                   jnp.zeros((B, 4, 6)), jnp.zeros((B, T, 90)),
                   jnp.zeros((B, T, 10)), num_chunks=2, cfg=cfg,
                   seam_smooth=False)
    T_full = T + 2 * cfg.future_len
    expect = np.arange(T_full, dtype=np.float32)[None, :, None] * np.asarray(v)
    np.testing.assert_allclose(np.asarray(full[..., D - 3 : D]), expect,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(full[..., D + 6 : D + 9]), expect,
                               atol=1e-5)


def test_sampler_variants_and_memory_reuse(rng):
    """reuse_memory gives identical results to the fused path; ddim/plms
    variants run finite."""
    import functools

    from interdiff_tpu.models.mdm_smpl import MDMSmpl as _M

    cfg = SmplEvalConfig(past_len=3, future_len=4, nn_chunk=None)
    model = MDMSmpl(embed_dim=32, num_heads=4, ff_size=32, num_layers=4,
                    past_len=3, future_len=4, use_pointnet2=False)
    diffusion = GaussianDiffusion.create_named(steps=STEPS)
    smpl = _tiny_smpl(rng)
    B, T, P = 2, 7, 16
    gt = jnp.asarray(rng.standard_normal((B, T, 144)).astype(np.float32))
    pts = jnp.asarray(rng.standard_normal((B, P, 6)).astype(np.float32))
    hand = jnp.zeros((B, T, 90))
    betas = jnp.zeros((B, T, 10))
    params = model.init(jax.random.PRNGKey(0), gt, pts,
                        jnp.zeros((B,), jnp.int32), method=_M.init_forward)

    fused = make_sampler(cfg, model, diffusion, smpl=smpl)
    split = make_sampler(cfg, model, diffusion, smpl=smpl, reuse_memory=True)
    memory = model.apply(params, gt, pts, method=_M.encode)
    key = jax.random.PRNGKey(9)
    x_fused = fused(params, key, gt, pts, hand, betas)
    x_split = split(params, key, gt, pts, hand, betas, memory)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_split),
                               atol=1e-5)

    for name in ("ddim", "plms"):
        s = make_sampler(cfg, model, diffusion, smpl=smpl, sampler=name)
        x = s(params, jax.random.PRNGKey(3), gt, pts, hand, betas)
        assert np.isfinite(np.asarray(x)).all(), name
        # inpainted past preserved by all samplers
        np.testing.assert_allclose(np.asarray(x[:, :3]),
                                   np.asarray(gt[:, :3]), atol=1e-4,
                                   err_msg=name)


def test_correction_gating_matches_naive_broadcast(rng):
    """The optimized gating math inside `correct` (future-only obj->verts
    NN + 67-query marker NN) must equal the reference's naive formulation
    (bidirectional point2point_signed over all frames + the [B,T,P,M]
    broadcast norm tensor, `eval_smpl_short.py:107-125`)."""
    from interdiff_tpu.geometry.normals import vertex_normals
    from interdiff_tpu.ops.signed_distance import (
        nearest_neighbor,
        point2point_signed,
    )

    B, T, past, V, P, M = 3, 7, 3, 40, 24, 11
    Tf = T - past
    faces = np.stack([np.arange(V - 2), np.arange(1, V - 1),
                      np.arange(2, V)], axis=1).astype(np.int32)
    verts = jnp.asarray(rng.standard_normal((B, T, V, 3)).astype(np.float32))
    obj = jnp.asarray(rng.standard_normal((B, T, P, 3)).astype(np.float32))
    midx = np.sort(rng.choice(V, size=M, replace=False))
    markers = verts[:, :, midx]

    # --- naive reference formulation ---
    normals_all = vertex_normals(verts.reshape(B * T, V, 3), faces)
    o2h_all, _, _, _ = point2point_signed(
        verts.reshape(B * T, V, 3), obj.reshape(B * T, P, 3),
        normals_all, None, chunk=None)
    o2h_all = o2h_all.reshape(B, T, P)
    d = jnp.linalg.norm(markers[:, :, None] - obj[:, :, :, None], axis=-1)
    # d: [B, T, P, M]
    distance_naive = d.min(axis=3).min(axis=2).mean(axis=1)
    contact_naive = (d < 0.02).any(axis=2)
    loss_naive = (jnp.abs(o2h_all) * jnp.where(o2h_all < 0, 20.0, 0.0)
                  )[:, past:].mean(axis=(1, 2))

    # --- optimized formulation (as in eval/smpl_short.correct) ---
    verts_fut = verts[:, past:].reshape(B * Tf, V, 3)
    obj_fut = obj[:, past:].reshape(B * Tf, P, 3)
    normals_fut = vertex_normals(verts_fut, faces)
    _, oidx = nearest_neighbor(obj_fut, verts_fut, chunk=None)
    near_v = jnp.take_along_axis(verts_fut, oidx[..., None].repeat(3, -1),
                                 axis=-2)
    near_n = jnp.take_along_axis(normals_fut, oidx[..., None].repeat(3, -1),
                                 axis=-2)
    vec = obj_fut - near_v
    o2h_fut = (jnp.linalg.norm(vec, axis=-1)
               * jnp.sign(jnp.sum(near_n * vec, axis=-1))).reshape(B, Tf, P)
    loss_opt = (jnp.abs(o2h_fut)
                * jnp.where(o2h_fut < 0, 20.0, 0.0)).mean(axis=(1, 2))

    md2, pidx = nearest_neighbor(markers.reshape(B * T, M, 3),
                                 obj.reshape(B * T, P, 3), chunk=None)
    near_p = jnp.take_along_axis(obj.reshape(B * T, P, 3),
                                 pidx[..., None].repeat(3, -1), axis=-2)
    marker_d = jnp.linalg.norm(markers.reshape(B * T, M, 3) - near_p,
                               axis=-1).reshape(B, T, M)
    distance_opt = marker_d.min(axis=2).mean(axis=1)
    contact_opt = marker_d < 0.02

    np.testing.assert_allclose(np.asarray(loss_naive), np.asarray(loss_opt),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(distance_naive),
                               np.asarray(distance_opt), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(contact_naive),
                                  np.asarray(contact_opt))
