"""Differential parity against the RUNNABLE reference torch diffusion engine.

The reference DDPM engine (`/root/reference/interdiff/diffusion/
{gaussian_diffusion,respace,nn,losses}.py`) is pure torch+numpy and runs on
CPU in this image.  These tests instantiate the reference `SpacedDiffusion`
exactly as `model/diffusion_smpl.py:251-284` does (cosine, predict-x0,
FIXED_SMALL, MSE), drive it and our `GaussianDiffusion` with an IDENTICAL
closed-form toy denoiser and IDENTICAL noise arrays, and assert the two
engines agree step-for-step:

  * schedule constants + respacing map  (`respace.py:64-129`)
  * q_sample / q_mean_variance / q_posterior    (`gaussian_diffusion.py:233,253`)
  * p_mean_variance incl. the InterDiff inpainting override and the
    denoised_fn hook                     (`gaussian_diffusion.py:307-360`)
  * one ancestral p_sample step with shared noise  (`:496-549`)
  * a full respaced stochastic p_sample_loop (shared per-step noise,
    inpainting + denoised_fn active)     (`:598-736`)
  * ddim_sample_loop (eta=0, deterministic)  (`:738-999`)
  * plms_sample_loop (order 2, deterministic)  (`:1001-1196`)
  * training_losses' (model_output, target) pair  (`:1233-1368`)

This supersedes the numpy re-derivations in test_diffusion.py as the parity
evidence for the engine: both sides here are INDEPENDENT implementations.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/interdiff"
if REF not in sys.path:
    sys.path.append(REF)  # append, not insert: never shadow our own modules

import diffusion.gaussian_diffusion as ref_gd  # noqa: E402  (reference)
from diffusion.respace import SpacedDiffusion, space_timesteps  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.diffusion.gaussian import (  # noqa: E402
    GaussianDiffusion,
    Inpaint,
)

STEPS = 1000
SHAPE = (2, 3, 2, 7)  # [B, J, D, T] like the reference's [B, 1, 144, T]


# ---------------------------------------------------------------------------
# shared toy denoiser — closed-form, implemented twice (torch / jax)
# ---------------------------------------------------------------------------
def _torch_denoiser(x, ts, **kwargs):
    tt = ts.float().reshape((-1,) + (1,) * (x.ndim - 1))
    return (0.95 * x * torch.cos(0.003 * tt)
            + 0.05 * torch.sin(2.0 * x) - 0.01 * tt / STEPS)


def _jax_denoiser(x, ts):
    tt = ts.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return (0.95 * x * jnp.cos(0.003 * tt)
            + 0.05 * jnp.sin(2.0 * x) - 0.01 * tt / STEPS)


def _build_reference(respacing):
    betas = ref_gd.get_named_beta_schedule("cosine", STEPS, 1.0)
    return SpacedDiffusion(
        use_timesteps=space_timesteps(STEPS, respacing),
        betas=betas,
        model_mean_type=ref_gd.ModelMeanType.START_X,
        model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
        loss_type=ref_gd.LossType.MSE,
        rescale_timesteps=False,
    )


def _build_ours(respacing):
    return GaussianDiffusion.create_named(
        schedule_name="cosine", steps=STEPS,
        timestep_respacing=respacing, predict_xstart=True, sigma_small=True)


def _pair(respacing=None):
    respacing = respacing or [STEPS]
    return _build_reference(respacing), _build_ours(respacing)


def _rand(rng, shape=SHAPE):
    return rng.standard_normal(shape).astype(np.float32)


def _inpaint_arrays(rng, past=3):
    """Mask the first `past` frames (last axis = time, like the eval
    harnesses' observation inpainting)."""
    mask = np.zeros(SHAPE, dtype=bool)
    mask[..., :past] = True
    motion = _rand(rng)
    return mask, motion


def _y_kwargs(mask=None, motion=None):
    y = {}
    if mask is not None:
        y["inpainting_mask"] = torch.from_numpy(mask)
        y["inpainted_motion"] = torch.from_numpy(motion)
    return {"y": y}


def _our_inpaint(mask, motion):
    if mask is None:
        return None
    return Inpaint(mask=jnp.asarray(mask), motion=jnp.asarray(motion))


# ---------------------------------------------------------------------------
# schedule constants
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("respacing", [[STEPS], "50", "ddim25"])
def test_schedule_constants_match(respacing):
    ref, ours = _pair(respacing)
    assert ours.num_timesteps == ref.num_timesteps
    assert list(np.asarray(ours.timestep_map)) == list(ref.timestep_map)
    for name in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                 "alphas_cumprod_next", "sqrt_alphas_cumprod",
                 "sqrt_one_minus_alphas_cumprod",
                 "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
                 "posterior_variance", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(ref, name).astype(np.float32),
            rtol=0, atol=1e-6, err_msg=name)


def test_q_process_matches():
    ref, ours = _pair()
    rng = np.random.default_rng(0)
    x0, noise = _rand(rng), _rand(rng)
    t = rng.integers(0, STEPS, size=(SHAPE[0],))

    ref_xt = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                          noise=torch.from_numpy(noise))
    our_xt = ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(our_xt), ref_xt.numpy(), atol=1e-6)

    rm, rv, rlv = ref.q_mean_variance(torch.from_numpy(x0), torch.from_numpy(t))
    om, ov, olv = ours.q_mean_variance(jnp.asarray(x0), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ov) * np.ones(SHAPE, np.float32),
                               rv.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(olv) * np.ones(SHAPE, np.float32),
                               rlv.numpy(), atol=1e-6)

    xt = _rand(rng)
    rpm, rpv, rplv = ref.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(xt), torch.from_numpy(t))
    opm, opv, oplv = ours.q_posterior_mean_variance(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(opm), rpm.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(opv) * np.ones(SHAPE, np.float32),
                               rpv.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(oplv) * np.ones(SHAPE, np.float32),
                               rplv.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# p_mean_variance: plain, inpainting override, denoised_fn, clip
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("with_inpaint,with_denoised,clip", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (True, True, True),
])
def test_p_mean_variance_matches(with_inpaint, with_denoised, clip):
    ref, ours = _pair()
    rng = np.random.default_rng(1)
    x = _rand(rng)
    t = rng.integers(0, STEPS, size=(SHAPE[0],))
    mask = motion = None
    if with_inpaint:
        mask, motion = _inpaint_arrays(rng)

    ref_dfn = (lambda x0, tt, mk: 0.9 * x0 + 0.01) if with_denoised else None
    our_dfn = (lambda x0, tt: 0.9 * x0 + 0.01) if with_denoised else None

    ref_out = ref.p_mean_variance(
        _torch_denoiser, torch.from_numpy(x), torch.from_numpy(t),
        clip_denoised=clip, denoised_fn=ref_dfn,
        model_kwargs=_y_kwargs(mask, motion))
    our_out = ours.p_mean_variance(
        _jax_denoiser, jnp.asarray(x), jnp.asarray(t),
        clip_denoised=clip, denoised_fn=our_dfn,
        inpaint=_our_inpaint(mask, motion))

    for k in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(our_out[k]) * np.ones(SHAPE, np.float32),
            ref_out[k].numpy(), atol=2e-6, err_msg=k)


def test_p_sample_step_matches_with_shared_noise(monkeypatch):
    ref, ours = _pair()
    rng = np.random.default_rng(2)
    x, noise = _rand(rng), _rand(rng)
    t = np.full((SHAPE[0],), 117)

    monkeypatch.setattr(ref_gd.th, "randn_like",
                        lambda a: torch.from_numpy(noise))
    ref_out = ref.p_sample(_torch_denoiser, torch.from_numpy(x),
                           torch.from_numpy(t), clip_denoised=False,
                           model_kwargs=_y_kwargs())
    our_out = ours.p_sample(_jax_denoiser, jnp.asarray(x), jnp.asarray(t),
                            jax.random.PRNGKey(0), noise=jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(our_out["sample"]),
                               ref_out["sample"].numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(our_out["pred_xstart"]),
                               ref_out["pred_xstart"].numpy(), atol=2e-6)


# ---------------------------------------------------------------------------
# full loops
# ---------------------------------------------------------------------------
def test_p_sample_loop_respaced_matches(monkeypatch):
    """Full 50-step respaced stochastic DDPM loop, per-step noise shared via
    a monkeypatched `th.randn_like` on the torch side and `step_noise` on
    ours; inpainting + denoised_fn both active (the eval configuration)."""
    ref, ours = _pair("50")
    rng = np.random.default_rng(3)
    init = _rand(rng)
    mask, motion = _inpaint_arrays(rng)
    n_steps = ref.num_timesteps
    step_noise = np.stack([_rand(rng) for _ in range(n_steps)])

    seq = iter(step_noise)
    monkeypatch.setattr(ref_gd.th, "randn_like",
                        lambda a: torch.from_numpy(next(seq)))
    ref_final = ref.p_sample_loop(
        _torch_denoiser, SHAPE, noise=torch.from_numpy(init),
        clip_denoised=False,
        denoised_fn=lambda x0, tt, mk: 0.98 * x0,
        model_kwargs=_y_kwargs(mask, motion), device="cpu")

    our_final = ours.p_sample_loop(
        _jax_denoiser, jax.random.PRNGKey(0), noise=jnp.asarray(init),
        denoised_fn=lambda x0, tt: 0.98 * x0,
        inpaint=_our_inpaint(mask, motion),
        step_noise=jnp.asarray(step_noise))
    np.testing.assert_allclose(np.asarray(our_final), ref_final.numpy(),
                               atol=1e-5)


def test_p_sample_loop_skip_timesteps_matches(monkeypatch):
    """skip_timesteps in the reference DDPM loop runs ``T-1 .. skip`` —
    stopping EARLY, not starting lower (`gaussian_diffusion.py:704`, unlike
    its own DDIM/PLMS loops which use ``range(T-skip)[::-1]``); ours pins the
    DDPM semantics."""
    ref, ours = _pair("25")
    rng = np.random.default_rng(7)
    init = _rand(rng)
    skip = 5
    n_steps = ref.num_timesteps - skip
    step_noise = np.stack([_rand(rng) for _ in range(n_steps)])

    seq = iter(step_noise)
    monkeypatch.setattr(ref_gd.th, "randn_like",
                        lambda a: torch.from_numpy(next(seq)))
    ref_final = ref.p_sample_loop(
        _torch_denoiser, SHAPE, noise=torch.from_numpy(init),
        clip_denoised=False, skip_timesteps=skip,
        model_kwargs=_y_kwargs(), device="cpu")

    our_final = ours.p_sample_loop(
        _jax_denoiser, jax.random.PRNGKey(0), noise=jnp.asarray(init),
        skip_timesteps=skip, step_noise=jnp.asarray(step_noise))
    np.testing.assert_allclose(np.asarray(our_final), ref_final.numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("respacing", ["50", "ddim25"])
def test_ddim_loop_matches(respacing):
    """DDIM with eta=0 is deterministic — exact loop comparison including
    the respaced timestep_map, inpainting and denoised_fn."""
    ref, ours = _pair(respacing)
    rng = np.random.default_rng(4)
    init = _rand(rng)
    mask, motion = _inpaint_arrays(rng)

    ref_final = ref.ddim_sample_loop(
        _torch_denoiser, SHAPE, noise=torch.from_numpy(init),
        clip_denoised=False, eta=0.0,
        denoised_fn=lambda x0, tt, mk: 0.98 * x0,
        model_kwargs=_y_kwargs(mask, motion), device="cpu")
    our_final = ours.ddim_sample_loop(
        _jax_denoiser, jax.random.PRNGKey(0), noise=jnp.asarray(init),
        eta=0.0, denoised_fn=lambda x0, tt: 0.98 * x0,
        inpaint=_our_inpaint(mask, motion))
    np.testing.assert_allclose(np.asarray(our_final), ref_final.numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("order", [2, 3])
def test_plms_loop_matches(order):
    """PLMS is deterministic (`:1001-1084`): Euler warm-up + Adams-Bashforth
    history must match the reference step-for-step.

    order=1 is omitted because the REFERENCE crashes on it (step 0 takes the
    `old_out is None` branch only when order>1, then `old_out["old_eps"]`
    raises TypeError, `gaussian_diffusion.py:1052,1061`).

    Tolerance note: the step-0 Euler warm-up round-trips x0 <-> eps twice at
    t=T-1 where sqrt_recipm1_alphas_cumprod ~ 1.5e2 (cosine tail), so 1-2 ulp
    of backend arithmetic difference amplifies to ~1e-3.  An eager op-by-op
    JAX replay of the engine's step matches torch BITWISE (diff 0.0); the
    compiled lax.scan differs only by XLA instruction scheduling.  2e-3 here
    is therefore a conditioning bound, not a semantics gap (the DDPM/DDIM
    loops above hold 1e-5)."""
    ref, ours = _pair("50")
    rng = np.random.default_rng(5)
    init = _rand(rng)

    ref_final = ref.plms_sample_loop(
        _torch_denoiser, SHAPE, noise=torch.from_numpy(init),
        clip_denoised=False, order=order,
        model_kwargs=_y_kwargs(), device="cpu")
    our_final = ours.plms_sample_loop(
        _jax_denoiser, jax.random.PRNGKey(0), noise=jnp.asarray(init),
        order=order)
    np.testing.assert_allclose(np.asarray(our_final), ref_final.numpy(),
                               atol=2e-3)


# ---------------------------------------------------------------------------
# training path
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("with_inpaint", [False, True])
def test_training_losses_pair_matches(with_inpaint):
    """The reference's modified training_losses returns (model_output,
    target) (`:1233-1368`); with the x_t inpainting overwrite (`:1264-1268`)."""
    ref, ours = _pair()
    rng = np.random.default_rng(6)
    x0, noise = _rand(rng), _rand(rng)
    t = rng.integers(0, STEPS, size=(SHAPE[0],))
    mask = motion = None
    if with_inpaint:
        mask, motion = _inpaint_arrays(rng)

    ref_out, ref_target = ref.training_losses(
        _torch_denoiser, torch.from_numpy(x0), torch.from_numpy(t),
        model_kwargs=_y_kwargs(mask, motion), noise=torch.from_numpy(noise))
    our_out, our_target = ours.training_losses(
        _jax_denoiser, jnp.asarray(x0), jnp.asarray(t),
        noise=jnp.asarray(noise), inpaint=_our_inpaint(mask, motion))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(our_target), ref_target.numpy(),
                               atol=1e-6)


def test_vb_terms_bpd_matches():
    """VLB diagnostics (`:1198,1535`): normal_kl + discretized NLL."""
    ref, ours = _pair()
    rng = np.random.default_rng(8)
    x0, xt = _rand(rng), _rand(rng)
    t = np.array([0, 250])  # t=0 exercises the decoder-NLL branch

    ref_out = ref._vb_terms_bpd(
        _torch_denoiser, torch.from_numpy(x0), torch.from_numpy(xt),
        torch.from_numpy(t), clip_denoised=False,
        model_kwargs=_y_kwargs())
    our_out = ours.vb_terms_bpd(
        _jax_denoiser, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(our_out["output"]),
                               ref_out["output"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_out["pred_xstart"]),
                               ref_out["pred_xstart"].numpy(), atol=2e-6)


def test_calc_bpd_loop_matches(monkeypatch):
    """Full VLB sweep (`gaussian_diffusion.py:1535-1609`: `_prior_bpd` +
    `calc_bpd_loop`) on a respaced 25-step schedule with shared per-step
    q_sample noise (torch.randn_like patched to replay the same draws)."""
    ref, ours = _pair([25])
    rng = np.random.default_rng(9)
    x0 = _rand(rng)
    noises = [_rand(rng) for _ in range(25)]
    it = iter(noises)
    monkeypatch.setattr(torch, "randn_like",
                        lambda x: torch.from_numpy(next(it)))

    ref_out = ref.calc_bpd_loop(_torch_denoiser, torch.from_numpy(x0),
                                clip_denoised=False,
                                model_kwargs=_y_kwargs())
    our_out = ours.calc_bpd_loop(
        _jax_denoiser, jnp.asarray(x0),
        step_noise=jnp.asarray(np.stack(noises)))

    np.testing.assert_allclose(np.asarray(our_out["prior_bpd"]),
                               ref_out["prior_bpd"].numpy(), atol=1e-4)
    for k in ("vb", "xstart_mse", "mse"):
        np.testing.assert_allclose(np.asarray(our_out[k]),
                                   ref_out[k].numpy(), atol=1e-4,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(our_out["total_bpd"]),
                               ref_out["total_bpd"].numpy(), rtol=1e-4,
                               atol=1e-3)
