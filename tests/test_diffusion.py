import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interdiff_tpu.diffusion import (
    GaussianDiffusion,
    Inpaint,
    ModelMeanType,
    ModelVarType,
    UniformSampler,
    get_named_beta_schedule,
    respace_betas,
    space_timesteps,
)


def make_diffusion(steps=1000, respacing=None, **kw):
    return GaussianDiffusion.create_named(
        schedule_name="cosine", steps=steps, timestep_respacing=respacing, **kw)


def test_cosine_schedule_values():
    betas = get_named_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert betas.max() <= 0.999 + 1e-12
    assert betas.min() > 0
    # alpha_bar at t=0 close to cos(0.008/1.008 * pi/2)^2 ratio
    np.testing.assert_allclose(
        betas[0],
        1 - (np.cos((0.001 + 0.008) / 1.008 * np.pi / 2) ** 2
             / np.cos(0.008 / 1.008 * np.pi / 2) ** 2),
        rtol=1e-10,
    )


def test_linear_schedule_scale_invariance():
    b1000 = get_named_beta_schedule("linear", 1000)
    np.testing.assert_allclose(b1000[0], 1e-4)
    np.testing.assert_allclose(b1000[-1], 0.02)
    b100 = get_named_beta_schedule("linear", 100)
    np.testing.assert_allclose(b100[0], 1e-3)


def test_space_timesteps_ddim_and_sections():
    assert space_timesteps(1000, "ddim100") == set(range(0, 1000, 10))
    s = space_timesteps(1000, [100])
    assert len(s) == 100 and 0 in s and 999 in s


def test_respace_betas_identity():
    betas = get_named_beta_schedule("cosine", 1000)
    new_betas, tmap = respace_betas(betas, range(1000))
    np.testing.assert_allclose(new_betas, betas, rtol=1e-12)
    np.testing.assert_array_equal(tmap, np.arange(1000))


def test_respaced_alphas_cumprod_subset():
    betas = get_named_beta_schedule("cosine", 1000)
    keep = sorted(space_timesteps(1000, [100]))
    new_betas, tmap = respace_betas(betas, keep)
    full_ac = np.cumprod(1 - betas)
    new_ac = np.cumprod(1 - new_betas)
    np.testing.assert_allclose(new_ac, full_ac[np.array(keep)], rtol=1e-10)
    np.testing.assert_array_equal(tmap, np.array(keep))


def test_q_sample_statistics():
    d = make_diffusion()
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 8, 16))
    noise = jax.random.normal(key, x0.shape)
    t = jnp.array([0, 10, 500, 999])
    xt = d.q_sample(x0, t, noise)
    expected = (np.asarray(d.sqrt_alphas_cumprod)[np.asarray(t)][:, None, None]
                * np.asarray(x0)
                + np.asarray(d.sqrt_one_minus_alphas_cumprod)[np.asarray(t)][:, None, None]
                * np.asarray(noise))
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-5)


def test_posterior_coefficients_match_numpy():
    # independent float64 recomputation of the posterior q(x_{t-1} | x_t, x_0)
    d = make_diffusion()
    betas = get_named_beta_schedule("cosine", 1000)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    coef1 = betas * np.sqrt(ac_prev) / (1.0 - ac)
    coef2 = (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)
    var = betas * (1.0 - ac_prev) / (1.0 - ac)
    np.testing.assert_allclose(np.asarray(d.posterior_mean_coef1), coef1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.posterior_mean_coef2), coef2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.posterior_variance), var, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d.posterior_log_variance_clipped),
        np.log(np.append(var[1], var[1:])), rtol=1e-5)
    # at t=0 the posterior mean IS x0 (coef1[0] == 1, coef2[0] == 0)
    np.testing.assert_allclose(coef1[0], 1.0, rtol=1e-12)
    np.testing.assert_allclose(coef2[0], 0.0, atol=1e-12)


def test_p_mean_variance_perfect_model_recovers_posterior():
    d = make_diffusion()
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 6))
    t = jnp.array([400, 400])
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    xt = d.q_sample(x0, t, noise)
    out = d.p_mean_variance(lambda x, ts: x0, xt, t)
    ref_mean, _, ref_logvar = d.q_posterior_mean_variance(x0, xt, t)
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(ref_mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["log_variance"]),
                               np.asarray(ref_logvar), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0), rtol=1e-6)


def test_epsilon_parameterization_consistency():
    d = GaussianDiffusion.create_named(schedule_name="cosine", steps=100,
                                       predict_xstart=False)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (2, 6))
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.array([50, 80])
    xt = d.q_sample(x0, t, noise)
    # a model that predicts the true eps recovers the true x0
    out = d.p_mean_variance(lambda x, ts: noise, xt, t)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_inpainting_override_in_p_mean_variance():
    d = make_diffusion()
    x = jnp.zeros((2, 4))
    t = jnp.array([10, 10])
    gt = jnp.full((2, 4), 7.0)
    mask = jnp.array([[True, True, False, False]] * 2)
    out = d.p_mean_variance(lambda xx, ts: jnp.full_like(xx, -1.0), x, t,
                            inpaint=Inpaint(mask=mask, motion=gt))
    px = np.asarray(out["pred_xstart"])
    np.testing.assert_allclose(px[:, :2], 7.0)
    np.testing.assert_allclose(px[:, 2:], -1.0)


def test_denoised_fn_hook_applied():
    d = make_diffusion()
    x = jnp.zeros((2, 4))
    t = jnp.array([5, 5])
    out = d.p_mean_variance(lambda xx, ts: jnp.ones_like(xx), x, t,
                            denoised_fn=lambda x0, tt: x0 * 3.0)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), 3.0)


def test_p_sample_loop_inpainting_exact_at_end():
    # with START_X + inpainting, the final sample's masked region equals gt:
    # at t=0 the posterior mean IS pred_xstart and no noise is added.
    d = make_diffusion(steps=50)
    gt = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32))
    mask = jnp.zeros((3, 8), bool).at[:, :4].set(True)
    model = lambda x, ts: jnp.tanh(x)  # arbitrary bounded "denoiser"
    out = d.p_sample_loop(model, jax.random.PRNGKey(0), (3, 8),
                          inpaint=Inpaint(mask=mask, motion=gt))
    np.testing.assert_allclose(np.asarray(out)[:, :4], np.asarray(gt)[:, :4], atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_under_jit_and_respacing():
    d = make_diffusion(steps=1000, respacing=[100])
    assert d.num_timesteps == 100
    model = lambda x, ts: x * 0.0  # predicts x0 = 0 everywhere
    fn = jax.jit(lambda key: d.p_sample_loop(model, key, (2, 6)))
    out = np.asarray(fn(jax.random.PRNGKey(0)))
    # all mass contracts toward 0 as x0-pred is 0
    assert np.abs(out).mean() < 0.2
    # model sees original-scale timesteps via the map
    seen = []
    def spy(x, ts):
        seen.append(ts)
        return x * 0.0
    d.p_sample_loop(spy, jax.random.PRNGKey(0), (1, 2))  # traced once
    assert len(seen) >= 1


def test_training_losses_returns_pair():
    d = make_diffusion(steps=100)
    x0 = jnp.ones((4, 6))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 1, 2, 3])
    out, target = d.training_losses(lambda x, ts: x * 2.0, x0, t, noise=noise)
    np.testing.assert_allclose(np.asarray(target), np.asarray(x0))
    assert out.shape == x0.shape


def test_training_losses_inpaints_xt():
    d = make_diffusion(steps=100)
    x0 = jnp.zeros((2, 4))
    noise = jnp.ones_like(x0) * 5.0
    gt = jnp.full_like(x0, -9.0)
    mask = jnp.ones_like(x0, dtype=bool)
    seen = {}
    def model(x, ts):
        seen["x"] = x
        return x
    d.training_losses(model, x0, jnp.array([50, 50]), noise=noise,
                      inpaint=Inpaint(mask=mask, motion=gt))
    np.testing.assert_allclose(np.asarray(seen["x"]), -9.0)


def test_ddim_deterministic_when_eta_zero():
    d = make_diffusion(steps=50)
    model = lambda x, ts: jnp.tanh(x)
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6)).astype(np.float32))
    a = d.ddim_sample_loop(model, jax.random.PRNGKey(0), noise=noise)
    b = d.ddim_sample_loop(model, jax.random.PRNGKey(42), noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_uniform_sampler_bounds():
    s = UniformSampler(1000)
    t, w = s.sample(jax.random.PRNGKey(0), 512)
    t = np.asarray(t)
    assert t.min() >= 0 and t.max() < 1000
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_second_moment_resampler_updates():
    from interdiff_tpu.diffusion import LossSecondMomentResampler
    r = LossSecondMomentResampler(10, history_per_term=3)
    st = r.init_state()
    ts = jnp.array([0, 0, 0, 1])
    losses = jnp.array([1.0, 2.0, 3.0, 4.0])
    st = r.update(st, ts, losses)
    hist = np.asarray(st.loss_history)
    np.testing.assert_allclose(hist[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(hist[1], [4.0, 0.0, 0.0])
    # overflow shifts left
    st = r.update(st, jnp.array([0]), jnp.array([9.0]))
    np.testing.assert_allclose(np.asarray(st.loss_history)[0], [2.0, 3.0, 9.0])
