"""Gaussian diffusion engine as pure JAX functions over a precomputed schedule.

Behavioural contract is the reference DDPM engine
(`interdiff/diffusion/gaussian_diffusion.py`, itself a guided-diffusion
descendant) with the two InterDiff modifications:

  * **observation inpainting** — when an ``Inpaint(mask, motion)`` is given,
    the model's x0 prediction is overwritten on masked (past) elements both in
    ``p_mean_variance`` (ref `:307-311`) and in ``training_losses`` on x_t
    (ref `:1264-1268`);
  * **denoised_fn hook** — an arbitrary function applied to the x0 prediction
    before the posterior mean is formed (ref `:354-360`); InterDiff injects
    the physics-informed `ObjProjector` here.

TPU-native redesign: schedules are float64 numpy at construction and float32
device constants afterwards; the full reverse process is one ``lax.scan``
(no Python loop over 1000 steps), with the correction hook compiled into the
scan body behind ``lax.cond``.  Respacing (``interdiff/diffusion/respace.py``)
is folded into the schedule itself via ``timestep_map``.
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from interdiff_tpu.diffusion import schedule as sched_lib
from interdiff_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class Inpaint(NamedTuple):
    """Observation inpainting: ``mask`` True means "use ground truth"."""

    mask: jax.Array  # bool, same shape as x
    motion: jax.Array  # same shape as x


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """arr[t] broadcast to an ndim-dimensional tensor with batch leading."""
    out = arr[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


@struct.dataclass
class GaussianDiffusion:
    # device constants (all [num_timesteps])
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    fixed_large_variance: jax.Array
    fixed_large_log_variance: jax.Array
    timestep_map: jax.Array  # [num_timesteps] int32; identity when not respaced

    # static configuration
    model_mean_type: ModelMeanType = struct.field(pytree_node=False, default=ModelMeanType.START_X)
    model_var_type: ModelVarType = struct.field(pytree_node=False, default=ModelVarType.FIXED_SMALL)
    num_timesteps: int = struct.field(pytree_node=False, default=1000)
    original_num_steps: int = struct.field(pytree_node=False, default=1000)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def create(cls, betas: np.ndarray, *,
               model_mean_type: ModelMeanType = ModelMeanType.START_X,
               model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
               rescale_timesteps: bool = False,
               timestep_map: Optional[np.ndarray] = None,
               original_num_steps: Optional[int] = None) -> "GaussianDiffusion":
        betas = np.array(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        T = betas.shape[0]

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:]))

        fixed_large_variance = np.append(posterior_variance[1], betas[1:])

        if timestep_map is None:
            timestep_map = np.arange(T, dtype=np.int32)
        if original_num_steps is None:
            original_num_steps = T

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            alphas_cumprod_next=f32(alphas_cumprod_next),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
            fixed_large_variance=f32(fixed_large_variance),
            fixed_large_log_variance=f32(np.log(fixed_large_variance)),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
            model_mean_type=model_mean_type,
            model_var_type=model_var_type,
            num_timesteps=T,
            original_num_steps=int(original_num_steps),
            rescale_timesteps=rescale_timesteps,
        )

    @classmethod
    def create_named(cls, *, schedule_name: str = "cosine", steps: int = 1000,
                     timestep_respacing: str | list | None = None,
                     predict_xstart: bool = True, sigma_small: bool = True,
                     learn_sigma: bool = False,
                     rescale_timesteps: bool = False,
                     scale_beta: float = 1.0) -> "GaussianDiffusion":
        """Factory matching `interdiff/model/diffusion_smpl.py:251-284`."""
        betas = sched_lib.get_named_beta_schedule(schedule_name, steps, scale_beta)
        if not timestep_respacing:
            timestep_respacing = [steps]
        use_ts = sched_lib.space_timesteps(steps, timestep_respacing)
        betas, timestep_map = sched_lib.respace_betas(betas, sorted(use_ts))
        mean_type = ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
        if learn_sigma:
            var_type = ModelVarType.LEARNED_RANGE
        else:
            var_type = ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE
        return cls.create(betas, model_mean_type=mean_type, model_var_type=var_type,
                          rescale_timesteps=rescale_timesteps,
                          timestep_map=timestep_map, original_num_steps=steps)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    @staticmethod
    def masked_l2(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
        """Mask-normalised squared error per sample
        (`gaussian_diffusion.py:201-214`): a/b [B, J, Jdim, T], mask
        [B, 1, 1, T]; -> sum((a-b)^2 * mask) / (sum(mask) * J * Jdim)."""
        axes = tuple(range(1, a.ndim))
        loss = jnp.sum((a - b) ** 2 * mask, axis=axes)
        n_entries = a.shape[1] * a.shape[2]
        non_zero = jnp.sum(mask, axis=axes) * n_entries
        return loss / jnp.maximum(non_zero, 1.0)

    # ------------------------------------------------------------------
    # timestep handling
    # ------------------------------------------------------------------
    def model_timesteps(self, t: jax.Array) -> jax.Array:
        """Timesteps as seen by the model (respacing map + optional rescale)."""
        new_ts = self.timestep_map[t]
        if self.rescale_timesteps:
            return new_ts.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return new_ts

    # ------------------------------------------------------------------
    # forward process q
    # ------------------------------------------------------------------
    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = _extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = _extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (_extract(self.sqrt_alphas_cumprod, t, nd) * x_start
                + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        nd = x_t.ndim
        posterior_mean = (_extract(self.posterior_mean_coef1, t, nd) * x_start
                          + _extract(self.posterior_mean_coef2, t, nd) * x_t)
        posterior_variance = _extract(self.posterior_variance, t, nd)
        posterior_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------
    # predictions
    # ------------------------------------------------------------------
    def predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (_extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps)

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (_extract(1.0 / self.posterior_mean_coef1, t, nd) * xprev
                - _extract(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd) * x_t)

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return ((_extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart)
                / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd))

    # ------------------------------------------------------------------
    # reverse process p
    # ------------------------------------------------------------------
    def p_mean_variance(self, model_fn: Callable, x, t, *,
                        clip_denoised: bool = False,
                        denoised_fn: Optional[Callable] = None,
                        inpaint: Optional[Inpaint] = None):
        """Model posterior p(x_{t-1} | x_t) plus the x0 prediction.

        ``model_fn(x, model_ts) -> model_output`` (x0 or eps prediction; with
        learned variance the channel axis 1 carries [pred, var_values]).
        ``denoised_fn(x0hat, t) -> x0hat`` is the correction hook.
        """
        nd = x.ndim
        model_output = model_fn(x, self.model_timesteps(t))

        if inpaint is not None:
            assert self.model_mean_type == ModelMeanType.START_X
            model_output = jnp.where(inpaint.mask, inpaint.motion, model_output)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            C = x.shape[1]
            model_output, model_var_values = jnp.split(model_output, [C], axis=1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t, nd)
                max_log = _extract(jnp.log(self.betas), t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _extract(self.fixed_large_variance, t, nd)
            model_log_variance = _extract(self.fixed_large_log_variance, t, nd)
        else:  # FIXED_SMALL
            model_variance = _extract(self.posterior_variance, t, nd)
            model_log_variance = _extract(self.posterior_log_variance_clipped, t, nd)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0, t)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self.predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:  # EPSILON
            pred_xstart = process_xstart(self.predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # -- classifier guidance ------------------------------------------------
    #
    # Design note — the reference's ``*_with_grad`` family
    # (`gaussian_diffusion.py:433-494,550-596,790-845`:
    # `condition_mean_with_grad`, `condition_score_with_grad`,
    # `p_sample_with_grad`, `ddim_sample_with_grad`) exists only because
    # torch requires a separate code path to re-enable autograd through a
    # sampling step (`th.enable_grad()` + passing `p_mean_var['out']` so the
    # graph isn't detached).  In JAX differentiation is a program transform:
    # `jax.grad` through `p_sample`/`ddim_sample`/`condition_*` below already
    # yields exactly what the `_with_grad` variants compute, so the family
    # deliberately collapses into the plain methods here (no separate API).
    def condition_mean(self, cond_fn, p_mean_var, x, t):
        """Sohl-Dickstein-style mean shift (`gaussian_diffusion.py:418-431`)."""
        gradient = cond_fn(x, self.model_timesteps(t))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t):
        """Song-style score conditioning (`gaussian_diffusion.py:448-470`)."""
        nd = x.ndim
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        eps = self.predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, self.model_timesteps(t))
        out = dict(p_mean_var)
        out["pred_xstart"] = self.predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # -- ancestral sampling --------------------------------------------------
    def p_sample(self, model_fn, x, t, key, *, clip_denoised=False,
                 denoised_fn=None, cond_fn=None, inpaint=None,
                 const_noise=False, noise=None):
        """One ancestral step (ref `:496-549`).  ``noise`` overrides the
        random draw — used for deterministic replay / differential tests."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn, inpaint=inpaint)
        if noise is None:
            noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        if const_noise:
            noise = jnp.broadcast_to(noise[:1], noise.shape)
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        mean = out["mean"]
        if cond_fn is not None:
            mean = self.condition_mean(cond_fn, out, x, t)
        sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(self, model_fn, key, shape=None, *, noise=None,
                      clip_denoised=False, denoised_fn=None, cond_fn=None,
                      inpaint: Optional[Inpaint] = None, const_noise=False,
                      skip_timesteps: int = 0, init_image=None,
                      step_noise=None, unroll: int = 1):
        """Full reverse process as a single ``lax.scan`` (ref `:598-736`).

        Semantics note kept from the reference: when ``noise`` is supplied the
        initial inpainting overwrite is *not* applied (the eval harnesses pass
        explicit noise, ref `eval_smpl_short.py:152-153`); with generated noise
        it is (`gaussian_diffusion.py:694-699`).

        ``skip_timesteps`` reproduces the reference DDPM loop's semantics
        (`:704` — indices run ``T-1 .. skip``, i.e. the chain stops early at
        t=skip; NB the reference's DDIM/PLMS loops instead run
        ``T-skip-1 .. 0``), with ``init_image`` q-sampled at ``indices[0]``.
        ``step_noise`` ([num_steps, *shape]) overrides the per-step Gaussian
        draws for deterministic replay / differential testing against the
        torch engine (verified in tests/test_reference_parity.py).
        """
        if noise is None:
            key, k_init = jax.random.split(key)
            img = jax.random.normal(k_init, shape, dtype=jnp.float32)
            if inpaint is not None:
                img = jnp.where(inpaint.mask, inpaint.motion, img)
        else:
            img = noise
            shape = noise.shape

        indices = jnp.arange(self.num_timesteps)[skip_timesteps:][::-1]
        if init_image is None and skip_timesteps:
            init_image = jnp.zeros_like(img)
        if init_image is not None:
            my_t = jnp.full((shape[0],), int(indices[0]), dtype=jnp.int32)
            img = self.q_sample(init_image, my_t, img)

        def step(carry, xs):
            i, n = xs
            x, k = carry
            k, k_step = jax.random.split(k)
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            out = self.p_sample(model_fn, x, t, k_step,
                                clip_denoised=clip_denoised,
                                denoised_fn=denoised_fn, cond_fn=cond_fn,
                                inpaint=inpaint, const_noise=const_noise,
                                noise=n)
            return (out["sample"], k), None

        if step_noise is None:
            def step_rand(carry, i):
                return step(carry, (i, None))

            (img, _), _ = jax.lax.scan(step_rand, (img, key), indices,
                                       unroll=unroll)
        else:
            (img, _), _ = jax.lax.scan(step, (img, key),
                                       (indices, step_noise), unroll=unroll)
        return img

    # -- DDIM -----------------------------------------------------------------
    def ddim_sample(self, model_fn, x, t, key, *, clip_denoised=False,
                    denoised_fn=None, cond_fn=None, inpaint=None, eta=0.0):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn, inpaint=inpaint)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        nd = x.ndim
        eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, nd)
        sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                 * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
                     + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps)
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(self, model_fn, key, shape=None, *, noise=None,
                         clip_denoised=False, denoised_fn=None, cond_fn=None,
                         inpaint=None, eta=0.0):
        if noise is None:
            key, k_init = jax.random.split(key)
            img = jax.random.normal(k_init, shape, dtype=jnp.float32)
            if inpaint is not None:
                img = jnp.where(inpaint.mask, inpaint.motion, img)
        else:
            img = noise
            shape = noise.shape

        def step(carry, i):
            x, k = carry
            k, k_step = jax.random.split(k)
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            out = self.ddim_sample(model_fn, x, t, k_step,
                                   clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn, cond_fn=cond_fn,
                                   inpaint=inpaint, eta=eta)
            return (out["sample"], k), None

        indices = jnp.arange(self.num_timesteps)[::-1]
        (img, _), _ = jax.lax.scan(step, (img, key), indices)
        return img

    def ddim_reverse_sample(self, model_fn, x, t, *, clip_denoised=False,
                            denoised_fn=None):
        """Deterministic encoding x_t -> x_{t+1} (ODE forward), contract of
        `gaussian_diffusion.py:847-884` (eta must be 0)."""
        out = self.p_mean_variance(model_fn, x, t, clip_denoised=clip_denoised,
                                   denoised_fn=denoised_fn)
        nd = x.ndim
        eps = ((_extract(self.sqrt_recip_alphas_cumprod, t, nd) * x
                - out["pred_xstart"])
               / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd))
        alpha_bar_next = _extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
                     + jnp.sqrt(1 - alpha_bar_next) * eps)
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # -- PLMS (pseudo linear multistep, `gaussian_diffusion.py:1001-1196`) ----
    def plms_sample_loop(self, model_fn, key, shape=None, *, noise=None,
                         clip_denoised=False, denoised_fn=None,
                         inpaint: Optional[Inpaint] = None, order: int = 2):
        """PLMS sampling as one ``lax.scan`` carrying the eps history.

        Step 0 uses the Pseudo Improved Euler warm-up (two model calls);
        later steps use the Adams-Bashforth combination of up to ``order``
        stored eps predictions — semantics of the reference's
        ``plms_sample`` (`:1001-1084`).
        """
        assert 1 <= order <= 4, "order must be 1..4"
        if noise is None:
            key, k_init = jax.random.split(key)
            img = jax.random.normal(k_init, shape, dtype=jnp.float32)
            if inpaint is not None:
                img = jnp.where(inpaint.mask, inpaint.motion, img)
        else:
            img = noise
            shape = noise.shape
        nd = img.ndim

        def model_eps(x, t):
            out = self.p_mean_variance(model_fn, x, t,
                                       clip_denoised=clip_denoised,
                                       denoised_fn=denoised_fn,
                                       inpaint=inpaint)
            eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
            return eps, out["pred_xstart"]

        # Adams-Bashforth coefficients, rows indexed by cur_order-1; columns
        # weight old_eps[-1], old_eps[-2], ... (newest first)
        ab = jnp.asarray([
            [1.0, 0.0, 0.0, 0.0],
            [3 / 2, -1 / 2, 0.0, 0.0],
            [23 / 12, -16 / 12, 5 / 12, 0.0],
            [55 / 24, -59 / 24, 37 / 24, -9 / 24],
        ], dtype=jnp.float32)

        def step(carry, idx):
            x, hist, count = carry  # hist: [order, *shape] newest at slot 0
            i = idx
            t = jnp.full((shape[0],), i, dtype=jnp.int32)
            eps, x0 = model_eps(x, t)
            alpha_bar_prev = _extract(self.alphas_cumprod_prev, t, nd)

            def euler_warmup(_):
                mean1 = (x0 * jnp.sqrt(alpha_bar_prev)
                         + jnp.sqrt(1 - alpha_bar_prev) * eps)
                eps2, _ = model_eps(mean1, jnp.maximum(t - 1, 0))
                return (eps + eps2) / 2.0

            def adams(_):
                cur = jnp.minimum(count + 1, order)
                w = ab[cur - 1]  # [4]
                acc = w[0] * eps
                for k in range(1, order):
                    acc = acc + w[k] * hist[k - 1]
                return acc

            use_warmup = jnp.logical_and(count == 0, order > 1)
            eps_prime = jax.lax.cond(use_warmup, euler_warmup, adams,
                                     operand=None)
            pred_prime = self.predict_xstart_from_eps(x, t, eps_prime)
            mean_pred = (pred_prime * jnp.sqrt(alpha_bar_prev)
                         + jnp.sqrt(1 - alpha_bar_prev) * eps_prime)
            nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
            sample = mean_pred * nonzero + x0 * (1 - nonzero)

            new_hist = (jnp.concatenate([eps[None], hist[:-1]], axis=0)
                        if order > 1 else hist)
            return (sample, new_hist, count + 1), None

        hist0 = jnp.zeros((max(order - 1, 1),) + tuple(shape), jnp.float32)
        indices = jnp.arange(self.num_timesteps)[::-1]
        (img, _, _), _ = jax.lax.scan(
            step, (img, hist0, jnp.asarray(0, jnp.int32)), indices)
        return img

    # -- training --------------------------------------------------------------
    def training_losses(self, model_fn, x_start, t, *, noise,
                        inpaint: Optional[Inpaint] = None):
        """Return ``(model_output, target)`` exactly like the modified reference
        (`gaussian_diffusion.py:1233-1368` returns the pair instead of a loss
        dict; the 16-term weighted loss lives in the trainers)."""
        x_t = self.q_sample(x_start, t, noise)
        if inpaint is not None:
            assert self.model_mean_type == ModelMeanType.START_X
            x_t = jnp.where(inpaint.mask, inpaint.motion, x_t)
        model_output = model_fn(x_t, self.model_timesteps(t))
        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
        elif self.model_mean_type == ModelMeanType.START_X:
            target = x_start
        else:
            target = noise
        return model_output, target

    # -- variational bound (diagnostics) ----------------------------------------
    def vb_terms_bpd(self, model_fn, x_start, x_t, t, *, clip_denoised=False):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / jnp.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
        decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def prior_bpd(self, x_start):
        """Prior KL term of the VLB in bits-per-dim, [B]
        (`gaussian_diffusion.py:1535-1551` ``_prior_bpd``)."""
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / jnp.log(2.0)

    def calc_bpd_loop(self, model_fn, x_start, key=None, *,
                      clip_denoised=False, step_noise=None):
        """Full variational lower-bound sweep as one ``lax.scan``
        (`gaussian_diffusion.py:1553-1609` ``calc_bpd_loop``).

        One model call per timestep on a fresh ``q_sample`` draw; returns
        ``{total_bpd [B], prior_bpd [B], vb [B,T], xstart_mse [B,T],
        mse [B,T]}`` with column ``j`` of the per-step tensors holding
        timestep ``T-1-j`` (the reference appends from t=T-1 downwards).
        ``step_noise`` ([T, *x_start.shape], ordered t=T-1..0) overrides the
        per-step draws for deterministic replay / differential testing.
        """
        B = x_start.shape[0]
        indices = jnp.arange(self.num_timesteps)[::-1]

        def body(x_t, t, noise):
            out = self.vb_terms_bpd(model_fn, x_start, x_t, t,
                                    clip_denoised=clip_denoised)
            xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
            eps = self.predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            mse = mean_flat((eps - noise) ** 2)
            return out["output"], xstart_mse, mse

        if step_noise is None:
            if key is None:
                raise ValueError("calc_bpd_loop needs `key` or `step_noise`")

            def step(k, i):
                k, k_step = jax.random.split(k)
                t = jnp.full((B,), i, dtype=jnp.int32)
                noise = jax.random.normal(k_step, x_start.shape,
                                          x_start.dtype)
                return k, body(self.q_sample(x_start, t, noise), t, noise)

            _, (vb, xstart_mse, mse) = jax.lax.scan(step, key, indices)
        else:
            def step_det(carry, xs):
                i, noise = xs
                t = jnp.full((B,), i, dtype=jnp.int32)
                return carry, body(self.q_sample(x_start, t, noise), t, noise)

            _, (vb, xstart_mse, mse) = jax.lax.scan(
                step_det, None, (indices, step_noise))

        vb, xstart_mse, mse = vb.T, xstart_mse.T, mse.T  # [B, T]
        prior = self.prior_bpd(x_start)
        return {"total_bpd": vb.sum(axis=1) + prior, "prior_bpd": prior,
                "vb": vb, "xstart_mse": xstart_mse, "mse": mse}
