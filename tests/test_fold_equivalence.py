"""Best-of-N protocol: the diverse-FOLD fast layout == sequential best-of-N.

The reference evaluates best-of-`diverse_samples` with a Python loop of
single-sample calls and a per-metric elementwise min
(`reference/interdiff/eval_smpl_short.py:275-296`); our CLI folds N into the
batch axis (`cli/eval_smpl_short.py --diverse_fold`,
`parallel/sample_parallel.py`).  This pins the two layouts equal EXACTLY —
same per-sample noise injected through `p_sample_loop(noise=, step_noise=)`
— across fold widths, through the real pipeline: tiled conditioning memory,
reverse-diffusion scan, FK postprocess, `smpl_metrics`, split + min
reduction and the running min across fold chunks.  Sample i of clip b sits
at row i*B+b of a tiled call (`tile_for_diverse_samples`), so fold f chunk j
carries samples j*f..(j+1)*f-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interdiff_tpu.cli.common import synthetic_smpl_body
from interdiff_tpu.diffusion.gaussian import GaussianDiffusion, Inpaint
from interdiff_tpu.eval.metrics import smpl_metrics
from interdiff_tpu.eval.smpl_short import SmplEvalConfig, postprocess_sample
from interdiff_tpu.models.mdm_smpl import MDMSmpl
from interdiff_tpu.parallel.sample_parallel import (
    best_of_n_metrics,
    tile_for_diverse_samples,
)

B, N, P, V, STEPS = 2, 4, 16, 48, 4
PAST, FUT = 3, 4
T = PAST + FUT


@pytest.fixture(scope="module")
def pipeline():
    rng = np.random.default_rng(233)
    cfg = SmplEvalConfig(past_len=PAST, future_len=FUT)
    smpl = synthetic_smpl_body(rng, num_verts=V)
    model = MDMSmpl(embed_dim=32, num_heads=4, ff_size=32, num_layers=2,
                    past_len=PAST, future_len=FUT, use_pointnet2=False)
    diffusion = GaussianDiffusion.create_named(
        steps=1000, timestep_respacing=str(STEPS))

    gt = jnp.asarray(rng.standard_normal((B, T, 144)), jnp.float32)
    obj_points6 = jnp.asarray(rng.standard_normal((B, P, 6)), jnp.float32)
    hand = jnp.asarray(0.1 * rng.standard_normal((B, T, 90)), jnp.float32)
    betas = jnp.asarray(rng.standard_normal((B, T, 10)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), gt, obj_points6,
                        jnp.zeros((B,), jnp.int32),
                        method=MDMSmpl.init_forward)
    memory = model.apply(params, gt, obj_points6, method=MDMSmpl.encode)

    # one shared noise budget: sample i of clip b always consumes
    # init_noise[i, b] and step_noise[:, i, b], whatever the fold width
    init_noise = jnp.asarray(rng.standard_normal((N, B, T, 144)), jnp.float32)
    step_noise = jnp.asarray(
        rng.standard_normal((STEPS, N, B, T, 144)), jnp.float32)

    faces = jnp.asarray(smpl.faces)

    def run_fold(f: int):
        """The CLI inner loop (`cli/eval_smpl_short.py:262-281`) at fold f;
        -> (best-of-N metric dict [B], per-chunk pre-min metrics [f,B])."""
        per_sample = []
        gt_t, hand_t, betas_t, mem_t, pts_t = (
            tile_for_diverse_samples(a, f)
            for a in (gt, hand, betas, memory, obj_points6))
        mask_t = jnp.zeros_like(gt_t, bool).at[:, :PAST].set(True)
        gt_post = postprocess_sample(cfg, smpl, gt_t, hand_t, betas_t)

        def model_fn(x, ts):
            return model.apply(params, x, ts, mem_t)

        best = None
        for j in range(N // f):
            rows = init_noise[j * f:(j + 1) * f].reshape(f * B, T, 144)
            srows = step_noise[:, j * f:(j + 1) * f].reshape(
                STEPS, f * B, T, 144)
            x = diffusion.p_sample_loop(
                model_fn, jax.random.PRNGKey(7), noise=rows,
                step_noise=srows, inpaint=Inpaint(mask_t, gt_t))
            out = postprocess_sample(cfg, smpl, x, hand_t, betas_t)
            m = smpl_metrics(
                out["obj_pred"][:, PAST:], out["jtr"][:, PAST:],
                out["body_pred"][:, PAST:], gt_post["obj_pred"][:, PAST:],
                gt_post["jtr"][:, PAST:], gt_post["body_pred"][:, PAST:],
                out["verts"][:, PAST:], faces, pts_t[..., :3])
            per_sample.append({k: np.asarray(v).reshape(f, B)
                               for k, v in m.items()})
            m = best_of_n_metrics(m, f)
            best = m if best is None else {
                k: jnp.minimum(best[k], m[k]) for k in m}
        return {k: np.asarray(v) for k, v in best.items()}, per_sample

    return run_fold


def test_diverse_fold_equals_sequential(pipeline):
    """fold widths 1 (the reference's sequential loop), 2 (the production
    default) and 4 (one call) give identical best-of-N metrics under the
    same per-sample noise."""
    seq, _ = pipeline(1)
    assert set(seq) == {"global_mpjpe", "local_mpjpe", "body_translation",
                        "obj_translation", "obj_rot_error", "penetrate"}
    for f in (2, 4):
        folded, _ = pipeline(f)
        for k in seq:
            # not bit-identical: XLA fuses/vectorises reductions differently
            # per batch size (observed drift ~1e-6 in f32)
            np.testing.assert_allclose(folded[k], seq[k], rtol=0, atol=1e-5,
                                       err_msg=f"fold={f} metric {k}")


def test_fold_min_reduces_over_all_samples(pipeline):
    """The reduction really is a min over all N samples (`min(dim=0)` per
    metric, ref `eval_smpl_short.py:291-296`): the samples produce distinct
    metric values (so the min is non-trivial) and the reported best equals
    the elementwise min over the 4 per-sample vectors."""
    best, chunks = pipeline(4)
    for k in best:
        stacked = chunks[0][k]  # [N, B] — fold=4 runs one chunk
        if k == "penetrate":
            # penetrate saturates at a legitimate 0.0 for clips whose
            # samples never intersect the body — since round 5 the pruned
            # sweep reports an exact 0 there instead of far-point sign
            # noise, so require spread in SOME clip rather than every clip
            assert np.ptp(stacked, axis=0).max() > 0, \
                f"{k}: degenerate samples"
        else:
            assert np.ptp(stacked, axis=0).min() > 0, \
                f"{k}: degenerate samples"
        np.testing.assert_allclose(best[k], stacked.min(axis=0), rtol=0,
                                   atol=0)
