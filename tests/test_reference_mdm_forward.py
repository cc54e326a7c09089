"""Full-module MDM forward parity vs the ACTUAL reference torch `MDM`
(both tracks), plus the checkpoint-conversion round trip.

The reference modules (`reference/interdiff/model/diffusion_smpl.py:8-246`,
`diffusion_skeleton.py:7-257`) are instantiated on CPU torch with their pip
deps supplied as sys.modules stubs, initialised randomly, and their
state_dicts converted through `utils/checkpoint.convert_mdm_*` — so every
wire of `_get_embeddings` / `forward` / `_decode` (rot6d packing order,
past-window encoding + pc/shape token broadcast, PositionalEncoding +
TimestepEmbedder interplay, mask_cond, `latent_usage='memory'` cross-attn
decoder, output heads, the skeleton `calc_obj_pred` rigid re-derivation with
the xyzw->wxyz flip at `diffusion_skeleton.py:225`) is pinned at production
size (d_model 256, 8+8 layers).

Object-cloud embedding caveat: the reference's `use_pointnet2=0` branch
builds `Linear(6, E)` (`diffusion_smpl.py:14`) but `_get_embeddings` always
feeds it 4 channels (`[xyz | ||xyz||]`, `:210`) — the flag is shipped broken
and crashes in torch.  To pin the *rest* of the encoder path we re-bind the
instance's `pcEmbedding` to a (seeded) `Linear(4, E)` and use a single
object point so the reference's `.view(1, B, -1)` produces one [1,B,E]
token; our converter + Linear fallback consume the same weights verbatim.

The checkpoint round-trip test writes a real Lightning-layout `.ckpt`
(state_dict under `model.` + hyper_parameters, as `LitInteraction` saves,
`train_diffusion_smpl.py:32,40`) and loads it back through
`mdm_smpl_from_checkpoint`, which must also select parity-mode FPS
(`fps_groups=1`) for pointnet2-trained checkpoints.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import vendor_local_attention as _vla  # noqa: E402  (tests dir)
import vendor_pytorch3d_transforms as _vp3d  # noqa: E402

# --- sys.modules stubs for the reference's native/pip deps -----------------
_la = types.ModuleType("local_attention")
_la.LocalAttention = _vla.LocalAttention
sys.modules.setdefault("local_attention", _la)

_tv = types.ModuleType("torchvision")
_tv_ops = types.ModuleType("torchvision.ops")
_tv_ops.stochastic_depth = lambda x, p, mode, training=True: x
_tv.ops = _tv_ops
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv_ops)

_p2 = types.ModuleType("pointnet2_ops")
_p2m = types.ModuleType("pointnet2_ops.pointnet2_modules")
_p2m.PointnetSAModuleMSG = type("PointnetSAModuleMSG", (), {})
_p2.pointnet2_modules = _p2m
sys.modules.setdefault("pointnet2_ops", _p2)
sys.modules.setdefault("pointnet2_ops.pointnet2_modules", _p2m)

_p3 = types.ModuleType("pytorch3d")
_p3t = types.ModuleType("pytorch3d.transforms")
for _name in ("axis_angle_to_matrix", "matrix_to_rotation_6d",
              "quaternion_to_matrix", "rotation_6d_to_matrix",
              "matrix_to_quaternion"):
    setattr(_p3t, _name, getattr(_vp3d, _name))
_p3.transforms = _p3t
sys.modules.setdefault("pytorch3d", _p3)
sys.modules.setdefault("pytorch3d.transforms", _p3t)

REF = "/root/reference/interdiff"
if REF not in sys.path:
    sys.path.append(REF)

import model.diffusion_skeleton as ref_mdm_skel  # noqa: E402  (reference)
import model.diffusion_smpl as ref_mdm_smpl  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from interdiff_tpu.models.mdm_skeleton import MDMSkeleton  # noqa: E402
from interdiff_tpu.models.mdm_smpl import MDMSmpl, smpl_gt_from_raw  # noqa: E402
from interdiff_tpu.utils.checkpoint import (  # noqa: E402
    convert_mdm_skeleton,
    convert_mdm_smpl,
    load_mdm_skeleton,
    mdm_smpl_from_checkpoint,
)

# production MDM hyperparameters (`train_diffusion_smpl.py:538-604`)
E, HEADS, FF_SMPL, FF_SKEL, LAYERS = 256, 4, 1024, 256, 8
PAST, FUT = 10, 25
B = 3


def _smpl_args(**over):
    d = dict(embedding_dim=E, smpl_dim=132, num_heads=HEADS, ff_size=FF_SMPL,
             dropout=0.0, activation="gelu", latent_usage="memory",
             use_pointnet2=0, past_len=PAST, future_len=FUT,
             cond_mask_prob=0.0)
    d.update(over)
    return SimpleNamespace(**d)


def _skel_args(**over):
    d = dict(embedding_dim=E, smpl_dim=63, num_joints=21, num_points=12,
             num_heads=HEADS, ff_size=FF_SKEL, dropout=0.0,
             activation="gelu", latent_usage="memory", past_len=PAST,
             cond_mask_prob=0.0)
    d.update(over)
    return SimpleNamespace(**d)


def _sd(ref):
    return {f"model.{k}": v.numpy() for k, v in ref.state_dict().items()}


@pytest.fixture(scope="module")
def smpl_pair():
    torch.manual_seed(233)
    ref = ref_mdm_smpl.MDM(_smpl_args())
    # shipped-broken Linear(6,E) path: re-bind to the 4 channels
    # `_get_embeddings` actually produces (see module docstring)
    ref.pcEmbedding = torch.nn.Linear(4, E)
    ref.eval()
    variables = convert_mdm_smpl(_sd(ref))
    ours = MDMSmpl(use_pointnet2=False)
    return ref, ours, variables


@pytest.fixture(scope="module")
def skel_pair():
    torch.manual_seed(234)
    ref = ref_mdm_skel.MDM(_skel_args())
    ref.eval()
    variables = convert_mdm_skeleton(_sd(ref))
    ours = MDMSkeleton()
    return ref, ours, variables


def _smpl_inputs(rng, T):
    body_pose = rng.standard_normal((T, B, 66)).astype(np.float32)
    body_trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_angles = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_trans = rng.standard_normal((T, B, 3)).astype(np.float32)
    obj_xyz = rng.standard_normal((B, 1, 3)).astype(np.float32)  # P=1
    return body_pose, body_trans, obj_angles, obj_trans, obj_xyz


def test_mdm_smpl_get_embeddings_parity(rng, smpl_pair):
    """`_get_embeddings` (`diffusion_smpl.py:195-223`): rot6d gt packing +
    past-window embedding + pc token + PE + full 8-layer encoder."""
    ref, ours, variables = smpl_pair
    T = PAST + FUT
    body_pose, body_trans, obj_angles, obj_trans, obj_xyz = _smpl_inputs(rng, T)

    data = {
        "frames": [{"smplfit_params": {
                        "pose": torch.from_numpy(body_pose[t]),
                        "trans": torch.from_numpy(body_trans[t])},
                    "objfit_params": {
                        "angle": torch.from_numpy(obj_angles[t]),
                        "trans": torch.from_numpy(obj_trans[t])}}
                   for t in range(T)],
        "obj_points": torch.from_numpy(obj_xyz),
    }
    with torch.no_grad():
        ref_mem, ref_gt = ref._get_embeddings(data)  # [past,B,E], [T,B,144]

    gt = smpl_gt_from_raw(
        jnp.asarray(body_pose.transpose(1, 0, 2)),
        jnp.asarray(body_trans.transpose(1, 0, 2)),
        jnp.asarray(obj_angles.transpose(1, 0, 2)),
        jnp.asarray(obj_trans.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(gt).transpose(1, 0, 2),
                               ref_gt.numpy(), atol=1e-5)

    # our Linear fallback consumes [xyz | extra-channels]; the reference
    # computes the norm channel inline (`diffusion_smpl.py:210`)
    obj_points = np.concatenate(
        [obj_xyz, np.linalg.norm(obj_xyz, axis=-1, keepdims=True)], axis=-1)
    mem = ours.apply(variables, gt, jnp.asarray(obj_points),
                     method=MDMSmpl.encode)
    np.testing.assert_allclose(np.asarray(mem).transpose(1, 0, 2),
                               ref_mem.numpy(), atol=1e-4)


def test_mdm_smpl_forward_parity(rng, smpl_pair):
    """`forward`/`_decode` (`diffusion_smpl.py:226-246`): [B,1,C,T] packing,
    timestep embedding, 8-layer cross-attn decoder, body/obj heads."""
    ref, ours, variables = smpl_pair
    T = PAST + FUT
    x = rng.standard_normal((B, T, 144)).astype(np.float32)
    mem = rng.standard_normal((PAST, B, E)).astype(np.float32)
    t = np.array([0, 499, 999], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.transpose(0, 2, 1)[:, None]),  # [B,1,144,T]
            torch.from_numpy(t),
            y={"cond": torch.from_numpy(mem)}).numpy()        # [B,1,144,T]

    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(mem.transpose(1, 0, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref_out[:, 0].transpose(0, 2, 1), atol=1e-4)


def test_mdm_skeleton_get_embeddings_parity(rng, skel_pair):
    """Skeleton `_get_embeddings` (`diffusion_skeleton.py:194-215`): 106-dim
    gt packing + shape token from the canonical zero pose."""
    ref, ours, variables = skel_pair
    T = 2 * PAST
    body_gt = rng.standard_normal((T, B, 21, 3)).astype(np.float32)
    obj_gt = rng.standard_normal((T, B, 12, 3)).astype(np.float32)
    pose_gt = rng.standard_normal((T, B, 7)).astype(np.float32)
    zero_pose = rng.standard_normal((B, 12, 3)).astype(np.float32)

    with torch.no_grad():
        ref_mem, ref_gt = ref._get_embeddings(
            torch.from_numpy(body_gt), torch.from_numpy(obj_gt),
            torch.from_numpy(pose_gt), torch.from_numpy(zero_pose))

    mem, gt = ours.apply(
        variables,
        jnp.asarray(body_gt.transpose(1, 0, 2, 3)),
        jnp.asarray(obj_gt.transpose(1, 0, 2, 3)),
        jnp.asarray(pose_gt.transpose(1, 0, 2)),
        jnp.asarray(zero_pose), method=MDMSkeleton.encode)
    np.testing.assert_allclose(np.asarray(gt).transpose(1, 0, 2),
                               ref_gt.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mem).transpose(1, 0, 2),
                               ref_mem.numpy(), atol=1e-4)


def test_mdm_skeleton_forward_parity(rng, skel_pair):
    """Skeleton `forward` (`diffusion_skeleton.py:231-257`) incl. the
    `calc_obj_pred` rigid keypoint re-derivation with the xyzw->wxyz
    quaternion flip (`:225`)."""
    ref, ours, variables = skel_pair
    T = 2 * PAST
    x = rng.standard_normal((B, T, 106)).astype(np.float32)
    mem = rng.standard_normal((PAST, B, E)).astype(np.float32)
    zero_pose = rng.standard_normal((B, 12, 3)).astype(np.float32)
    t = np.array([3, 500, 999], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.transpose(0, 2, 1)[:, None]),
            torch.from_numpy(t), torch.from_numpy(zero_pose),
            y={"cond": torch.from_numpy(mem)}).numpy()

    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(zero_pose),
                     jnp.asarray(mem.transpose(1, 0, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref_out[:, 0].transpose(0, 2, 1), atol=1e-4)


def test_mdm_smpl_force_mask_parity(rng, smpl_pair):
    """mask_cond force path (`diffusion_smpl.py:185-193`): zeroed memory ==
    classifier-free null condition on both sides."""
    ref, ours, variables = smpl_pair
    T = PAST + FUT
    x = rng.standard_normal((B, T, 144)).astype(np.float32)
    mem = rng.standard_normal((PAST, B, E)).astype(np.float32)
    t = np.zeros((B,), dtype=np.int64)

    with torch.no_grad():
        zero = ref.mask_cond(torch.from_numpy(mem), force_mask=True)
        ref_out = ref(torch.from_numpy(x.transpose(0, 2, 1)[:, None]),
                      torch.from_numpy(t), y={"cond": zero}).numpy()

    out = ours.apply(variables, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(mem.transpose(1, 0, 2)), force_mask=True)
    np.testing.assert_allclose(
        np.asarray(out), ref_out[:, 0].transpose(0, 2, 1), atol=1e-4)


# ---------------------------------------------------------------------------
# checkpoint round trip (.ckpt file -> loader -> same forward)
# ---------------------------------------------------------------------------


def test_mdm_smpl_ckpt_roundtrip(rng, smpl_pair, tmp_path):
    """A Lightning-layout .ckpt written to disk loads back through
    `mdm_smpl_from_checkpoint` and reproduces the reference forward — the
    bridge the reference's own `load_from_checkpoint` provides
    (`train_diffusion_smpl.py:625`, `eval_smpl_short.py:425`)."""
    ref, _, _ = smpl_pair
    path = tmp_path / "diffusion.ckpt"
    hp = vars(_smpl_args())
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in ref.state_dict().items()},
                "hyper_parameters": hp}, path)

    model, variables, hp_back = mdm_smpl_from_checkpoint(str(path))
    assert hp_back["smpl_dim"] == 132
    assert model.use_pointnet2 is False  # Linear-path ckpt
    assert model.fps_groups == 1  # parity mode always selects exact FPS

    T = PAST + FUT
    x = rng.standard_normal((B, T, 144)).astype(np.float32)
    mem = rng.standard_normal((PAST, B, E)).astype(np.float32)
    t = np.array([7, 42, 800], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 2, 1)[:, None]),
                      torch.from_numpy(t),
                      y={"cond": torch.from_numpy(mem)}).numpy()
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(mem.transpose(1, 0, 2)))
    np.testing.assert_allclose(
        np.asarray(out), ref_out[:, 0].transpose(0, 2, 1), atol=1e-4)


def test_cli_diffusion_ckpt_dispatch(smpl_pair, skel_pair, tmp_path):
    """`--diffusion_ckpt` accepts a reference Lightning .ckpt FILE via
    `cli/common.maybe_reference_mdm` (orbax dirs return None and follow the
    restore_params path); the returned module runs the converted tree."""
    from interdiff_tpu.cli.common import maybe_reference_mdm

    assert maybe_reference_mdm(None, "smpl") is None
    assert maybe_reference_mdm(str(tmp_path), "smpl") is None  # dir = orbax

    ref, _, _ = smpl_pair
    path = tmp_path / "diffusion.ckpt"
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in ref.state_dict().items()},
                "hyper_parameters": vars(_smpl_args())}, path)
    model, variables, hp = maybe_reference_mdm(str(path), "smpl")
    assert int(hp["past_len"]) == PAST and int(hp["future_len"]) == FUT
    x = np.zeros((1, PAST + FUT, 144), np.float32)
    out = model.apply(variables, jnp.asarray(x),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, PAST, E), jnp.float32))
    assert out.shape == (1, PAST + FUT, 144)

    ref_s, _, _ = skel_pair
    path_s = tmp_path / "diffusion_skeleton.ckpt"
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in ref_s.state_dict().items()},
                "hyper_parameters": vars(_skel_args())}, path_s)
    model_s, variables_s, _ = maybe_reference_mdm(str(path_s), "skeleton")
    assert model_s.ff_size == FF_SKEL
    out = model_s.apply(variables_s, jnp.zeros((1, 2 * PAST, 106)),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 12, 3)),
                        jnp.zeros((1, PAST, E)))
    assert out.shape == (1, 2 * PAST, 106)


def test_mdm_skeleton_ckpt_roundtrip(skel_pair, tmp_path):
    """Skeleton-track loader maps a .ckpt onto an initialisable tree."""
    import jax

    ref, ours, variables = skel_pair
    path = tmp_path / "diffusion_skeleton.ckpt"
    torch.save({"state_dict": {f"model.{k}": v
                               for k, v in ref.state_dict().items()},
                "hyper_parameters": vars(_skel_args())}, path)
    loaded, hp = load_mdm_skeleton(str(path))
    assert hp["num_points"] == 12
    jax.tree.map(np.testing.assert_array_equal,
                 loaded["params"], variables["params"])


def test_mdm_pointnet2_ckpt_structure(rng):
    """The pointnet2-flavoured converter maps the CUDA package's
    Sequential-indexed shared-MLP keys onto our PointNet2Encoder tree and
    the result initialises/apply-s (structural check — the CUDA package
    cannot run on CPU, so selection-order parity is covered separately by
    `tests/test_pointcloud.py`'s CUDA-semantics tests)."""
    import jax

    torch.manual_seed(235)
    ref = ref_mdm_smpl.MDM(_smpl_args())
    ref.pcEmbedding = torch.nn.Linear(4, E)
    sd = _sd(ref)
    del sd["model.pcEmbedding.weight"], sd["model.pcEmbedding.bias"]

    # synthesize pointnet2_ops keys (`build_shared_mlp`: Conv2d/BN2d/ReLU
    # triples; stage mlps from `model/layers.py:118-139`)
    g = np.random.default_rng(0)
    specs = {0: [(4, 16, 16, 32), (4, 32, 32, 64)],
             1: [(99, 64, 64, 128), (99, 64, 96, 128)]}
    for i, stages in specs.items():
        for s, chans in enumerate(stages):
            cin = chans[0] if i == 0 else 96 + 3  # stage-1 input: 32+64 (+xyz)
            for k in range(3):
                cout = chans[k + 1]
                pre = f"model.pcEmbedding.SA_modules.{i}.mlps.{s}"
                sd[f"{pre}.{3*k}.weight"] = g.standard_normal(
                    (cout, cin, 1, 1)).astype(np.float32) * 0.05
                sd[f"{pre}.{3*k+1}.weight"] = np.ones(cout, np.float32)
                sd[f"{pre}.{3*k+1}.bias"] = np.zeros(cout, np.float32)
                sd[f"{pre}.{3*k+1}.running_mean"] = np.zeros(cout, np.float32)
                sd[f"{pre}.{3*k+1}.running_var"] = np.ones(cout, np.float32)
                cin = cout
    sd["model.pcEmbedding.Linear.weight"] = g.standard_normal(
        (E - 3, 256)).astype(np.float32) * 0.05
    sd["model.pcEmbedding.Linear.bias"] = np.zeros(E - 3, np.float32)

    variables = convert_mdm_smpl(sd)
    assert "batch_stats" in variables

    model = MDMSmpl(use_pointnet2=True, fps_groups=1)
    gt = jnp.asarray(rng.standard_normal((2, PAST + FUT, 144)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((2, 2048, 3)), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), gt, pts,
                      jnp.zeros((2,), jnp.int32), method=MDMSmpl.init_forward)
    # converted tree must be structurally identical to a fresh init
    assert (jax.tree.structure(init["params"])
            == jax.tree.structure(variables["params"]))
    assert (jax.tree.structure(init["batch_stats"])
            == jax.tree.structure(variables["batch_stats"]))
    mem = model.apply(variables, gt, pts, method=MDMSmpl.encode)
    assert mem.shape == (2, PAST, E)
    assert np.isfinite(np.asarray(mem)).all()
