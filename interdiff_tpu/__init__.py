"""interdiff_tpu — a TPU-native JAX framework for 3D human-object interaction diffusion.

A from-scratch rebuild of the capabilities of InterDiff (ICCV 2023,
Sirui-Xu/InterDiff): transformer-based interaction diffusion over human pose +
object 6-DoF state, with a physics-informed interaction-correction network
injected into the reverse-diffusion loop, for both the SMPL (BEHAVE) and
skeleton (HO-GCN) tracks.

Design notes (TPU-first, not a port):
  * All compute-path code is pure JAX (XLA/Pallas); the reverse-diffusion
    sampler compiles to a single ``lax.scan`` with the correction hook gated
    by ``lax.cond`` so the full 1000- (or respaced 100-) step process stays
    on-device.
  * Models are ``flax.linen`` modules; parameters are pytrees; training steps
    are ``jit``/``pjit`` functions sharded over a ``jax.sharding.Mesh``.
  * Hot geometry kernels (brute-force signed-distance nearest neighbour) have
    Pallas TPU implementations with pure-XLA fallbacks used on CPU; the
    offline contact-label tool has a native C++ BVH engine.

Public API (lazy imports — submodules pull jax/flax only when touched):

    from interdiff_tpu import GaussianDiffusion, MDMSmpl, MDMSkeleton, ...
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

_EXPORTS = {
    "GaussianDiffusion": "interdiff_tpu.diffusion.gaussian",
    "Inpaint": "interdiff_tpu.diffusion.gaussian",
    "MDMSmpl": "interdiff_tpu.models.mdm_smpl",
    "MDMSkeleton": "interdiff_tpu.models.mdm_skeleton",
    "ObjProjectorSmpl": "interdiff_tpu.models.correction",
    "ObjProjectorSkeleton": "interdiff_tpu.models.correction",
    "SmplModel": "interdiff_tpu.smpl.model",
    "smpl_forward": "interdiff_tpu.smpl.model",
    "point2point_signed": "interdiff_tpu.ops.signed_distance",
    "vertex_normals": "interdiff_tpu.geometry.normals",
    "SmplTrackConfig": "interdiff_tpu.config",
    "SkeletonTrackConfig": "interdiff_tpu.config",
    "DiffusionConfig": "interdiff_tpu.config",
}


def __getattr__(name):
    if name in _EXPORTS:
        module = importlib.import_module(_EXPORTS[name])
        return getattr(module, name)
    raise AttributeError(f"module 'interdiff_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
