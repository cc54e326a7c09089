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
    are ``jit``/``pjit`` functions sharded over a ``jax.sharding.Mesh``
    (data-parallel batch axis + optional tensor-parallel FFN axis).
  * Hot geometry kernels (brute-force signed-distance nearest neighbour,
    banded local attention) have Pallas TPU implementations with pure-XLA
    reference fallbacks used on CPU and in tests.
"""

__version__ = "0.1.0"
