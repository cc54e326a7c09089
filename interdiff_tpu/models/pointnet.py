"""PointNet++ multi-scale-grouping encoder (flax), the TPU equivalent of
`PointNet2Encoder` (`interdiff/model/layers.py:111-175`) which wraps the
CUDA `pointnet2_ops.PointnetSAModuleMSG`.

Channels-last throughout: point clouds are [B, P, 3+C]; the shared MLPs are
1x1 convs in the reference, i.e. plain Dense layers over the channel axis —
exactly what the MXU wants.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from interdiff_tpu.ops.pointcloud import (
    furthest_point_sample,
    gather_points,
    hierarchical_fps,
    pairwise_sqdist,
    query_and_group,
)


class SharedMLP(nn.Module):
    """Conv2d(1x1)+BN2d+ReLU chain over the channel axis (pointnet2_ops
    `build_shared_mlp`), channels-last [B, M, S, C]."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """`PointnetSAModuleMSG`: FPS centers, per-radius ball-query grouping,
    shared MLP, max-pool over neighbours, concat over scales."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per-scale hidden channels (post-input)
    use_xyz: bool = True
    fps_groups: int = 1  # >1: grouped parallel FPS (see hierarchical_fps)

    @nn.compact
    def __call__(self, xyz: jax.Array, features: Optional[jax.Array], *,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """xyz [B, N, 3], features [B, N, C] | None ->
        (new_xyz [B, npoint, 3], new_features [B, npoint, sum(mlp[-1])])."""
        g = self.fps_groups
        if g > 1 and self.npoint == xyz.shape[1]:
            # npoint == N selects EVERY point; in grouped (non-parity) mode
            # any order is within the hierarchical_fps contract, so skip the
            # sampling chain entirely and keep the original order.
            new_xyz = xyz
        elif g > 1 and xyz.shape[1] % g == 0 and self.npoint % g == 0:
            new_xyz = gather_points(xyz, hierarchical_fps(xyz, self.npoint, g))
        else:
            new_xyz = gather_points(
                xyz, furthest_point_sample(xyz, self.npoint))
        # one pairwise-distance matrix shared by every radius scale; on TPU
        # the fused rank-select kernel replaces top_k + gather per scale
        # (ops/pallas_group.py) and streams the TRANSPOSED [B, N, M] layout
        from interdiff_tpu.ops.pallas_group import (
            _MAX_C, _FORCE_PALLAS_INTERPRET, fused_query_group,
            pairwise_sqdist_t)
        from interdiff_tpu.ops.pallas_nn import on_tpu

        c_data = 3 + (0 if features is None else features.shape[-1])
        # mirror _fused_impl's full gate (incl. dtype): otherwise a non-f32
        # input would build the transposed d2 only for the kernel to fall
        # back and recompute distances once per radius scale
        data_dtype = (xyz.dtype if features is None else
                      jnp.promote_types(xyz.dtype, features.dtype))
        fused = (c_data <= _MAX_C and data_dtype == jnp.float32
                 and (on_tpu() or _FORCE_PALLAS_INTERPRET))
        # FULLY-fused scale (grouping + folded conv/BN/ReLU + max in one
        # Pallas pass, ops/pallas_sa.py): OPT-IN via INTERDIFF_FUSED_SA=1
        # (trace-time env).  The round-5 chip A/B (scripts/ab_fused_sa.py)
        # measured the rank-select route FASTER at every routed shape —
        # encoder fwd 5.51 vs 8.56 ms (P=1024) and 16.67 vs 20.97 ms
        # (P=2048), fwd+bwd 10.95 vs 15.42 / 21.80 vs 27.64 ms — the
        # in-kernel rank-1 VPU MLP loses to XLA's MXU matmuls over the
        # kernel-grouped tensor, so rank-select is the production default
        # and fused-SA stays available for future re-evaluation.
        import os

        fused_sa = (fused and self.use_xyz and not train
                    and bool(os.environ.get("INTERDIFF_FUSED_SA")))
        d2 = (pairwise_sqdist_t(xyz, new_xyz) if fused
              else pairwise_sqdist(new_xyz, xyz))
        outs = []
        for s, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            mlp_mod = SharedMLP(mlp, name=f"mlp{s}")
            if fused_sa:
                from interdiff_tpu.ops.pallas_sa import (
                    folded_affine,
                    fused_sa_scale,
                )

                # probe call creates/binds the conv+bn params (the probe
                # compute itself is dead code at apply time)
                mlp_mod(jnp.zeros((1, 1, c_data), data_dtype), train=train)
                h_max = fused_sa_scale(xyz, new_xyz, features,
                                       folded_affine(mlp_mod), radius,
                                       nsample, self.use_xyz, d2)
                outs.append(h_max)  # [B, M, mlp[-1]]
                continue
            if fused:
                grouped = fused_query_group(xyz, new_xyz, features, radius,
                                            nsample, self.use_xyz, d2)
            else:
                grouped = query_and_group(
                    xyz, new_xyz, features, radius, nsample,
                    use_xyz=self.use_xyz, d2=d2)  # [B,M,S,3+C]
            h = mlp_mod(grouped, train=train)
            outs.append(jnp.max(h, axis=2))  # [B, M, mlp[-1]]
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNet2Encoder(nn.Module):
    """Two-stage MSG set abstraction -> per-keypoint feature, matching
    `interdiff/model/layers.py:111-175` (c_in excludes xyz).

    Input [B, I, P, 3+c_in] -> [B, I, num_keypoints, c_out] where the last
    axis is [xyz(3) | Linear(features)(c_out-3)].
    """

    c_in: int = 1
    c_out: int = 256
    num_keypoints: int = 1
    # grouped-parallel FPS in stage 1 (16 groups: sequential depth 64 vs
    # 1024 — measured ~100 ms -> ~7 ms on v5e; see ops/pointcloud.py)
    fps_groups: int = 16

    @nn.compact
    def __call__(self, pointcloud: jax.Array, *, train: bool = False) -> jax.Array:
        B, I, P, C = pointcloud.shape
        pc = pointcloud.reshape(B * I, P, C)
        xyz = pc[..., :3]
        features = pc[..., 3:] if C > 3 else None

        xyz, features = SAModuleMSG(
            npoint=1024, radii=(0.05, 0.1), nsamples=(16, 32),
            mlps=((16, 16, 32), (32, 32, 64)), fps_groups=self.fps_groups,
            name="sa0")(xyz, features, train=train)
        xyz, features = SAModuleMSG(
            npoint=self.num_keypoints, radii=(0.1, 0.2), nsamples=(16, 32),
            mlps=((64, 64, 128), (64, 96, 128)), name="sa1")(
                xyz, features, train=train)

        feat = nn.Dense(self.c_out - 3, name="Linear")(features)
        out = jnp.concatenate([xyz, feat], axis=-1)
        return out.reshape(B, I, self.num_keypoints, self.c_out)
