"""Interaction-correction networks (`ObjProjector`), both tracks.

Behavioural contracts: `interdiff/model/correction_smpl.py` (67 SSM markers,
contact-based marker selection) and `interdiff/model/correction_skeleton.py`
(21 joints, absolute-node output, quaternion I/O).

Architecture (shared): the object trajectory is lifted to a **contact-relative
representation** — object rot6d + translation relative to every human marker
— DCT'd over time keeping ``n_pre`` coefficients, run through three ST-GCNN
stacks (relative markers / absolute single node / fused markers+1) with
residual connections, then inverse-DCT'd back; future object frames are
*padded* with the last past frame before DCT so the network inpaints the
future in frequency space.

TPU-native notes: all tensors batch-first channels-last [B, T, V, C]; the
DCT is a plain time-axis einsum (the reference's permute/view gymnastics,
`correction_smpl.py:88-121`, implement the same matmul); marker selection is
masked `where`/`take_along_axis` instead of boolean indexing so the whole
forward jits and can live inside the sampling `lax.scan`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from interdiff_tpu.data.constants import hand_bias_vector
from interdiff_tpu.geometry.dct import dct_matrices
from interdiff_tpu.geometry.rotations import (
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quat_wxyz_to_xyzw,
    quat_xyzw_to_wxyz,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)
from interdiff_tpu.models.layers import STGCNNLayer


def pad_future_with_last_past(x: jax.Array, past_len: int) -> jax.Array:
    """``x[idx_pad]`` (`correction_smpl.py:84-87`): keep the past frames and
    repeat the last past frame over the future, along axis 1 (time)."""
    T = x.shape[1]
    idx = np.concatenate([np.arange(past_len),
                          np.full(T - past_len, past_len - 1)]).astype(np.int32)
    return x[:, idx]


class _STStack(nn.Module):
    """Four ST-GCNN layers with the reference channel schedule."""

    channels: Tuple[int, ...]  # e.g. (9, 32, 16, 32, 9)
    time_dim: int
    joints_dim: int
    version: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(len(self.channels) - 1):
            x = STGCNNLayer(self.channels[i], self.channels[i + 1],
                            self.time_dim, self.joints_dim,
                            dropout=self.dropout, version=self.version,
                            name=f"gcn{i}")(x, train=train)
        return x


class ObjProjectorCore(nn.Module):
    """Shared projector trunk -> per-node corrected trajectories.

    Inputs  obj9 [B, T, 9] (rot6d ∥ trans), markers [B, T, P, 3].
    Returns [B, T, P+1, 9]: node 0 = absolute stream, nodes 1..P = marker-
    relative streams (`correction_smpl.py:79-121`).
    """

    num_nodes: int  # P: 67 markers (SMPL) or 21 joints (skeleton)
    n_pre: int  # kept DCT coefficients: args.dct=10 (SMPL), 20 (skeleton)
    seq_len: int  # past_len + future_len
    past_len: int
    fusion_channels: Tuple[int, ...] = (9, 32, 16, 32, 9)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, obj9: jax.Array, markers: jax.Array, *,
                 train: bool = False) -> jax.Array:
        P = self.num_nodes
        dct_np, idct_np = dct_matrices(self.seq_len)
        dct = jnp.asarray(dct_np[: self.n_pre])  # [K, T]
        idct = jnp.asarray(idct_np[:, : self.n_pre])  # [T, K]

        fwd = lambda x: jnp.einsum("kt,bt...->bk...", dct, x)
        inv = lambda x: jnp.einsum("tk,bk...->bt...", idct, x)

        # relative stream over P marker nodes
        rel_trans = obj9[:, :, None, 6:9] - markers  # [B,T,P,3]
        rot_rep = jnp.broadcast_to(obj9[:, :, None, :6],
                                   rel_trans.shape[:3] + (6,))
        rel = jnp.concatenate([rot_rep, rel_trans], axis=-1)  # [B,T,P,9]
        rel = fwd(pad_future_with_last_past(rel, self.past_len))  # [B,K,P,9]

        x = _STStack((9, 32, 16, 32, 9), self.n_pre, P, version=0,
                     dropout=self.dropout, name="st_gcnns_relative")(
                         rel, train=train)
        rel = rel + x

        # relative -> absolute translation, in DCT space (linear, commutes);
        # note the human markers are NOT future-padded (`:101-103`).
        human_dct = fwd(markers)  # [B,K,P,3]
        multi = jnp.concatenate(
            [rel[..., :6], rel[..., 6:9] + human_dct], axis=-1)

        # absolute single-node stream
        absn = fwd(pad_future_with_last_past(obj9, self.past_len))[:, :, None]
        x = _STStack((9, 32, 16, 32, 9), self.n_pre, 1, version=0,
                     dropout=self.dropout, name="st_gcnns")(absn, train=train)
        absn = absn + x

        # fusion over P+1 nodes (spatio-temporal graph conv, version 2)
        fused = jnp.concatenate([absn, multi], axis=2)  # [B,K,P+1,9]
        x = _STStack(self.fusion_channels, self.n_pre, P + 1, version=2,
                     dropout=self.dropout, name="st_gcnns_all")(
                         fused, train=train)
        fused = fused + x
        return inv(fused)  # [B,T,P+1,9]


class ObjProjectorSmpl(nn.Module):
    """SMPL-track correction net (`correction_smpl.py:8-137`).

    ``sample(obj_rot6d, obj_trans, markers, contact)``: markers [B,T,P,3]
    (xyz only), contact [B,P] = per-marker future-contact counts
    (`:76`: sum of the contact channel over future frames).
    Marker choice: mean over nodes when ``initialize`` (early epochs);
    otherwise absolute node for no-contact samples, multinomial (train) /
    argmax (eval) over contact counts with +0.5 hand bias for the rest.
    """

    num_markers: int = 67
    n_pre: int = 10
    past_len: int = 10
    future_len: int = 25
    dropout: float = 0.0

    def setup(self):
        self.core = ObjProjectorCore(
            num_nodes=self.num_markers, n_pre=self.n_pre,
            seq_len=self.past_len + self.future_len, past_len=self.past_len,
            fusion_channels=(9, 32, 16, 32, 9), dropout=self.dropout,
            name="core")

    def __call__(self, obj9, markers, contact, *, initialize: bool = False,
                 train: bool = False,
                 select_key: Optional[jax.Array] = None):
        return self.sample(obj9, markers, contact, initialize=initialize,
                           train=train, select_key=select_key)

    def sample(self, obj9: jax.Array, markers: jax.Array, contact: jax.Array,
               *, initialize: bool = False, train: bool = False,
               select_key: Optional[jax.Array] = None) -> jax.Array:
        """-> corrected [B, T, 9]."""
        results = self.core(obj9, markers, train=train)  # [B,T,P+1,9]
        if initialize:
            return results.mean(axis=2)

        has_contact = contact.sum(axis=-1) > 0  # [B]
        weights = contact.astype(jnp.float32) + jnp.asarray(
            hand_bias_vector(self.num_markers))  # [B,P]
        if train:
            if select_key is None:
                select_key = self.make_rng("marker_select")
            # torch.multinomial(weights, 1) == categorical over log-weights
            idx = jax.random.categorical(select_key, jnp.log(weights))
        else:
            idx = jnp.argmax(weights, axis=-1)
        marker_pick = jax.vmap(lambda r, i: r[:, i])(
            results[:, :, 1:], idx.astype(jnp.int32))  # [B,T,9]
        return jnp.where(has_contact[:, None, None], marker_pick,
                         results[:, :, 0])


class ObjProjectorSkeleton(nn.Module):
    """Skeleton-track correction net (`correction_skeleton.py:7-134`).

    I/O in the dataset's 7-D pose convention: quaternion **xyzw**.  Output is
    always the absolute-stream node (`:130` takes node 0); there is no
    contact-based selection in this track.
    """

    num_joints: int = 21
    n_pre: int = 20  # hardcoded in the reference (`:12`)
    past_len: int = 10
    future_len: int = 10
    dropout: float = 0.0

    def setup(self):
        seq_len = self.past_len + self.future_len
        self.core = ObjProjectorCore(
            num_nodes=self.num_joints,
            n_pre=min(self.n_pre, seq_len),  # can't keep more DCT coeffs
            seq_len=seq_len, past_len=self.past_len,  # than frames exist
            fusion_channels=(9, 64, 32, 64, 9), dropout=self.dropout,
            name="core")

    def __call__(self, obj_quat_xyzw, obj_trans, joints, *,
                 train: bool = False):
        return self.sample(obj_quat_xyzw, obj_trans, joints, train=train)

    def sample(self, obj_quat_xyzw: jax.Array, obj_trans: jax.Array,
               joints: jax.Array, *, train: bool = False
               ) -> Tuple[jax.Array, jax.Array]:
        """quat [B,T,4] xyzw, trans [B,T,3], joints [B,T,J,3] ->
        (corrected quat xyzw [B,T,4], corrected trans [B,T,3])."""
        rot6d = matrix_to_rotation_6d(
            quaternion_to_matrix(quat_xyzw_to_wxyz(obj_quat_xyzw)))
        obj9 = jnp.concatenate([rot6d, obj_trans], axis=-1)
        results = self.core(obj9, joints, train=train)[:, :, 0]  # abs node
        quat_p = matrix_to_quaternion(rotation_6d_to_matrix(results[..., :6]))
        return quat_wxyz_to_xyzw(quat_p), results[..., 6:9]
