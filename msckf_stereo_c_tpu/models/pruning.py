"""Camera-state pruning: keyframe-aware redundant-state selection and
covariance compaction.

Replaces the reference's ``findRedundantCamStates`` / ``pruneCamStateBuffer``
(msckf_vio.cpp:1026-1184): the ``std::map`` erase + ``conservative_resize``
of the covariance becomes a gather-permutation of the preallocated camera
slots and of the covariance's 6x6 blocks, with the freed slots zeroed.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lie import rotation_angle
from ..utils.quaternion import jpl_to_rot
from .state import FilterState


def find_redundant_cam_slots(state: FilterState, cfg_rot_thr, cfg_trans_thr, cfg_rate_thr):
    """Pick two slots to remove (reference findRedundantCamStates).

    Key state = 4th newest (slot n-4).  Two sequential decisions: if the
    candidate (starting at n-3) is close to the key pose and tracking is
    good, drop the candidate (it is redundant with the key frame); otherwise
    drop the oldest remaining state.  Returns (slot_a, slot_b) sorted."""
    n = state.num_cams
    key = n - 4
    R_key = jpl_to_rot(state.cams.q[key])
    p_key = state.cams.p[key]

    def decide(cand_slot, first_slot):
        R_c = jpl_to_rot(state.cams.q[cand_slot])
        p_c = state.cams.p[cand_slot]
        angle = rotation_angle(R_c @ R_key.T)
        dist = jnp.linalg.norm(p_c - p_key)
        near = (
            (angle < cfg_rot_thr)
            & (dist < cfg_trans_thr)
            & (state.tracking_rate > cfg_rate_thr)
        )
        chosen = jnp.where(near, cand_slot, first_slot)
        return chosen, near

    cand0 = n - 3
    first0 = jnp.zeros_like(n)
    chosen0, near0 = decide(cand0, first0)
    cand1 = jnp.where(near0, cand0 + 1, cand0)
    first1 = jnp.where(near0, first0, first0 + 1)
    chosen1, _ = decide(cand1, first1)

    a = jnp.minimum(chosen0, chosen1)
    b = jnp.maximum(chosen0, chosen1)
    return a, b


def compact_after_removal(state: FilterState, slot_a, slot_b) -> FilterState:
    """Remove two camera slots and compact everything left-wards:
    cam arrays, per-track observation columns, and the covariance's 6x6
    block rows/columns (reference msckf_vio.cpp:1161-1184)."""
    M = state.cams.q.shape[0]
    D = state.P.shape[0]
    dtype = state.P.dtype
    n = state.num_cams

    idx = jnp.arange(M)
    removed = (idx == slot_a) | (idx == slot_b)
    keep = ~removed & (idx < n)
    # perm[j] = source slot of the j-th kept state; tail filled with the
    # removed/inactive slots so it stays a permutation.
    order = jnp.argsort(jnp.where(keep, idx, idx + M))  # kept first, stable
    perm = order

    cams = state.cams
    cams = cams._replace(
        q=cams.q[perm],
        p=cams.p[perm],
        q_null=cams.q_null[perm],
        p_null=cams.p_null[perm],
        sid=jnp.where(jnp.arange(M) < n - 2, cams.sid[perm], -1),
        time=cams.time[perm],
    )

    tracks = state.tracks
    obs = tracks.obs[:, perm, :]
    obs_valid = tracks.obs_valid[:, perm] & (jnp.arange(M)[None, :] < n - 2)
    tracks = tracks._replace(
        obs=obs, obs_valid=obs_valid, quality=tracks.quality[:, perm]
    )

    # Covariance block permutation: index vector over D entries.
    blk = jnp.arange(6)
    cam_idx = (21 + 6 * perm[:, None] + blk[None, :]).reshape(-1)  # (6M,)
    full_idx = jnp.concatenate([jnp.arange(21), cam_idx])
    P = state.P[full_idx][:, full_idx]
    # Zero the now-inactive band.
    act = jnp.arange(D) < 21 + 6 * (n - 2)
    P = jnp.where(act[:, None] & act[None, :], P, jnp.zeros((), dtype))

    return state._replace(cams=cams, num_cams=n - 2, P=P, tracks=tracks)
