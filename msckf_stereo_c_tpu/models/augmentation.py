"""Camera-state augmentation and feature-observation bookkeeping.

Replaces the reference's ``stateAugmentation`` (msckf_vio.cpp:533-585,
covariance ``conservative_resize`` + block writes) and
``addFeatureObservations`` (msckf_vio.cpp:587-608, std::map upsert) with
fixed-shape scatter updates:

* the new camera pose is written to slot ``num_cams`` and the covariance's
  new 6-row/col band is filled via a dynamic-slice update of the
  preallocated (D, D) matrix;
* incoming frame features are matched to pool tracks with an equality
  matrix and new tracks are allocated to free slots with a rank/cumsum
  assignment — no host round-trips, no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.lie import skew
from ..utils.quaternion import jpl_to_rot, rot_to_jpl
from .state import FilterState


def augment_state(state: FilterState, time) -> FilterState:
    """Append a camera state derived from the current IMU pose + extrinsics."""
    imu = state.imu
    dtype = state.P.dtype
    D = state.P.shape[0]
    n = state.num_cams

    R_i_c = imu.R_imu_cam0
    t_c_i = imu.t_cam0_imu
    R_w_i = jpl_to_rot(imu.q)
    R_w_c = R_i_c @ R_w_i
    t_c_w = imu.p + R_w_i.T @ t_c_i
    q_cam = rot_to_jpl(R_w_c)

    cams = state.cams
    cams = cams._replace(
        q=cams.q.at[n].set(q_cam),
        p=cams.p.at[n].set(t_c_w),
        q_null=cams.q_null.at[n].set(q_cam),
        p_null=cams.p_null.at[n].set(t_c_w),
        sid=cams.sid.at[n].set(state.next_sid),
        time=cams.time.at[n].set(jnp.asarray(time, dtype)),
    )

    # J: Jacobian of the new camera error state w.r.t. the 21-dof IMU error
    # state (MSCKF eq. (16); reference msckf_vio.cpp:556-562).
    J = jnp.zeros((6, 21), dtype)
    J = J.at[0:3, 0:3].set(R_i_c)
    J = J.at[0:3, 15:18].set(jnp.eye(3, dtype=dtype))
    J = J.at[3:6, 0:3].set(skew(R_w_i.T @ t_c_i))
    J = J.at[3:6, 12:15].set(jnp.eye(3, dtype=dtype))
    J = J.at[3:6, 18:21].set(jnp.eye(3, dtype=dtype))

    # New covariance band: rows [s, s+6) = J_full P ; block = J P11 J^T,
    # where J_full = [J, 0]. Inactive region of P is zero so the full-width
    # product equals the reference's partitioned writes.
    s = 21 + 6 * n
    JP = J @ state.P[:21, :]  # (6, D)
    band = JP.at[:, :].get()
    block = J @ state.P[:21, :21] @ J.T  # (6, 6)

    zero = jnp.zeros_like(s)
    P = state.P
    P = jax.lax.dynamic_update_slice(P, band.reshape(6, D), (s, zero))
    P = jax.lax.dynamic_update_slice(P, band.T.reshape(D, 6), (zero, s))
    P = jax.lax.dynamic_update_slice(P, block, (s, s))
    P = 0.5 * (P + P.T)
    # Keep inactive region strictly zero (band writes touch only row/col s:s+6
    # which are now active, so only the diagonal block beyond s+6 needs care —
    # it was zero and stays zero).

    # The new slot must start with no feature observations (defends the
    # slot-reuse invariant after pruning/compaction).
    tracks = state.tracks._replace(
        obs_valid=state.tracks.obs_valid.at[:, n].set(False)
    )

    return state._replace(
        cams=cams,
        num_cams=n + 1,
        P=P,
        tracks=tracks,
        next_sid=state.next_sid + 1,
    )


def add_feature_observations(
    state: FilterState,
    fid: jnp.ndarray,  # (F,) int32 feature ids from the frontend
    uv: jnp.ndarray,  # (F, 4) normalized [u0, v0, u1, v1]
    valid: jnp.ndarray,  # (F,) bool
    quality: jnp.ndarray | None = None,  # (F,) tracking-SNR proxy (0=unknown)
) -> FilterState:
    """Upsert this frame's stereo observations into the track pool and
    compute the tracking rate (reference addFeatureObservations)."""
    tracks = state.tracks
    K = tracks.fid.shape[0]
    slot = state.num_cams - 1  # observations attach to the newest cam slot
    if quality is None:
        quality = jnp.zeros(fid.shape, tracks.quality.dtype)
    quality = quality.astype(tracks.quality.dtype)

    pool_active = tracks.fid >= 0
    curr_feature_num = jnp.sum(pool_active)

    # --- Match incoming features to existing tracks. ---
    eq = (tracks.fid[:, None] == fid[None, :]) & valid[None, :] & pool_active[:, None]
    matched_track = jnp.any(eq, axis=1)  # (K,) track got an obs this frame
    matched_feat = jnp.any(eq, axis=0)  # (F,) feature found its track
    src = jnp.argmax(eq, axis=1)  # (K,) which feature feeds each track

    obs = tracks.obs.at[:, slot, :].set(
        jnp.where(matched_track[:, None], uv[src], tracks.obs[:, slot, :])
    )
    obs_valid = tracks.obs_valid.at[:, slot].set(
        jnp.where(matched_track, True, tracks.obs_valid[:, slot])
    )
    qual = tracks.quality.at[:, slot].set(
        jnp.where(matched_track, quality[src], tracks.quality[:, slot])
    )

    # --- Allocate new tracks for unmatched features. ---
    is_new = valid & ~matched_feat  # (F,)
    # Free slots in pool order; rank new features and free slots, pair them.
    free = ~pool_active
    # free_slots[i] = index of i-th free slot (stable); invalid tail is K.
    free_rank = jnp.cumsum(free) - 1  # (K,) rank of each slot among free ones
    F = fid.shape[0]
    new_rank = jnp.cumsum(is_new) - 1  # (F,)
    n_free = jnp.sum(free)
    # slot_of_rank[r] = slot index of the r-th free slot.
    slot_of_rank = jnp.full((K,), K, jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, free_rank, K)].set(
        jnp.arange(K, dtype=jnp.int32), mode="drop"
    )
    target = jnp.where(is_new & (new_rank < n_free), slot_of_rank[jnp.clip(new_rank, 0, K - 1)], K)

    # Scatter new tracks (mode="drop" ignores target == K).
    new_fid = tracks.fid.at[target].set(fid, mode="drop")
    obs = obs.at[target, slot, :].set(uv, mode="drop")
    obs_valid = obs_valid.at[target, slot].set(True, mode="drop")
    qual = qual.at[target, slot].set(quality, mode="drop")
    initialized = tracks.initialized.at[target].set(False, mode="drop")
    pos = tracks.pos.at[target].set(jnp.zeros_like(uv[:, :3]), mode="drop")

    tracked_num = jnp.sum(matched_feat)
    tracking_rate = tracked_num.astype(state.P.dtype) / jnp.maximum(
        curr_feature_num.astype(state.P.dtype), 1e-5
    )

    tracks = tracks._replace(
        fid=new_fid, obs=obs, obs_valid=obs_valid, initialized=initialized, pos=pos,
        quality=qual,
    )
    return state._replace(tracks=tracks, tracking_rate=tracking_rate)
