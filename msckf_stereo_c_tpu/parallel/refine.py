"""VIO -> batch-BA refinement glue.

Takes a finished VIO run (per-frame body poses + the frontend's published
feature measurements) and assembles the keyframe BA problem: subsampled
keyframe camera poses, feature tracks re-associated across keyframes by id,
DLT-initialized landmarks, and the observation tensor the distributed
Schur-complement solver consumes (ba.py).  This is the "pose-graph/keyframe
back-end" tier of the north star — the reference has nothing comparable
(its filter marginalizes every feature immediately)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import StereoCalib, EUROC_CALIB
from ..utils.quaternion import jpl_to_rot, rot_to_jpl
from .ba import BAProblem, ba_gauss_newton, make_distributed_ba, problem_from_vio


def _body_to_cam0(q_xyzw_ham: np.ndarray, p_body: np.ndarray, calib: StereoCalib):
    """Body(=IMU for EuRoC) poses -> cam0 (world->cam rotation, position)."""
    import jax.numpy as jnp

    # Hamilton body->world quaternion == JPL world->body components.
    R_w_b = np.asarray(jpl_to_rot(jnp.asarray(q_xyzw_ham)))  # (T,3,3) world->body
    T_ci = calib.cam0.T_cam_imu_mat()
    R_ci, t_ci = T_ci[:3, :3], T_ci[:3, 3]
    R_w_c = np.einsum("ij,tjk->tik", R_ci, R_w_b)
    # cam0 position in world: p_b + R_bw @ cam0_pos_in_imu
    cam_in_imu = -R_ci.T @ t_ci
    p_c = p_body + np.einsum("tij,j->ti", R_w_b.transpose(0, 2, 1), cam_in_imu)
    return R_w_c, p_c


def _dlt_triangulate(R_w_c: np.ndarray, p_c: np.ndarray, uv: np.ndarray, mask: np.ndarray):
    """Linear multi-view triangulation per landmark (mono cam0 rays)."""
    L, F = mask.shape
    out = np.zeros((L, 3))
    ok = np.zeros(L, bool)
    for l in range(L):
        ks = np.flatnonzero(mask[l])
        if len(ks) < 2:
            continue
        A = []
        for k in ks:
            R = R_w_c[k]
            t = -R @ p_c[k]  # p_cam = R p_w + t
            u, v = uv[l, k, 0], uv[l, k, 1]
            P = np.concatenate([R, t[:, None]], axis=1)
            A.append(u * P[2] - P[0])
            A.append(v * P[2] - P[1])
        A = np.asarray(A)
        _, _, Vt = np.linalg.svd(A)
        h = Vt[-1]
        if abs(h[3]) < 1e-12:
            continue
        out[l] = h[:3] / h[3]
        # Cheirality over the observing cams.
        depths = np.einsum("kij,j->ki", R_w_c[ks], out[l]) - np.einsum(
            "kij,kj->ki", R_w_c[ks], p_c[ks]
        )
        ok[l] = bool((depths[:, 2] > 0.1).all())
    return out, ok


def build_ba_problem(
    times: np.ndarray,  # (T,)
    quats_xyzw: np.ndarray,  # (T, 4) published body->world Hamilton
    positions: np.ndarray,  # (T, 3) published body positions
    fids: np.ndarray,  # (T, N) frontend feature ids per frame
    uvs: np.ndarray,  # (T, N, 4) normalized stereo measurements
    valids: np.ndarray,  # (T, N)
    calib: StereoCalib = EUROC_CALIB,
    keyframe_stride: int = 5,
    max_keyframes: int = 40,
    min_obs: int = 3,
    max_landmarks: int = 512,
    dtype=None,
) -> Optional[BAProblem]:
    """Assemble the keyframe BA problem from VIO outputs (host-side)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    kf = np.arange(0, len(times), keyframe_stride)[:max_keyframes]
    F = len(kf)
    if F < 3:
        return None

    R_w_c, p_c = _body_to_cam0(quats_xyzw[kf], positions[kf], calib)

    # Re-associate tracks by feature id across keyframes.
    obs_map = {}
    for j, t_idx in enumerate(kf):
        val = valids[t_idx]
        for n in np.flatnonzero(val):
            obs_map.setdefault(int(fids[t_idx, n]), {})[j] = uvs[t_idx, n]
    items = [(fid, o) for fid, o in obs_map.items() if len(o) >= min_obs]
    items.sort(key=lambda kv: -len(kv[1]))
    items = items[:max_landmarks]
    if len(items) < 8:
        return None
    L = len(items)

    obs = np.zeros((L, F, 4))
    mask = np.zeros((L, F), bool)
    for l, (_, o) in enumerate(items):
        for j, z in o.items():
            obs[l, j] = z
            mask[l, j] = True

    lms, ok = _dlt_triangulate(R_w_c, p_c, obs, mask)
    obs = obs[ok]
    mask = mask[ok]
    lms = lms[ok]
    if len(lms) < 8:
        return None

    T01 = calib.T_cam0_cam1_mat()
    cam_q = np.stack([np.asarray(rot_to_jpl(jnp.asarray(R))) for R in R_w_c])
    return problem_from_vio(
        cam_q, p_c, lms, obs, mask, T01[:3, :3], T01[:3, 3], dtype=dtype
    )


def refine_trajectory(
    problem: BAProblem,
    iters: int = 8,
    mesh=None,
):
    """Run (optionally distributed) BA and return the refined problem."""
    if mesh is not None:
        run = make_distributed_ba(mesh, iters=iters)
        return run(problem)
    return ba_gauss_newton(problem, iters=iters)


def problem_to_body_poses(problem: BAProblem, calib: StereoCalib = EUROC_CALIB):
    """BA cam0 poses -> body(IMU) positions, for apples-to-apples ATE
    against the VIO/ground-truth body trajectory."""
    import jax.numpy as jnp

    R_w_c = np.asarray(jpl_to_rot(jnp.asarray(problem.cam_q)))  # (F,3,3)
    p_c = np.asarray(problem.cam_p)
    T_ci = calib.cam0.T_cam_imu_mat()
    R_ci, t_ci = T_ci[:3, :3], T_ci[:3, 3]
    cam_in_imu = -R_ci.T @ t_ci
    R_w_b = np.einsum("ij,tjk->tik", R_ci.T, R_w_c)
    return p_c - np.einsum("tij,j->ti", R_w_b.transpose(0, 2, 1), cam_in_imu)
