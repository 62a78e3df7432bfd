"""Synthetic VIO world: analytic trajectory, IMU synthesis, landmark
projection, and frontend-like feature tracks.

There is no synthetic-data facility in the reference (its only test is the
EuRoC golden-trajectory run, SURVEY.md §4); this module provides the oracle
needed to validate the filter numerics in isolation from the vision stack
and to benchmark on hardware without dataset files.

Everything is NumPy (host-side, data-generation only).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..config import StereoCalib, EUROC_CALIB

GRAVITY = 9.81


@dataclasses.dataclass
class SimTrajectory:
    """Dense ground-truth trajectory sampled at IMU rate."""

    t: np.ndarray  # (N,)
    p: np.ndarray  # (N, 3) body position in world
    v: np.ndarray  # (N, 3)
    R_w_b: np.ndarray  # (N, 3, 3) world->body rotation
    gyro: np.ndarray  # (N, 3) true body angular rate
    acc: np.ndarray  # (N, 3) true specific force in body frame


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])


def make_circle_trajectory(
    duration: float = 20.0,
    imu_rate: float = 200.0,
    radius: float = 3.0,
    omega: float = 2.0 * np.pi / 20.0,
    z_amp: float = 0.5,
    roll_amp: float = 0.1,
    t_static: float = 1.5,
    t_ramp: float = 2.0,
) -> SimTrajectory:
    """Circular trajectory with sinusoidal altitude and gentle roll; the body
    yaw follows the tangent.  Starts at rest for ``t_static`` seconds (so the
    filter's gravity/bias initialization window is genuinely static), then
    spins up smoothly over ``t_ramp``.  Position/velocity/acceleration are
    analytic; the body angular rate uses a central difference at IMU rate."""
    n = int(duration * imu_rate) + 1
    t = np.arange(n) / imu_rate

    # Phase with smooth spin-up: th(u) = omega (u - T (1 - exp(-u/T))).
    u = np.maximum(t - t_static, 0.0)
    ex = np.exp(-u / t_ramp)
    th = omega * (u - t_ramp * (1.0 - ex))
    dth = np.where(t < t_static, 0.0, omega * (1.0 - ex))
    ddth = np.where(t < t_static, 0.0, omega * ex / t_ramp)

    c, s = np.cos(th), np.sin(th)
    c2, s2 = np.cos(2.0 * th), np.sin(2.0 * th)
    p = np.stack([radius * c, radius * s, z_amp * s2], axis=1)
    v = np.stack(
        [-radius * s * dth, radius * c * dth, 2.0 * z_amp * c2 * dth], axis=1
    )
    a_w = np.stack(
        [
            -radius * c * dth**2 - radius * s * ddth,
            -radius * s * dth**2 + radius * c * ddth,
            -4.0 * z_amp * s2 * dth**2 + 2.0 * z_amp * c2 * ddth,
        ],
        axis=1,
    )

    # world->body: body x = tangent, body y = world up, body z = outward
    # radial.  The EuRoC rig's cameras look along IMU ~+z, so this keeps the
    # landmark band (outer cylinder) in view.  Small roll oscillation on top.
    R_w_b = np.empty((n, 3, 3))
    for i in range(n):
        cth, sth = np.cos(th[i]), np.sin(th[i])
        base = np.array(
            [[-sth, cth, 0.0], [0.0, 0.0, 1.0], [cth, sth, 0.0]]
        )  # rows: body axes in world coords
        roll = roll_amp * np.sin(3.0 * th[i])
        R_w_b[i] = _rot_x(roll) @ base

    # Body angular rate from the rotation sequence: [w]x = R_bw^T dR_bw/dt.
    R_b_w = R_w_b.transpose(0, 2, 1)
    gyro = np.zeros((n, 3))
    dt = 1.0 / imu_rate
    for i in range(n):
        i0, i1 = max(i - 1, 0), min(i + 1, n - 1)
        dR = (R_b_w[i1] - R_b_w[i0]) / ((i1 - i0) * dt)
        W = R_b_w[i].T @ dR
        gyro[i] = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) / 2.0

    g_w = np.array([0.0, 0.0, -GRAVITY])
    acc = np.einsum("nij,nj->ni", R_w_b, a_w - g_w)

    return SimTrajectory(t=t, p=p, v=v, R_w_b=R_w_b, gyro=gyro, acc=acc)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])


def make_stress_trajectory(
    duration: float = 130.0,
    imu_rate: float = 200.0,
    t_static: float = 1.5,
    t_ramp: float = 2.0,
    base_radius: float = 3.2,
    radius_amp: float = 1.2,
    omega: float = 2.0 * np.pi / 16.0,
    speed_mod: float = 0.55,
    z_amp: float = 0.8,
    roll_amp: float = 0.3,
    pitch_amp: float = 0.22,
    yaw_amp: float = 0.25,
) -> SimTrajectory:
    """The V1_01-realistic stress trajectory: long (default 130 s, vs the
    8 s bench circle), aggressive 6-dof — orbit radius breathing, strongly
    modulated angular speed (near-stalls = low-parallax stretches), fast
    altitude oscillation, and roll/pitch/yaw oscillations on top of the
    tangent-following base attitude.  Replaces nothing in the reference
    (whose only quality bar is real V1_01_easy, README.md:53-88); this is
    the harder synthetic stand-in for this environment, which has no
    dataset files.

    Velocity and specific force are obtained by central differences at IMU
    rate (error O(dt^2) ~ 2.5e-5, far below the synthetic IMU noise),
    keeping the position/attitude expressions free to be arbitrary."""
    n = int(duration * imu_rate) + 1
    t = np.arange(n) / imu_rate
    dt = 1.0 / imu_rate

    # Smooth spin-up phase like make_circle_trajectory.
    u = np.maximum(t - t_static, 0.0)
    ex = np.exp(-u / t_ramp)
    ramp = 1.0 - ex

    # Angular phase with strong speed modulation (dips to ~(1-speed_mod) of
    # the base rate -> low-parallax stretches).
    # th(t) = omega * integral of ramp(t) * (1 + speed_mod*sin(2 pi t/29)).
    rate = omega * ramp * (1.0 + speed_mod * np.sin(2.0 * np.pi * u / 29.0))
    th = np.concatenate([[0.0], np.cumsum(0.5 * (rate[1:] + rate[:-1]) * dt)])

    r_orb = base_radius + radius_amp * ramp * np.sin(2.0 * np.pi * u / 37.0)
    z = z_amp * ramp * np.sin(2.0 * np.pi * u / 11.0)
    p = np.stack([r_orb * np.cos(th), r_orb * np.sin(th), z], axis=1)

    # Central-difference velocity (endpoints one-sided).
    v = np.gradient(p, dt, axis=0)
    a_w = np.gradient(v, dt, axis=0)

    # Attitude: tangent-following base (cameras along body +z look at the
    # outer wall) with roll/pitch/yaw oscillations at incommensurate rates.
    roll = roll_amp * ramp * np.sin(2.0 * np.pi * u / 7.3)
    pitch = pitch_amp * ramp * np.sin(2.0 * np.pi * u / 5.1 + 0.7)
    yaw = yaw_amp * ramp * np.sin(2.0 * np.pi * u / 9.7 + 1.3)
    R_w_b = np.empty((n, 3, 3))
    for i in range(n):
        cth, sth = np.cos(th[i] + yaw[i]), np.sin(th[i] + yaw[i])
        base = np.array(
            [[-sth, cth, 0.0], [0.0, 0.0, 1.0], [cth, sth, 0.0]]
        )  # rows: body axes in world coords
        R_w_b[i] = _rot_x(roll[i]) @ _rot_y(pitch[i]) @ base

    # Body angular rate from the rotation sequence (same scheme as
    # make_circle_trajectory).
    R_b_w = R_w_b.transpose(0, 2, 1)
    gyro = np.zeros((n, 3))
    for i in range(n):
        i0, i1 = max(i - 1, 0), min(i + 1, n - 1)
        dR = (R_b_w[i1] - R_b_w[i0]) / ((i1 - i0) * dt)
        W = R_b_w[i].T @ dR
        gyro[i] = np.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]]) / 2.0

    g_w = np.array([0.0, 0.0, -GRAVITY])
    acc = np.einsum("nij,nj->ni", R_w_b, a_w - g_w)
    return SimTrajectory(t=t, p=p, v=v, R_w_b=R_w_b, gyro=gyro, acc=acc)


@dataclasses.dataclass
class SimImu:
    t: np.ndarray
    gyro: np.ndarray  # measured (noisy, biased)
    acc: np.ndarray


def synthesize_imu(
    traj: SimTrajectory,
    gyro_noise: float = 0.005,
    acc_noise: float = 0.05,
    gyro_bias: Optional[np.ndarray] = None,
    acc_bias: Optional[np.ndarray] = None,
    seed: int = 0,
) -> SimImu:
    """Corrupt the true rates with white noise + constant bias (matching the
    filter's noise model, discrete sigma = continuous / sqrt(dt))."""
    rng = np.random.default_rng(seed)
    n = traj.t.shape[0]
    dt = float(np.mean(np.diff(traj.t)))
    gb = np.zeros(3) if gyro_bias is None else gyro_bias
    ab = np.zeros(3) if acc_bias is None else acc_bias
    gyro = traj.gyro + gb + gyro_noise / np.sqrt(dt) * rng.standard_normal((n, 3))
    acc = traj.acc + ab + acc_noise / np.sqrt(dt) * rng.standard_normal((n, 3))
    return SimImu(t=traj.t.copy(), gyro=gyro, acc=acc)


def make_landmarks(
    num: int = 600,
    r_min: float = 5.0,
    r_max: float = 9.0,
    z_min: float = -3.0,
    z_max: float = 4.0,
    seed: int = 1,
) -> np.ndarray:
    """Random landmarks on a cylindrical band around the origin."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(r_min, r_max, num)
    a = rng.uniform(0.0, 2.0 * np.pi, num)
    z = rng.uniform(z_min, z_max, num)
    return np.stack([r * np.cos(a), r * np.sin(a), z], axis=1)


def make_wall_landmarks(
    num: int = 600,
    radius: float = 8.0,
    z_min: float = -3.0,
    z_max: float = 4.0,
    seed: int = 1,
) -> np.ndarray:
    """Landmarks exactly on the render wall (sim.render r_wall), so blob
    parallax and background parallax agree — the image-consistent variant
    used for end-to-end pipeline accuracy tests."""
    rng = np.random.default_rng(seed)
    a = rng.uniform(0.0, 2.0 * np.pi, num)
    z = rng.uniform(z_min, z_max, num)
    return np.stack([radius * np.cos(a), radius * np.sin(a), z], axis=1)


@dataclasses.dataclass
class SimFeatures:
    """Frontend-like output: per frame, fixed F feature slots."""

    t: np.ndarray  # (T,)
    fid: np.ndarray  # (T, F) int32, -1 invalid
    uv: np.ndarray  # (T, F, 4) normalized stereo observations
    valid: np.ndarray  # (T, F) bool
    frame_index: np.ndarray  # (T,) index into the IMU-rate trajectory


def project_tracks(
    traj: SimTrajectory,
    landmarks: np.ndarray,
    calib: StereoCalib = EUROC_CALIB,
    frame_stride: int = 10,
    max_features: int = 50,
    pixel_noise: float = 0.5,
    fov_limit: float = 0.85,
    min_depth: float = 0.3,
    seed: int = 2,
) -> SimFeatures:
    """Project landmarks into the stereo rig along the trajectory and emit
    persistent feature tracks the way the frontend would (keep tracked
    features while visible, refill free slots with new ones)."""
    rng = np.random.default_rng(seed)
    # Extrinsics: p_c0 = R_imu_cam0 (p_b - t_cam0_imu)? Careful:
    # T_cam_imu maps IMU points to cam0: p_c0 = R_ci p_i + t_ci.
    T_ci = calib.cam0.T_cam_imu_mat()
    R_ci, t_ci = T_ci[:3, :3], T_ci[:3, 3]
    T01 = calib.T_cam0_cam1_mat()
    R01, t01 = T01[:3, :3], T01[:3, 3]

    # Normalized-units pixel noise (focal-average scaling, like the
    # reference's norm_pixel_unit, image_processor.cpp:608).
    fx = calib.cam0.intrinsics[0]
    noise_n = pixel_noise / fx

    frame_ids = np.arange(0, traj.t.shape[0], frame_stride)
    T = frame_ids.shape[0]
    F = max_features
    L = landmarks.shape[0]

    fid = -np.ones((T, F), np.int32)
    uv = np.zeros((T, F, 4))
    valid = np.zeros((T, F), bool)

    slot_fid = -np.ones(F, np.int64)  # landmark index per slot
    next_unused = 0  # landmark ids handed out in order of first visibility

    for k, i in enumerate(frame_ids):
        R_wb, p_b = traj.R_w_b[i], traj.p[i]
        # world -> cam0: p_c0 = R_ci (R_wb (p_w - p_b)) + t_ci
        p_imu = np.einsum("ij,lj->li", R_wb, landmarks - p_b)
        p_c0 = p_imu @ R_ci.T + t_ci
        p_c1 = p_c0 @ R01.T + t01
        vis = (p_c0[:, 2] > min_depth) & (p_c1[:, 2] > min_depth)
        u0 = np.where(vis, p_c0[:, 0] / np.where(vis, p_c0[:, 2], 1.0), 0.0)
        v0 = np.where(vis, p_c0[:, 1] / np.where(vis, p_c0[:, 2], 1.0), 0.0)
        u1 = np.where(vis, p_c1[:, 0] / np.where(vis, p_c1[:, 2], 1.0), 0.0)
        v1 = np.where(vis, p_c1[:, 1] / np.where(vis, p_c1[:, 2], 1.0), 0.0)
        vis &= (np.abs(u0) < fov_limit) & (np.abs(v0) < fov_limit)
        vis &= (np.abs(u1) < fov_limit) & (np.abs(v1) < fov_limit)

        # Keep existing tracks while visible.
        for s in range(F):
            lm = slot_fid[s]
            if lm >= 0 and vis[lm]:
                fid[k, s] = lm
                uv[k, s] = [u0[lm], v0[lm], u1[lm], v1[lm]]
                valid[k, s] = True
            else:
                slot_fid[s] = -1

        # Refill free slots with unseen-but-visible landmarks.
        in_use = set(slot_fid[slot_fid >= 0].tolist())
        visible_ids = np.flatnonzero(vis)
        rng.shuffle(visible_ids)
        for lm in visible_ids:
            if lm in in_use:
                continue
            free = np.flatnonzero(slot_fid < 0)
            if free.size == 0:
                break
            s = free[0]
            slot_fid[s] = lm
            in_use.add(lm)
            fid[k, s] = lm
            uv[k, s] = [u0[lm], v0[lm], u1[lm], v1[lm]]
            valid[k, s] = True

    uv += noise_n * rng.standard_normal(uv.shape) * valid[..., None]

    return SimFeatures(
        t=traj.t[frame_ids], fid=fid, uv=uv, valid=valid, frame_index=frame_ids
    )
