"""Synthetic stereo image rendering for end-to-end frontend testing.

Projects the simulated landmarks through the full camera model (including
lens distortion) and stamps each as a bright anisotropic blob over a smooth
background, producing image sequences the FAST/KLT front-end can actually
track — the vision-stack analog of the filter-only feature oracle."""
from __future__ import annotations

import numpy as np

from ..config import EUROC_CALIB, StereoCalib
from .trajectory import SimTrajectory


def _distort_project(p_cam: np.ndarray, intrinsics, dist):
    """cam-frame points -> distorted pixel coordinates (radtan)."""
    fx, fy, cx, cy = intrinsics
    k1, k2, p1, p2 = dist
    x = p_cam[:, 0] / p_cam[:, 2]
    y = p_cam[:, 1] / p_cam[:, 2]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd * fx + cx, yd * fy + cy], axis=1)


def _background(H, W, seed):
    """Smooth low-frequency background so KLT sees gentle gradients."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(40, 90, (H // 16 + 2, W // 16 + 2))
    ys = np.linspace(0, small.shape[0] - 1.001, H)
    xs = np.linspace(0, small.shape[1] - 1.001, W)
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    ay = (ys - y0)[:, None]
    ax = (xs - x0)[None, :]
    b = (
        small[y0][:, x0] * (1 - ay) * (1 - ax)
        + small[y0][:, x0 + 1] * (1 - ay) * ax
        + small[y0 + 1][:, x0] * ay * (1 - ax)
        + small[y0 + 1][:, x0 + 1] * ay * ax
    )
    return b


def render_stereo_sequence(
    traj: SimTrajectory,
    landmarks: np.ndarray,
    frame_indices: np.ndarray,
    calib: StereoCalib = EUROC_CALIB,
    min_depth: float = 0.3,
    blob_radius: int = 4,
    seed: int = 5,
):
    """Render (T, H, W) float32 image pairs for the given trajectory frames."""
    rng = np.random.default_rng(seed)
    W, H = calib.cam0.resolution
    T_ci0 = calib.cam0.T_cam_imu_mat()
    T01 = calib.T_cam0_cam1_mat()

    L = landmarks.shape[0]
    amp = rng.uniform(60.0, 140.0, L)
    # Slightly anisotropic blobs (stable corners for FAST + KLT).
    sx = rng.uniform(1.1, 1.8, L)
    sy = rng.uniform(1.1, 1.8, L)

    bg = _background(H, W, seed)

    r = blob_radius
    gy, gx = np.mgrid[-r : r + 1, -r : r + 1]

    out0 = np.empty((len(frame_indices), H, W), np.float32)
    out1 = np.empty((len(frame_indices), H, W), np.float32)

    for k, i in enumerate(frame_indices):
        R_wb, p_b = traj.R_w_b[i], traj.p[i]
        p_imu = (landmarks - p_b) @ R_wb.T
        p_c0 = p_imu @ T_ci0[:3, :3].T + T_ci0[:3, 3]
        p_c1 = p_c0 @ T01[:3, :3].T + T01[:3, 3]

        for (p_c, intr, dist, out) in (
            (p_c0, calib.cam0.intrinsics, calib.cam0.distortion_coeffs, out0),
            (p_c1, calib.cam1.intrinsics, calib.cam1.distortion_coeffs, out1),
        ):
            img = bg.copy()
            vis = p_c[:, 2] > min_depth
            uv = np.zeros((L, 2))
            uv[vis] = _distort_project(p_c[vis], intr, dist)
            vis &= (uv[:, 0] > r + 3) & (uv[:, 0] < W - r - 4)
            vis &= (uv[:, 1] > r + 3) & (uv[:, 1] < H - r - 4)
            for lm in np.flatnonzero(vis):
                u, v = uv[lm]
                cx_i, cy_i = int(round(u)), int(round(v))
                du = gx + (cx_i - u)
                dv = gy + (cy_i - v)
                blob = amp[lm] * np.exp(
                    -0.5 * ((du / sx[lm]) ** 2 + (dv / sy[lm]) ** 2)
                )
                img[cy_i - r : cy_i + r + 1, cx_i - r : cx_i + r + 1] += blob
            out[k] = np.clip(img, 0, 255).astype(np.float32)

    return out0, out1
