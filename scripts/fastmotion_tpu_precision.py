#!/usr/bin/env python
"""Fast-motion ATE stress on the REAL TPU at each filter matmul precision.

CPU tests cannot validate FilterConfig.matmul_precision (CPU matmuls are
always exact f32/f64); this script runs the tests/test_fast_motion.py
scenario on the device with the hardware configuration (f32 filter,
schur + Newton-Schulz) and prints the ATE per precision setting.

Usage: python scripts/fastmotion_tpu_precision.py [precisions...]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("FM_PLATFORM"):  # e.g. FM_PLATFORM=cpu for a dry run
        jax.config.update("jax_platforms", os.environ["FM_PLATFORM"])
    import jax.numpy as jnp

    from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig, FrontendConfig
    from msckf_stereo_c_tpu.io import evaluate_ate
    from msckf_stereo_c_tpu.models.vio import run_vio_sequence
    from msckf_stereo_c_tpu.sim import (
        make_circle_trajectory,
        make_wall_landmarks,
        synthesize_imu,
    )
    from msckf_stereo_c_tpu.sim.render import render_stereo_sequence

    traj = make_circle_trajectory(
        duration=6.0, omega=2.0 * np.pi / 8.0, roll_amp=0.25, t_static=1.5, t_ramp=1.0
    )
    landmarks = make_wall_landmarks(num=500, radius=8.0, seed=1)
    imu = synthesize_imu(traj, gyro_noise=5e-4, acc_noise=5e-3, seed=0)
    frame_idx = np.arange(0, traj.t.shape[0], 10)
    img0, img1 = render_stereo_sequence(traj, landmarks, frame_idx, r_wall=8.0)

    # Each arg is "<filter_precision>" or "<filter_precision>/<frontend_precision>"
    # (frontend default = the platform fast path, 1-pass bf16 on TPU).
    specs = sys.argv[1:] or ["float32", "tensorfloat32"]
    for spec in specs:
        filt_prec, _, front_prec = spec.partition("/")
        front_prec = front_prec or "default"
        fcfg = FrontendConfig(max_features=64, matmul_precision=front_prec)
        mcfg = FilterConfig(
            max_cam_state_size=8,
            max_tracks=80,
            max_imu_per_frame=12,
            ns_iters=10,
            matmul_precision=filt_prec,
        )
        res = run_vio_sequence(
            fcfg, mcfg, EUROC_CALIB,
            traj.t[frame_idx], img0, img1,
            imu.t, imu.gyro, imu.acc,
            filter_dtype=jnp.float32, method="schur", chunk=40,
        )
        ate = evaluate_ate(res.times, res.positions, traj.t[frame_idx], traj.p[frame_idx])
        tracks = int(res.tracking["after_ransac"][-20:].min())
        print(
            f"filter={filt_prec:15s} frontend={front_prec:15s} "
            f"ate_rmse={ate.rmse:.4f}m min_tracks_last20={tracks}",
            flush=True,
        )


if __name__ == "__main__":
    main()
