"""Piecewise TPU timing: which pipeline stage eats the 200 ms/frame?

Times, separately and jitted: pyramid build, FAST detect, KLT (gather vs
gemm), stereo match, filter step (qr vs schur), and the fused vio step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig, FrontendConfig
from msckf_stereo_c_tpu.models.frontend import (
    _stereo_match,
    frontend_step,
    init_tracker_state,
    make_frontend_params,
    pyramids_for,
)
from msckf_stereo_c_tpu.models.msckf import FrameFeatures, filter_step, make_params
from msckf_stereo_c_tpu.models.propagation import ImuBatch
from msckf_stereo_c_tpu.models.state import init_filter_state
from msckf_stereo_c_tpu.ops.fast import detect_grid_corners
from msckf_stereo_c_tpu.ops.klt import optical_flow_pyr_lk
from msckf_stereo_c_tpu.ops.klt_gemm import optical_flow_pyr_lk_gemm
from msckf_stereo_c_tpu.sim import make_circle_trajectory, make_wall_landmarks, synthesize_imu
from msckf_stereo_c_tpu.sim.render import render_stereo_sequence

print("device:", jax.devices()[0])

fcfg = FrontendConfig()
mcfg = FilterConfig()
dtype = jnp.float32

traj = make_circle_trajectory(duration=4.0)
landmarks = make_wall_landmarks(num=600, radius=8.0, seed=1)
img0, img1 = render_stereo_sequence(traj, landmarks, np.array([300, 310]), r_wall=8.0)
fparams = make_frontend_params(EUROC_CALIB, jnp.float32)
mparams = make_params(mcfg, EUROC_CALIB, dtype)

I0p = jnp.asarray(img0[0])
I0c = jnp.asarray(img0[1])
I1c = jnp.asarray(img1[1])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


pyr_f = jax.jit(lambda im: pyramids_for(im, fcfg))
pyr0p = timeit("pyramid build (1 cam)", pyr_f, I0p)
pyr0c = pyr_f(I0c)
pyr1c = pyr_f(I1c)

fast_f = jax.jit(lambda im: detect_grid_corners(im, 10.0, 16))
timeit("FAST grid detect", fast_f, I0c)

N = fcfg.max_features
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(60, 400, (N, 2)), jnp.float32)
valid = jnp.ones(N, bool)

klt_gather = jax.jit(lambda a, b, p, g: optical_flow_pyr_lk(a, b, p, g, valid, 15, 30, 0.01))
klt_gemm = jax.jit(lambda a, b, p, g: optical_flow_pyr_lk_gemm(a, b, p, g, valid, 15, 30, 0.01))
timeit(f"KLT gather ({N} pts, 4 lvl, 30 it)", klt_gather, pyr0p, pyr0c, pts, pts)
timeit(f"KLT gemm   ({N} pts, 4 lvl, 30 it)", klt_gemm, pyr0p, pyr0c, pts, pts)

# Filter step alone.
imu = ImuBatch(
    time=jnp.linspace(0.0, 0.05, mcfg.max_imu_per_frame, dtype=dtype),
    gyro=jnp.zeros((mcfg.max_imu_per_frame, 3), dtype),
    acc=jnp.asarray(np.tile([0, 0, 9.81], (mcfg.max_imu_per_frame, 1)), dtype),
    valid=jnp.ones(mcfg.max_imu_per_frame, bool),
)
frame = FrameFeatures(
    time=jnp.asarray(0.05, dtype),
    fid=jnp.asarray(np.arange(N), jnp.int32),
    uv=jnp.asarray(rng.uniform(-0.3, 0.3, (N, 4)), dtype),
    valid=jnp.ones(N, bool),
)
state = init_filter_state(mcfg, EUROC_CALIB, dtype)

for method in ["schur", "qr"]:
    f = jax.jit(lambda s, fr, b: filter_step(s, fr, b, mparams, mcfg, method=method)[0])
    try:
        timeit(f"filter step ({method})", f, state, frame, imu, reps=10)
    except Exception as e:
        print(f"filter step ({method}) FAILED: {type(e).__name__}: {str(e)[:200]}")

# Frontend step fused.
tstate = init_tracker_state(fcfg, jnp.float32)
fe = jax.jit(
    lambda ts, pp, pc, p1: frontend_step(
        ts, pp, pc, p1, jnp.zeros(3, jnp.float32), jnp.asarray(0.05, jnp.float32),
        jnp.asarray(False), fparams, fcfg
    )
)
timeit("frontend step (fused)", fe, tstate, pyr0p, pyr0c, pyr1c, reps=10)
