"""Batched piecewise TPU timing: per-stage cost at batch B (the bench's
operating point) to find what limits frames/s."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig, FrontendConfig
from msckf_stereo_c_tpu.models.frontend import (
    frontend_step,
    init_tracker_state,
    make_frontend_params,
    pyramids_for,
)
from msckf_stereo_c_tpu.models.msckf import FrameFeatures, filter_step, make_params
from msckf_stereo_c_tpu.models.propagation import ImuBatch, propagate
from msckf_stereo_c_tpu.models.state import init_filter_state
from msckf_stereo_c_tpu.models.triangulation import triangulate_tracks
from msckf_stereo_c_tpu.models.update import (
    measurement_update_schur,
    schur_gating,
    track_blocks,
)
from msckf_stereo_c_tpu.sim import make_circle_trajectory, make_wall_landmarks
from msckf_stereo_c_tpu.sim.render import render_stereo_sequence

B = int(os.environ.get("PROF_BATCH", "8"))
print("device:", jax.devices()[0], "batch:", B)

fcfg = FrontendConfig()
mcfg = FilterConfig()
dtype = jnp.float32

traj = make_circle_trajectory(duration=4.0)
landmarks = make_wall_landmarks(num=600, radius=8.0, seed=1)
img0, img1 = render_stereo_sequence(traj, landmarks, np.array([300, 310]), r_wall=8.0)
fparams = make_frontend_params(EUROC_CALIB, jnp.float32)
mparams = make_params(mcfg, EUROC_CALIB, dtype)

I0p, I0c, I1c = jnp.asarray(img0[0]), jnp.asarray(img0[1]), jnp.asarray(img1[1])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:40s} {dt:8.2f} ms   ({dt / B:6.3f} ms/seq)")
    return out


pyr_f = jax.jit(lambda im: pyramids_for(im, fcfg))
pyr0p, pyr0c, pyr1c = pyr_f(I0p), pyr_f(I0c), pyr_f(I1c)

# Batched sub-stage costs.
bimgs = jnp.broadcast_to(I0c, (B,) + I0c.shape)
bpyr = jax.jit(jax.vmap(lambda im: pyramids_for(im, fcfg)))
timeit("pyramids (batched, 1 cam)", bpyr, bimgs, reps=10)

from msckf_stereo_c_tpu.ops.fast import detect_grid_corners
bfast = jax.jit(jax.vmap(lambda im: detect_grid_corners(im, 10.0, 16)))
timeit("FAST (batched)", bfast, bimgs, reps=10)

from msckf_stereo_c_tpu.ops.klt_gemm import optical_flow_pyr_lk_gemm
N0 = fcfg.max_features
rng0 = np.random.default_rng(1)
bpts = jnp.asarray(rng0.uniform(60, 400, (B, N0, 2)), jnp.float32)
bklt = jax.jit(
    jax.vmap(
        lambda p, g: optical_flow_pyr_lk_gemm(
            pyr0p, pyr0c, p, g, jnp.ones(N0, bool), 15, 30, 0.01
        ),
        in_axes=(0, 0),
    )
)
timeit("KLT gemm (batched)", bklt, bpts, bpts, reps=10)

# Batched frontend (images broadcast, tracker state batched).
tstate = init_tracker_state(fcfg, jnp.float32)
btstate = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), tstate)
bfe = jax.jit(
    jax.vmap(
        lambda ts: frontend_step(
            ts, pyr0p, pyr0c, pyr1c, jnp.zeros(3, jnp.float32),
            jnp.asarray(0.05, jnp.float32), jnp.asarray(False), fparams, fcfg
        )
    )
)
timeit("frontend step (batched)", bfe, btstate, reps=10)

# Batched filter pieces.
N = fcfg.max_features
rng = np.random.default_rng(0)
state = init_filter_state(mcfg, EUROC_CALIB, dtype)
bstate = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state)
frame = FrameFeatures(
    time=jnp.asarray(0.05, dtype),
    fid=jnp.asarray(np.arange(N), jnp.int32),
    uv=jnp.asarray(rng.uniform(-0.3, 0.3, (N, 4)), dtype),
    valid=jnp.ones(N, bool),
)
L = mcfg.max_imu_per_frame
imu = ImuBatch(
    time=jnp.linspace(0.0, 0.05, L, dtype=dtype),
    gyro=jnp.zeros((L, 3), dtype),
    acc=jnp.asarray(np.tile([0, 0, 9.81], (L, 1)), dtype),
    valid=jnp.ones(L, bool),
)

bprop = jax.jit(jax.vmap(lambda s: propagate(s, imu, mparams.Q_imu)))
timeit("propagate (batched)", bprop, bstate, reps=10)

btri = jax.jit(
    jax.vmap(
        lambda s: triangulate_tracks(
            s.tracks.obs, s.tracks.obs_valid, s.cams.q, s.cams.p,
            mparams.R_c0_c1, mparams.t_c0_c1,
        )
    )
)
timeit("triangulate_tracks (batched)", btri, bstate, reps=10)


def blocks_fn(s):
    return track_blocks(
        s.tracks.pos, s.tracks.obs, s.tracks.obs_valid, s.cams, s.gravity,
        mparams.R_c0_c1, mparams.t_c0_c1,
    )


bblocks = jax.jit(jax.vmap(blocks_fn))
blk = timeit("track_blocks (batched)", bblocks, bstate, reps=10)

bgate = jax.jit(jax.vmap(lambda s, b: schur_gating(b, s.P, mparams.sigma2)))
timeit("schur_gating (batched)", bgate, bstate, blk, reps=10)

bupd = jax.jit(
    jax.vmap(
        lambda s, b: measurement_update_schur(
            s, b, jnp.ones(mcfg.max_tracks, bool), mparams.sigma2
        ).P
    )
)
timeit("measurement_update_schur (batched)", bupd, bstate, blk, reps=10)

bfs = jax.jit(
    jax.vmap(lambda s: filter_step(s, frame, imu, mparams, mcfg, method="schur")[0].P)
)
timeit("filter step schur (batched)", bfs, bstate, reps=10)
