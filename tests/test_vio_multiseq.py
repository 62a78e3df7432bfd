"""Full-pipeline shard_map equivalence: the flagship vio_step (rendered
stereo frames -> frontend kernels -> schur+Newton-Schulz filter) sharded
over the 8-device CPU mesh must reproduce single-device runs lane by lane.

Round-1 gap: the multichip story was verified only for the filter on oracle
feature tracks; the front-end kernels had never executed under shard_map."""
import jax
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig, FrontendConfig
from msckf_stereo_c_tpu.models.frontend import make_frontend_params
from msckf_stereo_c_tpu.models.msckf import make_params
from msckf_stereo_c_tpu.models.propagation import ImuBatch
from msckf_stereo_c_tpu.models.runner import pack_imu_batches
from msckf_stereo_c_tpu.models.vio import init_vio_state, vio_step
from msckf_stereo_c_tpu.parallel.multiseq import make_mesh
from msckf_stereo_c_tpu.parallel.vio_multiseq import (
    batched_init_vio_state,
    make_sharded_vio_runner,
)
from msckf_stereo_c_tpu.sim import make_circle_trajectory, make_wall_landmarks, synthesize_imu
from msckf_stereo_c_tpu.sim.render_jax import JaxRenderer, StressEvents

FCFG = FrontendConfig(max_features=64)
# The TPU flagship configuration (bench.py): schur method + Newton-Schulz
# solvers, f32 filter.  Window/pool sizes reduced CPU-affordably; the
# driver-side dryrun (__graft_entry__.dryrun_multichip) runs the full
# M=20/K=128 shapes.  M=6 with T=10 frames (T >= M+2, VERDICT round 2 next
# #5) so `_prune_cam_states` — the camera-compacted rank-12 schur update —
# and the cam-cap overflow frames execute UNDER shard_map, not just vmap.
MCFG = FilterConfig(max_cam_state_size=6, max_tracks=64, max_imu_per_frame=10, ns_iters=10)
METHOD = "schur"


def test_sharded_full_pipeline_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should provide 8 virtual CPU devices, got {n_dev}"
    B, T = 8, 10

    traj = make_circle_trajectory(duration=6.0)
    lms = make_wall_landmarks(num=300, radius=8.0, seed=1)
    imu = synthesize_imu(traj, gyro_noise=1e-4, acc_noise=1e-3, seed=0)
    renderer = JaxRenderer(np.asarray(lms), r_wall=8.0)

    # Eight genuinely different sequences: lane b starts at a different
    # trajectory offset, so every lane detects/tracks different features.
    lane_idx = [np.arange(300, 300 + 10 * T, 10) + 12 * b for b in range(B)]
    imgs0, imgs1, times, imus = [], [], [], []
    for idx in lane_idx:
        i0, i1 = renderer.render_sequence(traj, idx, StressEvents.nominal(T))
        imgs0.append(i0)
        imgs1.append(i1)
        times.append(traj.t[idx].astype(np.float32))
        imus.append(
            pack_imu_batches(
                imu.t, imu.gyro, imu.acc, traj.t[idx], MCFG.max_imu_per_frame, np.float32
            )
        )
    d_imgs0 = jnp.asarray(np.stack(imgs0), jnp.float32)  # (B, T, H, W)
    d_imgs1 = jnp.asarray(np.stack(imgs1), jnp.float32)
    d_times = jnp.asarray(np.stack(times), jnp.float32)
    d_imu = jax.tree.map(lambda *xs: jnp.stack(xs), *imus)

    fparams = make_frontend_params(EUROC_CALIB, jnp.float32)
    mparams = make_params(MCFG, EUROC_CALIB, jnp.float32)

    # --- Sharded run over the mesh. ---
    mesh = make_mesh(n_dev)
    states = batched_init_vio_state(
        FCFG, MCFG, EUROC_CALIB, d_imgs0.shape[2:], B, jnp.float32, jnp.float32
    )
    run = make_sharded_vio_runner(mesh, fparams, mparams, FCFG, MCFG, method=METHOD)
    new_states, poses, fronts, metrics = run(states, d_imgs0, d_imgs1, d_times, d_imu)
    jax.block_until_ready(poses.p)

    # --- Single-device reference runs, lane by lane. ---
    step = jax.jit(
        lambda s, i0, i1, t, b: vio_step(
            s, i0, i1, t, b, fparams, mparams, FCFG, MCFG, METHOD
        )
    )
    state1 = init_vio_state(
        FCFG, MCFG, EUROC_CALIB, d_imgs0.shape[2:], jnp.float32, jnp.float32
    )
    for b in range(B):
        s = state1
        for k in range(T):
            s, (pose, front) = step(
                s,
                d_imgs0[b, k],
                d_imgs1[b, k],
                d_times[b, k],
                jax.tree.map(lambda x: x[b, k], d_imu),
            )
            np.testing.assert_array_equal(
                np.asarray(fronts.fid[b, k]), np.asarray(front.fid)
            )
            # f32: the sharded and single-device programs compile with
            # different fusion choices, and since the presmooth prefilter
            # (round 4) even the level-0 image differs in ulps between the
            # two compilations; through a k-frame filter cascade the
            # positions drift up to ~1e-4 m.  Track identity (fid) must
            # still match EXACTLY — the divergence is fp-level only.
            np.testing.assert_allclose(
                np.asarray(poses.p[b, k]), np.asarray(pose.p), atol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(poses.q_xyzw[b, k]), np.asarray(pose.q_xyzw), atol=5e-5
            )
        # Final filter state agrees too (covariance within f32 slack).
        lane_final = jax.tree.map(lambda x: x[b], new_states)
        np.testing.assert_allclose(
            np.asarray(lane_final.filt.imu.p),
            np.asarray(s.filt.imu.p),
            atol=5e-4,
        )
        # T > M+1 guarantees the cam window filled and _prune_cam_states
        # (camera-compacted rank-12 schur update) executed under shard_map;
        # the pruned window count must match the single-device run exactly.
        assert int(np.asarray(lane_final.filt.num_cams)) == int(
            np.asarray(s.filt.num_cams)
        )
        assert int(np.asarray(s.filt.num_cams)) <= MCFG.max_cam_state_size

    # Lanes genuinely ran different inputs: the tracked feature positions
    # differ across lanes (poses barely diverge in 0.15 s — every lane's
    # filter frame starts at its own origin — but the image content does).
    uv0 = np.asarray(fronts.uv[0, -1])[np.asarray(fronts.valid[0, -1])]
    uv7 = np.asarray(fronts.uv[-1, -1])[np.asarray(fronts.valid[-1, -1])]
    assert abs(uv0[: min(len(uv0), len(uv7))] - uv7[: min(len(uv0), len(uv7))]).max() > 1e-3
    # Frontend was live in every lane.
    assert int(np.asarray(fronts.after_ransac).min()) > 10
    assert int(metrics["total_tracks"]) > 0
