"""Multi-device scaling efficiency of the sharded multi-sequence filter.

North-star: >=80% scaling efficiency at N>=2 (BASELINE.md).  With one real
TPU chip in this environment, the collective path is validated on a virtual
CPU mesh (the same shard_map program the driver dry-runs); on a pod slice
the identical code shards over real ICI.

Weak scaling: B=N sequences over N devices vs N sequences on 1 device.

NOTE: on a virtual CPU mesh the N "devices" share the same physical cores
and host-side collectives dominate, so the efficiency numbers printed here
are NOT hardware-meaningful — this script exists to exercise the sharded
program end-to-end.  Real efficiency must be measured on a pod slice where
each mesh element is a chip and collectives ride ICI."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from msckf_stereo_c_tpu.config import EUROC_CALIB, FilterConfig
from msckf_stereo_c_tpu.models.msckf import FrameFeatures, make_params
from msckf_stereo_c_tpu.models.propagation import ImuBatch
from msckf_stereo_c_tpu.parallel.multiseq import batched_init_state, make_sharded_runner

cfg = FilterConfig(max_cam_state_size=8, max_tracks=48, max_imu_per_frame=10)
dtype = jnp.float32
params = make_params(cfg, EUROC_CALIB, dtype)
T, F, L = 20, 32, cfg.max_imu_per_frame
rng = np.random.default_rng(0)


def make_batch(B):
    frames = FrameFeatures(
        time=jnp.asarray(np.tile(np.arange(1, T + 1) * 0.05, (B, 1)), dtype),
        fid=jnp.asarray(np.tile(np.arange(F), (B, T, 1)), jnp.int32),
        uv=jnp.asarray(rng.uniform(-0.3, 0.3, (B, T, F, 4)), dtype),
        valid=jnp.ones((B, T, F), bool),
    )
    imu_t = np.tile(np.linspace(0.005, 0.05, L), (B, T, 1)) + np.arange(T)[None, :, None] * 0.05
    imu = ImuBatch(
        time=jnp.asarray(imu_t, dtype),
        gyro=jnp.asarray(rng.normal(0, 0.01, (B, T, L, 3)), dtype),
        acc=jnp.asarray(
            np.tile([0, 0, 9.81], (B, T, L, 1)) + rng.normal(0, 0.01, (B, T, L, 3)), dtype
        ),
        valid=jnp.ones((B, T, L), bool),
    )
    return batched_init_state(cfg, EUROC_CALIB, B, dtype), frames, imu


def run_on(n_dev, B, reps=3):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("seq",))
    run = make_sharded_runner(mesh, params, cfg, method="schur")
    states, frames, imu = make_batch(B)
    out = run(states, frames, imu)
    jax.block_until_ready(out[1].p)
    t0 = time.time()
    for _ in range(reps):
        out = run(states, frames, imu)
    jax.block_until_ready(out[1].p)
    return (time.time() - t0) / reps


results = {}
for n in [1, 2, 4, 8]:
    dt = run_on(n, B=n)
    results[n] = dt
    base = results[1]
    eff = base / dt  # weak scaling: same per-device work
    print(f"devices={n}  B={n}  time={dt*1e3:8.1f} ms  weak-scaling eff={eff:6.1%}")
