"""Full-pipeline multi-sequence data parallelism: the flagship ``vio_step``
(stereo images -> pyramids -> KLT frontend -> MSCKF filter) sharded over a
device mesh.

``multiseq.py`` shards the *filter* over feature-track sequences; this
module shards the *entire* engine — image tensors in, poses out — so the
front-end kernels (Pallas patch extraction, correlation KLT, FAST grid
detection) execute under ``shard_map`` exactly as they do in the bench's
vmapped single-chip path.  This is the scaling story that replaces the
reference's broken 4-pthread pipeline (apps/run_euroc_muitl_threads.cpp:
222-231): B independent sequences ride B mesh slices, with a psum only for
cross-sequence metrics."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import FilterConfig, FrontendConfig, StereoCalib
from ..models.frontend import FrontendParams
from ..models.msckf import MsckfParams
from ..models.runner import apply_gravity_init
from ..models.vio import VioState, init_vio_state, vio_step

__all__ = ["batched_init_vio_state", "make_sharded_vio_runner"]


def batched_init_vio_state(
    fcfg: FrontendConfig,
    mcfg: FilterConfig,
    calib: StereoCalib,
    img_shape: Tuple[int, int],
    batch: int,
    image_dtype=jnp.float32,
    filter_dtype=jnp.float32,
) -> VioState:
    one = init_vio_state(fcfg, mcfg, calib, img_shape, image_dtype, filter_dtype)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def batched_gravity_init(states: VioState, gyro_windows, acc_windows) -> VioState:
    """Vmapped gravity/bias init on the filter half; windows are (B, n, 3)."""
    filts = jax.vmap(apply_gravity_init)(states.filt, gyro_windows, acc_windows)
    return states._replace(filt=filts)


def make_sharded_vio_runner(
    mesh: Mesh,
    fparams: FrontendParams,
    mparams: MsckfParams,
    fcfg: FrontendConfig,
    mcfg: FilterConfig,
    method: str = "schur",
    mesh_axis: str = "seq",
):
    """Build the jitted sharded full-pipeline chunk runner.

    The returned callable maps
      (states (B,...), imgs0 (B,T,H,W), imgs1 (B,T,H,W), times (B,T),
       imu (B,T,L,...))
    -> (new_states, poses, fronts, metrics)
    with the batch dimension sharded over ``mesh_axis``; ``metrics`` carries
    psum-reduced cross-sequence totals."""

    def seq_scan(state, i0s, i1s, ts, imu_seq):
        def step(s, xs):
            i0, i1, t, b = xs
            return vio_step(s, i0, i1, t, b, fparams, mparams, fcfg, mcfg, method)

        return jax.lax.scan(step, state, (i0s, i1s, ts, imu_seq))

    def local(states, imgs0, imgs1, times, imu):
        new_states, (poses, fronts) = jax.vmap(seq_scan)(states, imgs0, imgs1, times, imu)
        total_tracks = jax.lax.psum(jnp.sum(poses.num_tracks), mesh_axis)
        max_reset = jax.lax.pmax(jnp.max(new_states.filt.online_reset_count), mesh_axis)
        return new_states, poses, fronts, total_tracks, max_reset

    spec = P(mesh_axis)
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(states, imgs0, imgs1, times, imu):
        new_states, poses, fronts, total_tracks, max_reset = sharded(
            states, imgs0, imgs1, times, imu
        )
        return new_states, poses, fronts, {
            "total_tracks": total_tracks,
            "max_online_reset_count": max_reset,
        }

    return run
