#!/usr/bin/env python
"""Full-length V1_01-realistic stress gate (VERDICT round 1, next #2).

Runs the 130 s aggressive-6dof stress scene — texture-poor windows,
occluder sweep, exposure drift — end to end (device render -> frontend
kernels -> MSCKF) on whatever device JAX provides (the real TPU chip under
the driver; CPU fallback), f32 + schur + Newton-Schulz: the hardware path.

Prints one JSON line with the ATE and the margin vs the 0.13 m bar
(BASELINE.json; reference best on real V1_01_easy: 0.1207 m,
/root/reference/README.md:81).

Env knobs: STRESS_DURATION, STRESS_CHUNK, STRESS_METHOD, STRESS_NS_ITERS,
STRESS_FILTER_PRECISION, STRESS_SEED.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from msckf_stereo_c_tpu.config import FilterConfig, FrontendConfig
    from msckf_stereo_c_tpu.sim.stress import run_stress_gate

    duration = float(os.environ.get("STRESS_DURATION", "130"))
    method = os.environ.get("STRESS_METHOD", "schur")
    mcfg = FilterConfig(
        ns_iters=int(os.environ.get("STRESS_NS_ITERS", "10")),
        matmul_precision=os.environ.get("STRESS_FILTER_PRECISION", "tensorfloat32"),
    )
    fcfg = FrontendConfig()

    t0 = time.time()
    out = run_stress_gate(
        duration=duration,
        chunk=int(os.environ.get("STRESS_CHUNK", "64")),
        fcfg=fcfg,
        mcfg=mcfg,
        filter_dtype=jnp.float32,
        method=method,
        seed=int(os.environ.get("STRESS_SEED", "0")),
    )
    wall = time.time() - t0

    gate = 0.13
    print(
        json.dumps(
            {
                "metric": "stress_ate_rmse",
                "value": round(out.ate_rmse, 4),
                "unit": "m",
                "gate": gate,
                "margin_pct": round(100.0 * (1.0 - out.ate_rmse / gate), 1),
                "ate_mean": round(out.ate_mean, 4),
                "ate_max": round(out.ate_max, 4),
                "duration_s": out.duration,
                "frames": out.n_frames,
                "min_tracks": out.min_tracks_after_ransac,
                "device": jax.devices()[0].device_kind,
                "wall_s": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
