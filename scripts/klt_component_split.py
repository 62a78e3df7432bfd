"""Microbenchmark the three per-level KLT components at bench shapes
(B sequences vmapped, N features, full-res 752x480 level):

  1. extract_patches_pallas — template (Tq=18) + search (S=35) patches
  2. _corr_surfaces        — depthwise-conv gradient correlation surfaces
  3. _iterate_pallas       — the LK iteration kernel (K=21, 30 iters)

Each is timed in isolation under jit+vmap, plus a fused "level" call
(_track_level_corr) for the whole-level reference time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.ops.klt_corr import (
    _corr_surfaces,
    _iterate_pallas,
    _track_level_corr,
)
from msckf_stereo_c_tpu.ops.patch_extract import extract_patches_pallas

B = int(os.environ.get("KCS_BATCH", "16"))
N = int(os.environ.get("KCS_N", "96"))
H, W = 480, 752
P = 15
S = 35
K = S - P + 1
Tq = P + 3

rng = np.random.default_rng(0)
img_prev = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
img_curr = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
pts = jnp.asarray(
    np.stack(
        [rng.uniform(40, W - 40, (B, N)), rng.uniform(40, H - 40, (B, N))], axis=-1
    ),
    jnp.float32,
)
torg = pts.astype(jnp.int32)
gx = jnp.asarray(rng.standard_normal((B, N, P, P)), jnp.float32)
gy = jnp.asarray(rng.standard_normal((B, N, P, P)), jnp.float32)
spatch = jnp.asarray(rng.standard_normal((B, N, S, S)), jnp.float32)
G = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 50.0, (B, N, 2, 2))
tg = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
f0 = jnp.asarray(rng.uniform(5, 12, (B, N, 2)), jnp.float32)
conv0 = jnp.zeros((B, N), bool)
Cx = jnp.asarray(rng.standard_normal((B, N, K, K)), jnp.float32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    compile_t = time.time() - t0
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1000
    print(f"{name:28s} {ms:8.3f} ms  [compile {compile_t:.1f}s]", flush=True)
    return ms


timeit(
    "extract template (Tq=18)",
    jax.vmap(lambda o: extract_patches_pallas(img_prev, o, Tq)),
    torg,
)
timeit(
    "extract search (S=35)",
    jax.vmap(lambda o: extract_patches_pallas(img_curr, o, S)),
    torg,
)
timeit(
    "corr surfaces (conv)",
    jax.vmap(lambda s, a, b: _corr_surfaces(s, a, b, P)),
    spatch,
    gx,
    gy,
)
timeit(
    "iterate pallas (30 it)",
    jax.vmap(
        lambda cx, cy, g, tx, ty, f, c: _iterate_pallas(
            cx, cy, g, tx, ty, f, c, 30, 0.01, float(S - P - 1), False
        )
    ),
    Cx,
    Cx,
    G,
    tg,
    tg,
    f0,
    conv0,
)
timeit(
    "full level (fused)",
    jax.vmap(
        lambda p, p0: _track_level_corr(
            img_prev, img_curr, p, p0, P, 30, 0.01, True
        ),
        in_axes=(0, 0),
    ),
    pts,
    pts,
)
