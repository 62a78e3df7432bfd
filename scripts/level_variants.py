"""In-context attribution of one full-res KLT level (B=16 x N=96):
times _track_level_corr variants with individual pieces ablated/swapped:

  full        - as shipped
  noiter      - iteration loop replaced by the initial guess
  noconv      - corr surfaces replaced by zeros (keeps extraction+template)
  shiftfma    - corr surfaces via 225 unrolled shift-FMA ops (no conv)
  iters8      - max 8 LK iterations
  extract     - patch extraction + template/grads only
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import msckf_stereo_c_tpu.ops.klt_corr as kc

B = int(os.environ.get("LV_BATCH", "16"))
N = int(os.environ.get("LV_N", "96"))
H, W = 480, 752
P = 15

rng = np.random.default_rng(0)
img_prev = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
img_curr = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
pts = jnp.asarray(
    np.stack([rng.uniform(40, W - 40, (B, N)), rng.uniform(40, H - 40, (B, N))], -1),
    jnp.float32,
)

_orig_corr = kc._corr_surfaces
_orig_iter = kc._iterate_pallas


def corr_zeros(spatch, gx, gy, Pw):
    Nf, S, _ = spatch.shape
    K = S - Pw + 1
    z = jnp.zeros((Nf, K, K), spatch.dtype) + spatch[:, :K, :K] * 0.0
    return z + jnp.sum(gx, (-2, -1))[:, None, None], z + jnp.sum(gy, (-2, -1))[:, None, None]


def corr_shiftfma(spatch, gx, gy, Pw):
    Nf, S, _ = spatch.shape
    K = S - Pw + 1
    Cx = jnp.zeros((Nf, K, K), spatch.dtype)
    Cy = jnp.zeros((Nf, K, K), spatch.dtype)
    for i in range(Pw):
        for j in range(Pw):
            w = spatch[:, i : i + K, j : j + K]
            Cx = Cx + gx[:, i, j][:, None, None] * w
            Cy = Cy + gy[:, i, j][:, None, None] * w
    return Cx, Cy


def iter_skip(Cx, Cy, G, tgx, tgy, f0, conv0, iters, eps, hi, interpret):
    return f0 + 1e-12 * jnp.stack([tgx, tgy], -1)


def run_variant(name):
    kc._corr_surfaces = _orig_corr
    kc._iterate_pallas = _orig_iter
    iters = 30
    if name == "noconv":
        kc._corr_surfaces = corr_zeros
    elif name == "shiftfma":
        kc._corr_surfaces = corr_shiftfma
    elif name == "noiter":
        kc._iterate_pallas = iter_skip
    elif name == "iters8":
        iters = 8
    elif name == "extract":
        kc._corr_surfaces = corr_zeros
        kc._iterate_pallas = iter_skip

    f = jax.jit(
        jax.vmap(
            lambda p, p0: kc._track_level_corr(img_prev, img_curr, p, p0, P, iters, 0.01, True),
            in_axes=(0, 0),
        )
    )
    t0 = time.time()
    out = jax.block_until_ready(f(pts, pts))
    ct = time.time() - t0
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = f(pts, pts)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1000
    print(f"{name:10s} {ms:8.3f} ms  [compile {ct:.1f}s]", flush=True)


for v in ("full", "noiter", "noconv", "shiftfma", "iters8", "extract"):
    run_variant(v)
