"""Microbench of one klt_corr level's internals at the bench operating point
(B lanes x N features, images shared across lanes): template prep, search
extract, correlation conv, Pallas iteration."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.ops import klt_corr
from msckf_stereo_c_tpu.ops.klt_gemm import _SEARCH_RADIUS, _extract_patches

B = int(os.environ.get("SPLIT_BATCH", "16"))
N = int(os.environ.get("SPLIT_N", "96"))
H, W = 480, 752
P = 15
S = P + 2 * _SEARCH_RADIUS + 2
K = S - P + 1

rng = np.random.default_rng(0)
img_prev = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
img_curr = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
bpts = jnp.asarray(rng.uniform(60, 400, (B, N, 2)), jnp.float32)


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.time() - t0) / reps * 1000:7.2f} ms", flush=True)
    return out


def template(pts_prev):
    Tq = P + 3
    torg = jnp.clip(
        jnp.floor(pts_prev) - (P + 1) // 2, 0,
        jnp.array([W - Tq, H - Tq], jnp.float32),
    )
    torg_i = torg.astype(jnp.int32)
    tpatch = jax.vmap(
        lambda o: jax.lax.dynamic_slice(img_prev, (o[1], o[0]), (Tq, Tq))
    )(torg_i)
    a = jnp.clip(pts_prev - (P + 1) / 2.0 - torg, 0.0, 1.0)
    ax = a[:, 0][:, None, None]
    ay = a[:, 1][:, None, None]
    q = P + 2
    sp = (
        tpatch[:, :q, :q] * (1 - ax) * (1 - ay)
        + tpatch[:, :q, 1 : q + 1] * ax * (1 - ay)
        + tpatch[:, 1 : q + 1, :q] * (1 - ax) * ay
        + tpatch[:, 1 : q + 1, 1 : q + 1] * ax * ay
    )
    templ = sp[:, 1:-1, 1:-1]
    gx = 0.5 * (sp[:, 1:-1, 2:] - sp[:, 1:-1, :-2])
    gy = 0.5 * (sp[:, 2:, 1:-1] - sp[:, :-2, 1:-1])
    return templ, gx, gy


btemplate = jax.jit(jax.vmap(template))
templ, gx, gy = timeit("template+gradients", btemplate, bpts)

bsearch = jax.jit(jax.vmap(lambda p: _extract_patches(img_curr, p, S)))
spatch, sorg = timeit("search extract", bsearch, bpts)

bcorr = jax.jit(jax.vmap(klt_corr._corr_surfaces, in_axes=(0, 0, 0, None)), static_argnums=3)
Cx, Cy = timeit("corr surfaces (conv)", bcorr, spatch, gx, gy, P)

gxx = jnp.sum(gx * gx, (-2, -1))
gxy = jnp.sum(gx * gy, (-2, -1))
gyy = jnp.sum(gy * gy, (-2, -1))
G = jnp.stack([jnp.stack([gxx, gxy], -1), jnp.stack([gxy, gyy], -1)], -2)
tgx = jnp.sum(templ * gx, (-2, -1))
tgy = jnp.sum(templ * gy, (-2, -1))
f0 = jnp.zeros((B, N, 2), jnp.float32) + (K - 1) / 2.0
conv0 = jnp.zeros((B, N), bool)

biter = jax.jit(
    jax.vmap(
        lambda cx, cy, g, tx, ty, f, c: klt_corr._iterate_pallas(
            cx, cy, g, tx, ty, f, c, 30, 0.01, float(S - P - 1), False
        )
    )
)
timeit("pallas iterate (30)", biter, Cx, Cy, G, tgx, tgy, f0, conv0)

# Whole level for reference.
blevel = jax.jit(
    jax.vmap(
        lambda pp, pc: klt_corr._track_level_corr(
            img_prev, img_curr, pp, pc, P, 30, 0.01, True
        ),
        in_axes=(0, 0),
    )
)
timeit("whole level", blevel, bpts, bpts)
