"""Fused Pallas KLT: one kernel per pyramid level.

The GEMM formulation (klt_gemm.py) runs each LK iteration as XLA ops —
dozens of dispatches per level with intermediate materialization.  This
Pallas kernel keeps both level images resident in VMEM and runs the entire
pipeline — patch extraction, template gradients, all LK iterations — inside
one kernel per level, one grid program per feature.

Mosaic constraint shaping: VMEM dynamic slices must start at tile-aligned
offsets (sublanes % 8, lanes % 128 for f32), but KLT needs windows at
arbitrary per-feature positions.  The kernel therefore loads an aligned
superset block and shifts it with ``pltpu.roll`` (which takes *runtime*
shifts) so every subsequent window slice is static.  The same roll trick
implements the per-iteration window walk inside the search patch.

Numerics match klt.py / klt_gemm.py (same inverse-compositional scheme);
equivalence is asserted in tests via interpret mode on CPU.

STATUS — experimental, not the production path.  Measured on TPU v5e
(96 features, 4 levels, 30 iters): gemm 3.9 ms, this kernel 6.6 ms — the
one-feature-per-program grid serializes on the single tensor core and wastes
the VPU's 8x128 width on 16x16 patches, while the GEMM formulation keeps
all features in flight per op; the Mosaic lowering also still miscompares
against interpret mode at coarse levels.  Kept as the scaffold for a
future features-along-lanes variant; the frontend default remains
klt_impl="gemm".
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .klt import KltResult, _MIN_EIG_THRESHOLD

_SEARCH_RADIUS = 9


def _aligned_window(ref, oy, ox, RY, RX, H, W, interpret):
    """Load ref[oy:oy+?, ox:ox+?] content with arbitrary (runtime) origin by
    slicing an aligned (RY, RX) block and rolling the residual away.  The
    caller must guarantee oy <= H-?  etc. such that the residual + needed
    window fits in (RY, RX) (see size derivation in _track_level_pallas)."""
    ay = jnp.clip(8 * (oy // 8), 0, H - RY)
    if RX >= W:
        ax = jnp.zeros((), jnp.int32)
        blk = ref[pl.ds(pl.multiple_of(ay, 8), RY), :]
    else:
        ax = jnp.clip(128 * (ox // 128), 0, W - RX)
        blk = ref[pl.ds(pl.multiple_of(ay, 8), RY), pl.ds(pl.multiple_of(ax, 128), RX)]
    blk = pltpu.roll(blk, -(oy - ay), 0)
    blk = pltpu.roll(blk, -(ox - ax), 1)
    return blk


def _level_kernel_factory(H, W, P, S, T, iters, eps, interpret):
    RY_T = 32 if H >= 32 else 8 * ((H // 8))  # template block rows
    RY_S = 48 if H >= 48 else 8 * ((H // 8))  # search block rows
    RX = 256 if W > 256 else W

    def kernel(
        pts_prev_ref, pts_cur_ref, img_prev_ref, img_curr_ref,
        out_pts_ref, out_good_ref, spatch_ref,
    ):
        n = pl.program_id(0)
        px = pts_prev_ref[n, 0]
        py = pts_prev_ref[n, 1]
        cx = pts_cur_ref[n, 0]
        cy = pts_cur_ref[n, 1]

        f32 = jnp.float32

        # ---- Template (P+2 window + gradients) around the previous point.
        tox = jnp.clip(jnp.floor(px), T // 2, W - T + T // 2).astype(jnp.int32) - T // 2
        toy = jnp.clip(jnp.floor(py), T // 2, H - T + T // 2).astype(jnp.int32) - T // 2
        tblk = _aligned_window(img_prev_ref, toy, tox, RY_T, RX, H, W, interpret)

        fx0 = px - (P + 1) / 2.0 - tox.astype(f32)
        fy0 = py - (P + 1) / 2.0 - toy.astype(f32)
        ix0 = jnp.floor(fx0).astype(jnp.int32)
        iy0 = jnp.floor(fy0).astype(jnp.int32)
        ax = fx0 - ix0.astype(f32)
        ay = fy0 - iy0.astype(f32)

        tb = pltpu.roll(pltpu.roll(tblk, -iy0, 0), -ix0, 1)
        q = P + 2
        sp = (
            tb[:q, :q] * (1 - ax) * (1 - ay)
            + tb[:q, 1 : q + 1] * ax * (1 - ay)
            + tb[1 : q + 1, :q] * (1 - ax) * ay
            + tb[1 : q + 1, 1 : q + 1] * ax * ay
        )
        templ = sp[1:-1, 1:-1]
        gx = 0.5 * (sp[1:-1, 2:] - sp[1:-1, :-2])
        gy = 0.5 * (sp[2:, 1:-1] - sp[:-2, 1:-1])

        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        tr = gxx + gyy
        det = gxx * gyy - gxy * gxy
        disc = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
        min_eig = (0.5 * tr - disc) / (P * P)
        good = min_eig > _MIN_EIG_THRESHOLD
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)

        # ---- Search patch around the initial guess, origin-normalized.
        sox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - (S // 2), 0, W - S)
        soy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - (S // 2), 0, H - S)
        sblk = _aligned_window(img_curr_ref, soy, sox, RY_S, RX, H, W, interpret)
        spatch_ref[:, :] = sblk[: spatch_ref.shape[0], : spatch_ref.shape[1]]

        lo = jnp.asarray(0.0, f32)
        hi = jnp.asarray(S - P - 1.0, f32)

        def clampxy(x, y):
            fx = jnp.clip(x - (P - 1) / 2.0 - sox.astype(f32), lo, hi)
            fy = jnp.clip(y - (P - 1) / 2.0 - soy.astype(f32), lo, hi)
            return fx, fy

        def cond(carry):
            _, _, it, conv = carry
            return (it < iters) & ~conv

        def body(carry):
            x, y, it, conv = carry
            fx, fy = clampxy(x, y)
            ix = jnp.floor(fx).astype(jnp.int32)
            iy = jnp.floor(fy).astype(jnp.int32)
            bx = fx - ix.astype(f32)
            by = fy - iy.astype(f32)
            sb = pltpu.roll(pltpu.roll(spatch_ref[:, :], -iy, 0), -ix, 1)
            patch = (
                sb[:P, :P] * (1 - bx) * (1 - by)
                + sb[:P, 1 : P + 1] * bx * (1 - by)
                + sb[1 : P + 1, :P] * (1 - bx) * by
                + sb[1 : P + 1, 1 : P + 1] * bx * by
            )
            dI = templ - patch
            b0 = jnp.sum(dI * gx)
            b1 = jnp.sum(dI * gy)
            dx = (gyy * b0 - gxy * b1) * inv_det
            dy = (-gxy * b0 + gxx * b1) * inv_det
            nx = x + dx
            ny = y + dy
            # Keep the iterate inside the search patch.
            cfx, cfy = clampxy(nx, ny)
            nx = cfx + (P - 1) / 2.0 + sox.astype(f32)
            ny = cfy + (P - 1) / 2.0 + soy.astype(f32)
            conv = jnp.sqrt(dx * dx + dy * dy) < eps
            return (nx, ny, it + 1, conv)

        x, y, _, _ = jax.lax.while_loop(
            cond, body, (cx, cy, jnp.zeros((), jnp.int32), ~good)
        )

        out_pts_ref[n, 0] = x
        out_pts_ref[n, 1] = y
        out_good_ref[n, 0] = good.astype(jnp.int32)

    return kernel, RY_S, RX


def _track_level_pallas(img_prev, img_curr, pts_prev, pts_cur, win, iters, eps, final_level, interpret):
    H, W = img_prev.shape
    N = pts_prev.shape[0]
    P = win
    S = min(win + 2 * _SEARCH_RADIUS + 2, H, W)
    T = P + 4
    if S < P + 2 or min(H, W) < T or min(H, W) < 48:
        return pts_cur, jnp.ones(N, bool)

    # Mosaic requires tile-aligned array shapes; pad small levels with edge
    # replication (coordinate clamps below still use the original dims, so
    # the padding only ever feeds already-clamped border reads).
    Hp = -(-H // 8) * 8
    Wp = -(-W // 128) * 128
    if (Hp, Wp) != (H, W):
        img_prev = jnp.pad(img_prev, ((0, Hp - H), (0, Wp - W)), mode="edge")
        img_curr = jnp.pad(img_curr, ((0, Hp - H), (0, Wp - W)), mode="edge")

    kernel, RY_S, RX = _level_kernel_factory(Hp, Wp, P, S, T, iters, eps, interpret)
    out_pts, out_good = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pts_prev
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pts_cur
            pl.BlockSpec(memory_space=pltpu.VMEM),  # img_prev (whole level)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # img_curr
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), img_prev.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((min(RY_S, 48), min(RX, 256)), img_prev.dtype),
        ],
        interpret=interpret,
    )(pts_prev, pts_cur, img_prev, img_curr)

    pts = out_pts
    good = out_good[:, 0] > 0
    if not final_level:
        return pts, jnp.ones(N, bool)
    r = win // 2 + 1
    inb = (pts[:, 0] >= r) & (pts[:, 0] < W - r) & (pts[:, 1] >= r) & (pts[:, 1] < H - r)
    inb = inb & (pts_prev[:, 0] >= r) & (pts_prev[:, 0] < W - r)
    inb = inb & (pts_prev[:, 1] >= r) & (pts_prev[:, 1] < H - r)
    return pts, good & inb


def optical_flow_pyr_lk_pallas(
    pyr_prev: Sequence[jnp.ndarray],
    pyr_curr: Sequence[jnp.ndarray],
    pts_prev: jnp.ndarray,
    pts_curr_init: jnp.ndarray,
    valid_in: jnp.ndarray,
    win: int = 15,
    iters: int = 30,
    eps: float = 0.01,
    interpret: bool = False,
) -> KltResult:
    """Drop-in replacement for klt.optical_flow_pyr_lk (same semantics).

    Levels too small for the aligned-block machinery fall back to passing
    the guess through (they contribute <1 px of refinement)."""
    L = len(pyr_prev)
    scale = 2.0 ** (L - 1)
    pts = pts_curr_init / scale
    valid = valid_in

    for lvl in range(L - 1, -1, -1):
        s = 2.0**lvl
        pts, ok = _track_level_pallas(
            pyr_prev[lvl], pyr_curr[lvl], pts_prev / s, pts, win, iters, eps,
            lvl == 0, interpret,
        )
        valid = valid & ok
        if lvl > 0:
            pts = pts * 2.0

    return KltResult(pts=pts, valid=valid)
