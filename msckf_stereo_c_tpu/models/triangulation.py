"""Batched inverse-depth Levenberg–Marquardt feature triangulation.

Re-design of the reference's per-feature ``Feature::initializePosition`` /
``checkMotion`` / ``generateInitialGuess`` (feature.hpp:231-450): the nested
outer/inner LM loops with dynamic trip counts become a fixed-iteration damped
LM (recompute-accept/reject-adjust-lambda each step), vmapped over the whole
track pool; each track sees up to ``2M`` masked stereo observations.

Frames: a camera slot contributes two poses (cam0, cam1); all poses are
expressed relative to the *first valid* cam0 frame, as in the reference
(feature.hpp:325-327).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import solve3x3
from ..utils.quaternion import jpl_to_rot

_LM_ITERS = 30
_HUBER_EPS = 0.01
_LAMBDA_INIT = 1e-3
_LAMBDA_MIN = 1e-10
_LAMBDA_MAX = 1e12
_PRECISION = 5e-7


class TriangulationResult(NamedTuple):
    pos_w: jnp.ndarray  # (..., 3) world-frame position
    valid: jnp.ndarray  # (...,) bool cheirality check over valid poses
    base_slot: jnp.ndarray  # (...,) int32 first valid cam slot


def _stereo_pose_stack(cam_q, cam_p, obs_valid, R_c0_c1, t_c0_c1):
    """Per-slot cam0/cam1 poses re-based to the first valid cam0 frame.

    Returns (R (2M,3,3), t (2M,3)) with ``x_ci = R_i x_base + t_i`` plus the
    base (cam0->world) transform of the first valid slot."""
    M = cam_q.shape[0]
    R_w_c0 = jpl_to_rot(cam_q)  # (M,3,3) world->cam0
    # cam0 -> world: (R_w_c0^T, p)
    R_c0_w = jnp.swapaxes(R_w_c0, -1, -2)
    # cam1 -> world = (cam0->world) . (cam1->cam0); cam1->cam0 = T_cam0_cam1^-1
    R_c1_c0 = R_c0_c1.T
    t_c1_c0 = -R_c0_c1.T @ t_c0_c1
    R_c1_w = R_c0_w @ R_c1_c0
    t_c1_w = jnp.einsum("mij,j->mi", R_c0_w, t_c1_c0) + cam_p

    i0 = jnp.argmax(obs_valid)  # first valid slot
    Rb = R_c0_w[i0]  # base cam0 -> world
    tb = cam_p[i0]

    # pose_i = (cam_i <- world) . (world <- base) : R_i = R_{c_i w} Rb, etc.
    def rel(Rcw, tcw):
        # world -> cam_i is (Rcw^T? careful): (R, t) maps cam->world; inverse:
        Rwc = jnp.swapaxes(Rcw, -1, -2)
        twc = -jnp.einsum("mij,mj->mi", Rwc, tcw)
        Rrel = jnp.einsum("mij,jk->mik", Rwc, Rb)
        trel = jnp.einsum("mij,j->mi", Rwc, tb) + twc
        return Rrel, trel

    R0, t0 = rel(R_c0_w, cam_p)
    R1, t1 = rel(R_c1_w, t_c1_w)
    # Interleave: entry 2i = cam0 slot i, 2i+1 = cam1 slot i.
    R = jnp.stack([R0, R1], axis=1).reshape(2 * M, 3, 3)
    t = jnp.stack([t0, t1], axis=1).reshape(2 * M, 3)
    return R, t, Rb, tb, i0


def _initial_guess(R, t, z_first, z_last, i_last2):
    """Two-view linear depth (feature.hpp:231-255): uses the base cam0 ray and
    the last cam1 observation (pose index ``i_last2`` in the 2M stack)."""
    Rr = R[i_last2]
    tr = t[i_last2]
    m = Rr @ jnp.array([z_first[0], z_first[1], 1.0], dtype=R.dtype)
    A0 = m[0] - z_last[0] * m[2]
    A1 = m[1] - z_last[1] * m[2]
    b0 = z_last[0] * tr[2] - tr[0]
    b1 = z_last[1] * tr[2] - tr[1]
    depth = (A0 * b0 + A1 * b1) / jnp.maximum(A0 * A0 + A1 * A1, 1e-12)
    return jnp.array([z_first[0] * depth, z_first[1] * depth, depth], dtype=R.dtype)


def _cost(R, t, w_valid, x, z):
    """Total reprojection cost over the masked 2M measurements."""
    h = jnp.einsum("mij,j->mi", R, jnp.concatenate([x[:2], jnp.ones_like(x[:1])])) + x[2] * t
    zhat = h[:, :2] / h[:, 2:3]
    e = jnp.sum((zhat - z) ** 2, axis=-1)
    return jnp.sum(jnp.where(w_valid, e, 0.0))


def _normal_equations(R, t, w_valid, x, z):
    """Masked, Huber-weighted J^T J and J^T r over all measurements."""
    h = jnp.einsum("mij,j->mi", R, jnp.concatenate([x[:2], jnp.ones_like(x[:1])])) + x[2] * t
    h1, h2, h3 = h[:, 0], h[:, 1], h[:, 2]
    # W = [R[:, :, 0:2] | t] ; J = d(zhat)/d(alpha,beta,rho)
    W = jnp.concatenate([R[:, :, :2], t[:, :, None]], axis=2)  # (2M,3,3)
    J0 = W[:, 0, :] / h3[:, None] - (h1 / (h3 * h3))[:, None] * W[:, 2, :]
    J1 = W[:, 1, :] / h3[:, None] - (h2 / (h3 * h3))[:, None] * W[:, 2, :]
    zhat = jnp.stack([h1 / h3, h2 / h3], axis=-1)
    r = zhat - z  # (2M, 2)
    e = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(e <= _HUBER_EPS, 1.0, jnp.sqrt(2.0 * _HUBER_EPS / jnp.maximum(e, 1e-12)))
    w2 = jnp.where(w_valid, w * w, 0.0)
    J = jnp.stack([J0, J1], axis=1)  # (2M, 2, 3)
    A = jnp.einsum("m,mia,mib->ab", w2, J, J)
    b = jnp.einsum("m,mia,mi->a", w2, J, r)
    return A, b


def triangulate_track(
    obs: jnp.ndarray,  # (M, 4) normalized stereo observations
    obs_valid: jnp.ndarray,  # (M,)
    cam_q: jnp.ndarray,  # (M, 4)
    cam_p: jnp.ndarray,  # (M, 3)
    R_c0_c1: jnp.ndarray,
    t_c0_c1: jnp.ndarray,
) -> TriangulationResult:
    dtype = obs.dtype
    M = obs.shape[0]
    R, t, Rb, tb, i0 = _stereo_pose_stack(cam_q, cam_p, obs_valid, R_c0_c1, t_c0_c1)

    z = obs.reshape(M, 2, 2).reshape(2 * M, 2)  # interleaved cam0, cam1
    w_valid = jnp.repeat(obs_valid, 2)

    i_last = M - 1 - jnp.argmax(obs_valid[::-1])
    z_first = obs[i0, 0:2]
    z_last = obs[i_last, 2:4]
    p0 = _initial_guess(R, t, z_first, z_last, 2 * i_last + 1)

    safe_depth = jnp.where(jnp.abs(p0[2]) > 1e-8, p0[2], 1.0)
    x0 = jnp.array([p0[0] / safe_depth, p0[1] / safe_depth, 1.0 / safe_depth], dtype)

    cost0 = _cost(R, t, w_valid, x0, z)

    def lm_cond(carry):
        _, _, _, delta_norm, it = carry
        return (it < _LM_ITERS) & (delta_norm > _PRECISION)

    def lm_step(carry):
        x, lam, cost, _, it = carry
        A, b = _normal_equations(R, t, w_valid, x, z)
        A_d = A + lam * jnp.eye(3, dtype=dtype)
        delta = solve3x3(A_d, b)
        x_new = x - delta
        cost_new = _cost(R, t, w_valid, x_new, z)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * 0.1, _LAMBDA_MIN),
            jnp.minimum(lam * 10.0, _LAMBDA_MAX),
        )
        return (x, lam, cost, jnp.linalg.norm(delta), it + 1)

    # Early-exit LM (the reference's outer loop stops at delta < 5e-7,
    # feature.hpp:440-444); under vmap this runs until the whole pool is done.
    (x, _, _, _, _) = jax.lax.while_loop(
        lm_cond,
        lm_step,
        (
            x0,
            jnp.asarray(_LAMBDA_INIT, dtype),
            cost0,
            jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32),
        ),
    )

    inv_rho = 1.0 / jnp.where(jnp.abs(x[2]) > 1e-12, x[2], 1e-12)
    p_base = jnp.array([x[0] * inv_rho, x[1] * inv_rho, inv_rho], dtype)

    # Cheirality: feature must be in front of every observing camera.
    depths = (jnp.einsum("mij,j->mi", R, p_base) + t)[:, 2]
    valid = jnp.all(jnp.where(w_valid, depths > 0, True))
    valid = valid & (jnp.sum(obs_valid) >= 2)

    pos_w = Rb @ p_base + tb
    return TriangulationResult(pos_w=pos_w, valid=valid, base_slot=i0)


# vmapped over the track pool (K tracks at once).
triangulate_tracks = jax.vmap(triangulate_track, in_axes=(0, 0, None, None, None, None))


def check_motion(
    obs: jnp.ndarray,
    obs_valid: jnp.ndarray,
    cam_q: jnp.ndarray,
    cam_p: jnp.ndarray,
    translation_threshold,
) -> jnp.ndarray:
    """Parallax gate (feature.hpp:257-287): orthogonal component of the
    first->last camera translation w.r.t. the first observation ray.
    A negative threshold disables the gate (EuRoC config uses -1.0)."""
    M = obs.shape[0]
    i0 = jnp.argmax(obs_valid)
    i1 = M - 1 - jnp.argmax(obs_valid[::-1])
    R0 = jpl_to_rot(cam_q[i0])  # world->cam0
    ray_c = jnp.concatenate([obs[i0, 0:2], jnp.ones_like(obs[i0, :1])])
    ray_c = ray_c / jnp.linalg.norm(ray_c)
    ray_w = R0.T @ ray_c
    translation = cam_p[i1] - cam_p[i0]
    parallel = jnp.dot(translation, ray_w)
    orthogonal = translation - parallel * ray_w
    return jnp.linalg.norm(orthogonal) > translation_threshold


check_motion_tracks = jax.vmap(check_motion, in_axes=(0, 0, None, None, None))
