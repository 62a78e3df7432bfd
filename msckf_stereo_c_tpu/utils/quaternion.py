"""JPL-convention quaternion operations (pure jnp, batch-friendly).

The filter state stores orientations as JPL quaternions ``[x, y, z, w]``
representing the rotation *world -> body* (same convention as the reference
engine's ``cg::Quarternion``, see /root/reference/msckf_core/include/common/
imu_state.h:40-44 and Trawny & Roumeliotis TR-2005-002).  All functions are
shape-polymorphic over leading batch dimensions and keep the input dtype.

Hamilton-convention output (for TUM trajectory export, matching the
reference's ``quarternion_hamilton`` at msckf_vio.cpp:1251) is provided by
:func:`jpl_to_hamilton`.
"""
from __future__ import annotations

import jax.numpy as jnp

from .lie import skew


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_identity(dtype=jnp.float64) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def jpl_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """JPL quaternion [x,y,z,w] -> rotation matrix C(q) (world->body).

    Trawny eq. (90): C = (2w^2-1) I - 2w [qv]x + 2 qv qv^T.
    For the identity quaternion this returns the identity matrix.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    eye = jnp.eye(3, dtype=q.dtype)
    outer = qv[..., :, None] * qv[..., None, :]
    return (
        (2.0 * w[..., None] * w[..., None, :] - 1.0) * eye
        - 2.0 * w[..., None] * skew(qv)
        + 2.0 * outer
    )


def rot_to_jpl(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (world->body) -> JPL quaternion [x,y,z,w].

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the best-conditioned one with ``where`` masks so
    it vmaps and jits cleanly (no data-dependent control flow).
    """
    t = jnp.trace(R.swapaxes(-1, -2) if False else R)  # trace over last two dims
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    d = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2], t], axis=-1)
    # Candidate squared magnitudes (scaled by 4): 1+2*dii-t for i, 1+t for w.
    m = jnp.stack(
        [
            1.0 + 2.0 * R[..., 0, 0] - t,
            1.0 + 2.0 * R[..., 1, 1] - t,
            1.0 + 2.0 * R[..., 2, 2] - t,
            1.0 + t,
        ],
        axis=-1,
    )
    m = jnp.maximum(m, 0.0)
    idx = jnp.argmax(m, axis=-1)
    s = jnp.sqrt(jnp.take_along_axis(m, idx[..., None], axis=-1))[..., 0]  # 2*|q_idx|
    inv = 1.0 / jnp.where(s == 0, 1.0, s)

    # JPL C(q): off-diagonal sums / differences.
    # C = (2w^2-1)I - 2w[qv]x + 2 qv qv^T
    # C[i,j]+C[j,i] = 4 qi qj (i!=j);  C[i,j]-C[j,i] = -4 w q_k eps_{ijk}... sign care:
    # -2w[qv]x contributes C[0,1] = 2 q0 q1 + 2 w q2 ; C[1,0] = 2 q0 q1 - 2 w q2.
    s01 = R[..., 0, 1] + R[..., 1, 0]  # 4 x y
    s02 = R[..., 0, 2] + R[..., 2, 0]  # 4 x z
    s12 = R[..., 1, 2] + R[..., 2, 1]  # 4 y z
    d01 = R[..., 0, 1] - R[..., 1, 0]  # 4 w z
    d20 = R[..., 2, 0] - R[..., 0, 2]  # 4 w y
    d12 = R[..., 1, 2] - R[..., 2, 1]  # 4 w x

    q_from_x = jnp.stack([0.5 * s, 0.5 * s01 * inv, 0.5 * s02 * inv, 0.5 * d12 * inv], axis=-1)
    q_from_y = jnp.stack([0.5 * s01 * inv, 0.5 * s, 0.5 * s12 * inv, 0.5 * d20 * inv], axis=-1)
    q_from_z = jnp.stack([0.5 * s02 * inv, 0.5 * s12 * inv, 0.5 * s, 0.5 * d01 * inv], axis=-1)
    q_from_w = jnp.stack([0.5 * d12 * inv, 0.5 * d20 * inv, 0.5 * d01 * inv, 0.5 * s], axis=-1)

    cand = jnp.stack([q_from_x, q_from_y, q_from_z, q_from_w], axis=-2)
    q = jnp.take_along_axis(cand, idx[..., None, None], axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    return quat_normalize(q)


def quat_multiply(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """JPL quaternion product q (x) p with C(q (x) p) = C(q) C(p).

    Trawny eq. (6) (JPL convention):
      (q (x) p)_v = q4 p_v + p4 q_v - q_v x p_v
      (q (x) p)_4 = q4 p4 - q_v . p_v
    """
    qv, qw = q[..., :3], q[..., 3:4]
    pv, pw = p[..., :3], p[..., 3:4]
    v = qw * pv + pw * qv - jnp.cross(qv, pv)
    w = qw * pw - jnp.sum(qv * pv, axis=-1, keepdims=True)
    return quat_normalize(jnp.concatenate([v, w], axis=-1))


def small_angle_quaternion(dtheta: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a small error-angle vector (JPL), matching the
    reference's ``Quarternion::small_angle_quaternion`` semantics:
    dq = dtheta/2; if |dq|^2 < 1: q=[dq, sqrt(1-|dq|^2)] else [dq,1]/sqrt(1+|dq|^2).
    """
    dq = 0.5 * dtheta
    nsq = jnp.sum(dq * dq, axis=-1, keepdims=True)
    small = nsq < 1.0
    w_small = jnp.sqrt(jnp.maximum(1.0 - nsq, 0.0))
    scale_big = 1.0 / jnp.sqrt(1.0 + nsq)
    v = jnp.where(small, dq, dq * scale_big)
    w = jnp.where(small, w_small, scale_big)
    return jnp.concatenate([v, w], axis=-1)


def jpl_to_hamilton(q: jnp.ndarray) -> jnp.ndarray:
    """Convert a JPL world->body quaternion to the Hamilton body->world
    quaternion [x,y,z,w] used for trajectory export (TUM format).

    C_jpl(q) = R_w_b; the Hamilton quaternion of R_b_w = R_w_b^T has the same
    vector part sign flip: q_ham = [-qx, -qy, -qz, qw] ... and representing
    the *inverse* rotation flips it back, so the exported quaternion equals
    the JPL components unchanged interpreted as Hamilton of R_b_w.
    """
    # R_b_w = C(q)^T. Hamilton quaternion p with R_H(p) = R_b_w satisfies
    # p = [qx, qy, qz, qw] (JPL C(q) equals Hamilton R of conjugate; the
    # transpose cancels the conjugation).
    return q


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by C(q): world->body application."""
    R = jpl_to_rot(q)
    return jnp.einsum("...ij,...j->...i", R, v)
