"""IMU process model: RK4 state propagation + observability-constrained
covariance propagation, as a ``lax.scan`` over a fixed per-frame IMU batch.

TPU-native re-design of the reference's ``batchImuProcessing`` /
``processModel`` / ``predictNewState`` (msckf_vio.cpp:377-531): the dynamic
"loop over buffered IMU messages" becomes a scan over ``L`` fixed slots with
invalid slots masked by ``dt = 0`` (which makes the step an exact no-op:
Phi = I, Q = 0, state unchanged) — no data-dependent control flow.

The covariance step multiplies the *full* (D, D) covariance by
``blockdiag(Phi_21, I)``; the inactive camera block is zero so this equals
the reference's partitioned update (msckf_vio.cpp:457-469) while staying a
single MXU-friendly matmul.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.lie import skew
from ..utils.quaternion import jpl_to_rot, quat_normalize, rot_to_jpl
from .state import FilterState, ImuState


class ImuBatch(NamedTuple):
    """Fixed-size per-frame IMU slice; invalid slots have ``valid=False``."""

    time: jnp.ndarray  # (L,)
    gyro: jnp.ndarray  # (L, 3)
    acc: jnp.ndarray  # (L, 3)
    valid: jnp.ndarray  # (L,) bool


def initialize_gravity_bias(gyro: jnp.ndarray, acc: jnp.ndarray):
    """Gravity/bias initialization from a static window of IMU samples
    (reference initializeGravityAndBias, msckf_vio.cpp:209-241).

    Returns (q0 world->IMU JPL, gyro_bias, gravity_world)."""
    bg = jnp.mean(gyro, axis=0)
    gravity_imu = jnp.mean(acc, axis=0)
    g = jnp.linalg.norm(gravity_imu)
    gravity_world = jnp.stack([jnp.zeros_like(g), jnp.zeros_like(g), -g])
    # R with R @ gravity_imu_hat = +z_hat;  q0 = quat(R^T) ... the reference
    # computes from_two_vector(gravity_imu, -gravity).transpose().quarternion().
    from ..utils.lie import rot_from_two_vectors

    R = rot_from_two_vectors(gravity_imu, -gravity_world)
    q0 = rot_to_jpl(R.T)
    return q0, bg, gravity_world


def _predict_new_state(imu: ImuState, dt, gyro, acc, gravity):
    """RK4 on (q, v, p) with closed-form quaternion integration
    (reference predictNewState, msckf_vio.cpp:482-531)."""
    dtype = imu.q.dtype
    gyro_norm = jnp.linalg.norm(gyro)
    Omega = jnp.zeros((4, 4), dtype)
    Omega = Omega.at[:3, :3].set(-skew(gyro))
    Omega = Omega.at[:3, 3].set(gyro)
    Omega = Omega.at[3, :3].set(-gyro)

    eye4 = jnp.eye(4, dtype=dtype)
    big = gyro_norm > 1e-5
    safe_norm = jnp.where(big, gyro_norm, 1.0)

    def dq_at(frac):
        ang = gyro_norm * dt * frac
        m_big = jnp.cos(ang) * eye4 + jnp.sin(ang) / safe_norm * Omega
        m_small = (eye4 + 2.0 * frac * dt * 0.5 * Omega) * jnp.cos(ang)
        return jnp.where(big, m_big, m_small) @ imu.q

    dq_dt = dq_at(0.5)
    dq_dt2 = dq_at(0.25)
    dR_dt_T = jpl_to_rot(quat_normalize(dq_dt)).T
    dR_dt2_T = jpl_to_rot(quat_normalize(dq_dt2)).T

    R_wi_T = jpl_to_rot(imu.q).T
    k1_v_dot = R_wi_T @ acc + gravity
    k1_p_dot = imu.v
    k1_v = imu.v + k1_v_dot * dt / 2
    k2_v_dot = dR_dt2_T @ acc + gravity
    k2_p_dot = k1_v
    k2_v = imu.v + k2_v_dot * dt / 2
    k3_v_dot = dR_dt2_T @ acc + gravity
    k3_p_dot = k2_v
    k3_v = imu.v + k3_v_dot * dt
    k4_v_dot = dR_dt_T @ acc + gravity
    k4_p_dot = k3_v

    q_new = quat_normalize(dq_dt)
    v_new = imu.v + dt / 6 * (k1_v_dot + 2 * k2_v_dot + 2 * k3_v_dot + k4_v_dot)
    p_new = imu.p + dt / 6 * (k1_p_dot + 2 * k2_p_dot + 2 * k3_p_dot + k4_p_dot)
    return q_new, v_new, p_new


def process_model_step(
    state: FilterState, t, m_gyro, m_acc, Q_imu: jnp.ndarray, valid
) -> FilterState:
    """One IMU propagation step (reference processModel, msckf_vio.cpp:409-480).

    ``valid=False`` (or a non-increasing timestamp) collapses to dt=0 which
    leaves the state exactly unchanged."""
    imu = state.imu
    dtype = state.P.dtype
    D = state.P.shape[0]
    imu_new, Phi, Q = _imu_step(imu, t, m_gyro, m_acc, Q_imu, state.gravity, valid)

    Phi_full = jnp.eye(D, dtype=dtype).at[:21, :21].set(Phi)
    P = Phi_full @ state.P @ Phi_full.T
    P = P.at[:21, :21].add(Q)
    P = 0.5 * (P + P.T)
    return state._replace(imu=imu_new, P=P)


def _imu_step(imu: ImuState, t, m_gyro, m_acc, Q_imu, gravity, valid):
    """Nominal-state RK4 step + the 21x21 (Phi, Q) pair for this sample."""
    dtype = imu.q.dtype

    gyro = m_gyro - imu.bg
    acc = m_acc - imu.ba
    dt_raw = t - imu.time
    dt = jnp.where(valid & (dt_raw > 0), dt_raw, jnp.zeros((), dtype))

    R_wi_T = jpl_to_rot(imu.q).T

    # Continuous-time error-state dynamics (21x21 F, 21x12 G).
    F = jnp.zeros((21, 21), dtype)
    F = F.at[0:3, 0:3].set(-skew(gyro))
    F = F.at[0:3, 3:6].set(-jnp.eye(3, dtype=dtype))
    F = F.at[6:9, 0:3].set(-R_wi_T @ skew(acc))
    F = F.at[6:9, 9:12].set(-R_wi_T)
    F = F.at[12:15, 6:9].set(jnp.eye(3, dtype=dtype))

    G = jnp.zeros((21, 12), dtype)
    G = G.at[0:3, 0:3].set(-jnp.eye(3, dtype=dtype))
    G = G.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype))
    G = G.at[6:9, 6:9].set(-R_wi_T)
    G = G.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype))

    # 3rd-order matrix-exponential approximation of Phi.
    Fdt = F * dt
    Fdt2 = Fdt @ Fdt
    Phi = jnp.eye(21, dtype=dtype) + Fdt + 0.5 * Fdt2 + (1.0 / 6.0) * (Fdt2 @ Fdt)

    q_new, v_new, p_new = _predict_new_state(imu, dt, gyro, acc, gravity)

    # Observability-constrained modification of Phi rows {0, 6, 12}
    # (msckf_vio.cpp:442-455) against the FEJ shadow states.
    R_kk_1 = jpl_to_rot(imu.q_null)
    Phi = Phi.at[0:3, 0:3].set(jpl_to_rot(q_new) @ R_kk_1.T)
    u = R_kk_1 @ gravity
    s = u / jnp.dot(u, u)
    A1 = Phi[6:9, 0:3]
    w1 = skew(imu.v_null - v_new) @ gravity
    Phi = Phi.at[6:9, 0:3].set(A1 - jnp.outer(A1 @ u - w1, s))
    A2 = Phi[12:15, 0:3]
    w2 = skew(dt * imu.v_null + imu.p_null - p_new) @ gravity
    Phi = Phi.at[12:15, 0:3].set(A2 - jnp.outer(A2 @ u - w2, s))

    Q = (Phi @ G @ Q_imu @ G.T @ Phi.T) * dt

    # A masked/no-op sample (dt == 0) must leave EVERYTHING unchanged —
    # including Phi (the OC projection rewrites rows {0,6,12} from the
    # *_null states, which differ from the current state right after a
    # measurement update, so the unguarded dt=0 Phi is NOT the identity)
    # and the FEJ shadows themselves.
    stepped = valid & (dt_raw > 0)
    eye = jnp.eye(21, dtype=dtype)
    Phi = jnp.where(stepped, Phi, eye)
    Q = jnp.where(stepped, Q, jnp.zeros_like(Q))
    new_imu = imu._replace(
        q=q_new,
        v=v_new,
        p=p_new,
        q_null=jnp.where(stepped, q_new, imu.q_null),
        v_null=jnp.where(stepped, v_new, imu.v_null),
        p_null=jnp.where(stepped, p_new, imu.p_null),
        time=jnp.where(stepped, t, imu.time),
    )
    return new_imu, Phi, Q


def propagate(state: FilterState, batch: ImuBatch, Q_imu: jnp.ndarray) -> FilterState:
    """Batch IMU propagation (reference batchImuProcessing,
    msckf_vio.cpp:377-407).

    The scan composes the per-sample 21x21 transition/noise pairs
    (Phi_acc <- Phi_i Phi_acc, Q_acc <- Phi_i Q_acc Phi_i^T + Q_i) and the
    accumulated pair hits the full (D, D) covariance ONCE per frame — exact
    in exact arithmetic, and replaces L sequential D x D multiplies with
    L tiny 21 x 21 ones plus a single big one (the per-step symmetrization
    of the reference collapses into one final symmetrization)."""
    dtype = state.P.dtype
    D = state.P.shape[0]
    eye21 = jnp.eye(21, dtype=dtype)
    # The IMU stream may arrive in f64 (host packing); the filter dtype wins.
    batch = ImuBatch(
        time=batch.time.astype(dtype),
        gyro=batch.gyro.astype(dtype),
        acc=batch.acc.astype(dtype),
        valid=batch.valid,
    )

    def step(carry, x):
        imu, Phi_acc, Q_acc = carry
        t, gyro, acc, valid = x
        imu, Phi, Q = _imu_step(imu, t, gyro, acc, Q_imu, state.gravity, valid)
        Phi_acc = Phi @ Phi_acc
        Q_acc = Phi @ Q_acc @ Phi.T + Q
        return (imu, Phi_acc, Q_acc), None

    (imu, Phi_acc, Q_acc), _ = jax.lax.scan(
        step,
        (state.imu, eye21, jnp.zeros((21, 21), dtype)),
        (batch.time, batch.gyro, batch.acc, batch.valid),
    )

    P = state.P
    P = P.at[:21, :].set(Phi_acc @ P[:21, :])
    P = P.at[:, :21].set(P[:, :21] @ Phi_acc.T)
    P = P.at[:21, :21].add(Q_acc)
    P = 0.5 * (P + P.T)
    return state._replace(imu=imu, P=P)
