"""Device-side stereo renderer: the JAX twin of ``sim/render.py``.

The numpy renderer costs ~0.8 s per stereo pair on this host — fine for
20-frame unit tests, prohibitive for the V1_01-length (>=120 s, >=2400
frame) stress gates.  This renderer runs the same raycast (procedural
texture on a finite cylinder + caps, full radtan lens model, Gaussian
landmark blobs) as a jitted, vmappable JAX program, so long sequences
render on the TPU in seconds and feed the pipeline without a host
round-trip.

It additionally implements the stress channels the V1_01-realistic gate
needs (VERDICT round 1, "what's missing" #1):

* per-frame texture/blob gain (texture-poor intervals -> feature dropout),
* per-frame global brightness gain/offset (exposure drift),
* a world-space sphere occluder (geometrically consistent between the two
  cameras — tracks crossing it genuinely die).

Equivalence with the numpy renderer on the un-stressed channels is tested
in tests/test_render_jax.py."""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EUROC_CALIB, StereoCalib
from .render import _Texture, _ray_lut
from .trajectory import SimTrajectory


@dataclasses.dataclass
class StressEvents:
    """Per-frame stress schedule (all arrays (T,) unless noted)."""

    tex_scale: np.ndarray  # texture AC amplitude multiplier (1 = nominal)
    blob_scale: np.ndarray  # landmark blob amplitude multiplier
    gain: np.ndarray  # global brightness gain
    offset: np.ndarray  # global brightness offset (intensity units)
    occ_pos: np.ndarray  # (T, 3) occluder sphere center in world
    occ_radius: np.ndarray  # occluder radius in meters (0 = off)

    @staticmethod
    def nominal(T: int) -> "StressEvents":
        return StressEvents(
            tex_scale=np.ones(T),
            blob_scale=np.ones(T),
            gain=np.ones(T),
            offset=np.zeros(T),
            occ_pos=np.zeros((T, 3)),
            occ_radius=np.zeros(T),
        )


def make_stress_events(
    traj: SimTrajectory,
    frame_indices: np.ndarray,
    orbit_angle: Optional[np.ndarray] = None,
    occ_orbit_radius: float = 5.5,
    occ_max_radius: float = 0.8,
) -> StressEvents:
    """The standard stress schedule, windowed by normalized sequence time:

    * [0.22, 0.36] and [0.58, 0.72]: texture-poor (texture AC -> 0.15,
      blob amplitude -> 0.35) — the KLT loses its background anchors and
      FAST loses most candidates;
    * [0.42, 0.56]: an occluder sphere (0.8 m, sized for the 7 m room —
      a person-scale obstruction) parked in front of the wall at the
      azimuth the camera sweeps mid-window — tracks die crossing it;
    * whole run: slow sinusoidal exposure drift (gain 1 +/- 0.25, offset
      +/- 12 intensity units) plus a linear darkening trend.
    """
    t = traj.t[frame_indices]
    u = (t - t[0]) / max(t[-1] - t[0], 1e-9)
    T = len(t)

    def window(lo, hi, ramp=0.02):
        # Smooth 0->1->0 window over normalized time.
        up = np.clip((u - lo) / ramp, 0.0, 1.0)
        dn = np.clip((hi - u) / ramp, 0.0, 1.0)
        return np.minimum(up, dn)

    poor = np.maximum(window(0.22, 0.36), window(0.58, 0.72))
    tex_scale = 1.0 - 0.85 * poor
    blob_scale = 1.0 - 0.65 * poor

    gain = 1.0 + 0.25 * np.sin(2 * np.pi * u * 3.1) - 0.1 * u
    offset = 12.0 * np.sin(2 * np.pi * u * 1.7 + 1.0)

    occ_w = window(0.42, 0.56, ramp=0.04)
    if orbit_angle is None:
        # Camera azimuth proxy: angle of the body position on its orbit.
        orbit_angle = np.arctan2(traj.p[frame_indices, 1], traj.p[frame_indices, 0])
    mid = int(np.clip(np.searchsorted(u, 0.49), 0, T - 1))
    az = float(orbit_angle[mid])
    occ_pos = np.tile(
        np.array([occ_orbit_radius * np.cos(az), occ_orbit_radius * np.sin(az), 0.3]),
        (T, 1),
    )
    occ_radius = occ_max_radius * occ_w
    return StressEvents(
        tex_scale=tex_scale,
        blob_scale=blob_scale,
        gain=gain,
        offset=offset,
        occ_pos=occ_pos,
        occ_radius=occ_radius,
    )


class JaxRenderer:
    """Precompute the scene constants once; render frames on device.

    Cites the same reference-world geometry as sim/render.py (wall cylinder
    + caps + blob landmarks); all per-frame math is jnp and jit/vmap-able."""

    def __init__(
        self,
        landmarks: np.ndarray,
        calib: StereoCalib = EUROC_CALIB,
        min_depth: float = 0.3,
        blob_radius: int = 4,
        seed: int = 5,
        r_wall: float = 12.0,
        z_cap: float = 8.0,
        dtype=jnp.float32,
    ):
        rng = np.random.default_rng(seed)
        W, H = calib.cam0.resolution
        self.H, self.W = H, W
        self.r_wall = r_wall
        self.z_cap = z_cap
        self.min_depth = min_depth
        self.blob_radius = blob_radius
        self.dtype = dtype

        L = landmarks.shape[0]
        # Same draw order/shapes as render.render_stereo_sequence.
        self.amp = jnp.asarray(rng.uniform(60.0, 140.0, L), dtype)
        self.sx = jnp.asarray(rng.uniform(1.1, 1.8, L), dtype)
        self.sy = jnp.asarray(rng.uniform(1.1, 1.8, L), dtype)
        self.landmarks = jnp.asarray(landmarks, dtype)

        tex = _Texture(seed)
        self.tex_fa = jnp.asarray(tex.fa, dtype)
        self.tex_fz = jnp.asarray(tex.fz, dtype)
        self.tex_pa = jnp.asarray(tex.pa, dtype)
        self.tex_pz = jnp.asarray(tex.pz, dtype)
        self.tex_amp = jnp.asarray(tex.amp, dtype)

        T_ci0 = calib.cam0.T_cam_imu_mat()
        T01 = calib.T_cam0_cam1_mat()
        T_ci1 = T01 @ T_ci0
        self.cams = []
        for T_ci, cam in ((T_ci0, calib.cam0), (T_ci1, calib.cam1)):
            rays = _ray_lut(cam.intrinsics, cam.distortion_coeffs, W, H)
            self.cams.append(
                dict(
                    R_ci=jnp.asarray(T_ci[:3, :3], dtype),
                    t_ci=jnp.asarray(T_ci[:3, 3], dtype),
                    rays=jnp.asarray(rays, dtype),
                    intr=jnp.asarray(cam.intrinsics, dtype),
                    dist=jnp.asarray(cam.distortion_coeffs, dtype),
                )
            )

    # ---- per-frame pieces -------------------------------------------------

    def _texture(self, theta, z, tex_scale):
        out = jnp.full(theta.shape, 70.0, self.dtype)
        # (n,) coefficient arrays against (...,) angle fields.
        ang_a = theta[..., None] * self.tex_fa + self.tex_pa
        ang_z = z[..., None] * self.tex_fz + self.tex_pz
        ac = jnp.sum(self.tex_amp * jnp.sin(ang_a) * jnp.sin(ang_z), axis=-1)
        return out + tex_scale * ac

    def _raycast(self, R_c_w, o_w, rays, tex_scale):
        # HIGHEST precision: on TPU the default f32 matmul uses bf16 passes,
        # which would warp the rendered geometry by ~px at the image edges —
        # the harness must be exact regardless of platform defaults.
        d = jnp.matmul(
            rays.reshape(-1, 3), R_c_w.T, precision=jax.lax.Precision.HIGHEST
        )
        o = o_w[None, :]
        a = d[:, 0] ** 2 + d[:, 1] ** 2
        b = 2.0 * (o[:, 0] * d[:, 0] + o[:, 1] * d[:, 1])
        c = o[:, 0] ** 2 + o[:, 1] ** 2 - self.r_wall**2
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        t_cyl = (-b + jnp.sqrt(disc)) / jnp.maximum(2 * a, 1e-12)

        dz = jnp.where(jnp.abs(d[:, 2]) > 1e-9, d[:, 2], 1e-9)
        t_top = (self.z_cap - o[:, 2]) / dz
        t_bot = (-self.z_cap - o[:, 2]) / dz

        p_cyl_z = o[:, 2] + t_cyl * d[:, 2]
        use_cyl = (jnp.abs(p_cyl_z) <= self.z_cap) & (t_cyl > 0)
        t_cap = jnp.where(d[:, 2] > 0, t_top, t_bot)
        t = jnp.where(use_cyl, t_cyl, jnp.maximum(t_cap, 0.1))

        p = o + t[:, None] * d
        theta = jnp.arctan2(p[:, 1], p[:, 0])
        zc = jnp.where(
            use_cyl,
            p[:, 2],
            jnp.hypot(p[:, 0], p[:, 1]) * jnp.sign(p[:, 2]) * 0.6,
        )
        img = self._texture(theta, zc, tex_scale).reshape(self.H, self.W)
        return img, d.reshape(self.H, self.W, 3), t.reshape(self.H, self.W)

    def _project(self, p_cam, intr, dist):
        fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
        k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
        z = jnp.where(p_cam[:, 2] != 0, p_cam[:, 2], 1.0)
        x = p_cam[:, 0] / z
        y = p_cam[:, 1] / z
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return jnp.stack([xd * fx + cx, yd * fy + cy], axis=1)

    def _render_one_cam(self, cam, R_wb, p_b, p_imu, ev):
        R_ci, t_ci = cam["R_ci"], cam["t_ci"]
        R_w_c = R_ci @ R_wb
        R_c_w = R_w_c.T
        o_w = p_b + R_wb.T @ (-R_ci.T @ t_ci)

        img, d_w, t_bg = self._raycast(R_c_w, o_w, cam["rays"], ev["tex_scale"])

        # Landmark blobs.
        p_c = jnp.matmul(p_imu, R_ci.T, precision=jax.lax.Precision.HIGHEST) + t_ci
        vis = p_c[:, 2] > self.min_depth
        uv = self._project(jnp.where(vis[:, None], p_c, 1.0), cam["intr"], cam["dist"])
        r = self.blob_radius
        vis &= (uv[:, 0] > r + 3) & (uv[:, 0] < self.W - r - 4)
        vis &= (uv[:, 1] > r + 3) & (uv[:, 1] < self.H - r - 4)

        cx_i = jnp.round(uv[:, 0]).astype(jnp.int32)
        cy_i = jnp.round(uv[:, 1]).astype(jnp.int32)
        gy, gx = jnp.mgrid[-r : r + 1, -r : r + 1]
        gy, gx = gy.astype(jnp.int32), gx.astype(jnp.int32)
        du = gx[None].astype(self.dtype) + (cx_i.astype(self.dtype) - uv[:, 0])[:, None, None]
        dv = gy[None].astype(self.dtype) + (cy_i.astype(self.dtype) - uv[:, 1])[:, None, None]
        blob = (
            ev["blob_scale"]
            * self.amp[:, None, None]
            * jnp.exp(
                -0.5
                * (
                    (du / self.sx[:, None, None]) ** 2
                    + (dv / self.sy[:, None, None]) ** 2
                )
            )
        )
        blob = jnp.where(vis[:, None, None], blob, 0.0)
        iy = cy_i[:, None, None] + gy[None]
        ix = cx_i[:, None, None] + gx[None]
        # Clip instead of drop: invisible landmarks carry zero weight, and
        # visible ones are >= r+3 px inside the border by construction.
        iy = jnp.clip(iy, 0, self.H - 1)
        ix = jnp.clip(ix, 0, self.W - 1)
        img = img.at[iy, ix].add(blob)

        # World-space sphere occluder: flat-shaded, geometrically consistent
        # between the cameras; drawn over background and blobs (it sits in
        # front of the wall).
        oc = ev["occ_pos"] - o_w
        t_close = d_w @ oc  # rays are unit-norm
        dist2 = jnp.sum(oc * oc) - t_close * t_close
        hit = (
            (ev["occ_radius"] > 0)
            & (t_close > self.min_depth)
            & (dist2 < ev["occ_radius"] ** 2)
            & (t_close < t_bg)
        )
        img = jnp.where(hit, 42.0, img)

        img = ev["gain"] * img + ev["offset"]
        return jnp.clip(img, 0.0, 255.0)

    def render_frame(self, R_wb, p_b, ev):
        """(3,3), (3,), per-frame event dict -> (img0, img1)."""
        p_imu = jnp.matmul(
            self.landmarks - p_b, R_wb.T, precision=jax.lax.Precision.HIGHEST
        )
        img0 = self._render_one_cam(self.cams[0], R_wb, p_b, p_imu, ev)
        img1 = self._render_one_cam(self.cams[1], R_wb, p_b, p_imu, ev)
        return img0, img1

    @partial(jax.jit, static_argnums=0)
    def render_frames(self, R_wb, p_b, tex_scale, blob_scale, gain, offset, occ_pos, occ_radius):
        """Batched render: (T,3,3),(T,3),(T,),... -> ((T,H,W), (T,H,W))."""

        def one(R, p, ts, bs, g, off, op, orad):
            return self.render_frame(
                R, p,
                dict(tex_scale=ts, blob_scale=bs, gain=g, offset=off,
                     occ_pos=op, occ_radius=orad),
            )

        return jax.vmap(one)(R_wb, p_b, tex_scale, blob_scale, gain, offset, occ_pos, occ_radius)

    def render_sequence(
        self,
        traj: SimTrajectory,
        frame_indices: np.ndarray,
        events: Optional[StressEvents] = None,
        chunk: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host convenience: chunked device render -> host arrays."""
        T = len(frame_indices)
        ev = events or StressEvents.nominal(T)
        R = jnp.asarray(traj.R_w_b[frame_indices], self.dtype)
        p = jnp.asarray(traj.p[frame_indices], self.dtype)
        args = [
            jnp.asarray(ev.tex_scale, self.dtype),
            jnp.asarray(ev.blob_scale, self.dtype),
            jnp.asarray(ev.gain, self.dtype),
            jnp.asarray(ev.offset, self.dtype),
            jnp.asarray(ev.occ_pos, self.dtype),
            jnp.asarray(ev.occ_radius, self.dtype),
        ]
        outs0, outs1 = [], []
        for s0 in range(0, T, chunk):
            s1 = min(s0 + chunk, T)
            i0, i1 = self.render_frames(
                R[s0:s1], p[s0:s1], *[a[s0:s1] for a in args]
            )
            outs0.append(np.asarray(i0))
            outs1.append(np.asarray(i1))
        return np.concatenate(outs0), np.concatenate(outs1)
