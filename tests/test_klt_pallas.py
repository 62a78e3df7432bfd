"""Pallas KLT (interpret mode) must match the GEMM path."""
import cv2
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.ops.klt_gemm import optical_flow_pyr_lk_gemm
from msckf_stereo_c_tpu.ops.klt_pallas import optical_flow_pyr_lk_pallas


def _pyr(img, levels=4):
    out = [img]
    for _ in range(levels - 1):
        out.append(cv2.pyrDown(out[-1]))
    return [jnp.asarray(x) for x in out]


def test_pallas_matches_gemm_interpret():
    rng = np.random.default_rng(5)
    H, W = 240, 320
    img = 60.0 + 20.0 * np.sin(np.arange(W) / 13.0)[None, :] + 15.0 * np.cos(np.arange(H) / 9.0)[:, None]
    yy, xx = np.mgrid[-4:5, -4:5]
    for _ in range(70):
        x, y = rng.integers(8, W - 8), rng.integers(8, H - 8)
        img[y - 4 : y + 5, x - 4 : x + 5] += rng.uniform(60, 150) * np.exp(-(xx**2 + yy**2) / 4.0)
    img = np.clip(img, 0, 255).astype(np.float32)
    img2 = cv2.warpAffine(img, np.float32([[1, 0, 4.3], [0, 1, -3.1]]), (W, H))

    p1, p2 = _pyr(img), _pyr(img2)
    pts = jnp.asarray(rng.uniform(40, 180, (16, 2)), jnp.float32)
    v = jnp.ones(16, bool)

    a = optical_flow_pyr_lk_gemm(p1, p2, pts, pts, v, 15, 30, 0.01)
    b = optical_flow_pyr_lk_pallas(p1, p2, pts, pts, v, 15, 30, 0.01, interpret=True)
    ok = np.asarray(a.valid) & np.asarray(b.valid)
    assert ok.sum() >= 12
    np.testing.assert_allclose(
        np.asarray(a.pts)[ok], np.asarray(b.pts)[ok], atol=1e-3
    )
