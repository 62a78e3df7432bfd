"""The correlation-surface KLT must reproduce the GEMM (and hence gather)
KLT: same inverse-compositional scheme, the per-iteration resampling replaced
by exact bilinear interpolation of precomputed gradient correlation surfaces
(see ops/klt_corr.py for the linearity identity)."""
import cv2
import jax.numpy as jnp
import numpy as np

from msckf_stereo_c_tpu.ops.klt import optical_flow_pyr_lk
from msckf_stereo_c_tpu.ops.klt_corr import optical_flow_pyr_lk_corr
from msckf_stereo_c_tpu.ops.klt_gemm import optical_flow_pyr_lk_gemm

from test_klt_gemm import _pyr, _test_image


def test_corr_matches_gemm():
    img = _test_image()
    M = np.float32([[1, 0, 4.3], [0, 1, -3.1]])
    img2 = cv2.warpAffine(img, M, (320, 240))
    pyr1, pyr2 = _pyr(img), _pyr(img2)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(40, 200, (24, 2)).astype(np.float32))
    valid = jnp.ones(24, bool)

    a = optical_flow_pyr_lk_gemm(pyr1, pyr2, pts, pts, valid, 15, 30, 0.01)
    b = optical_flow_pyr_lk_corr(pyr1, pyr2, pts, pts, valid, 15, 30, 0.01)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    ok = np.asarray(a.valid)
    np.testing.assert_allclose(np.asarray(a.pts)[ok], np.asarray(b.pts)[ok], atol=5e-2)
    expected = np.asarray(pts) + np.array([4.3, -3.1], np.float32)
    np.testing.assert_allclose(np.asarray(b.pts)[ok], expected[ok], atol=0.2)


def test_corr_matches_gather_identity():
    """Identity tracking at sub-pixel template positions must stay put."""
    img = _test_image(seed=9)
    pyr1 = _pyr(img)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        rng.uniform(40, 180, (16, 2)) + rng.uniform(0.1, 0.9, (16, 2)), jnp.float32
    )
    valid = jnp.ones(16, bool)
    a = optical_flow_pyr_lk(pyr1, pyr1, pts, pts, valid, 15, 30, 0.01)
    b = optical_flow_pyr_lk_corr(pyr1, pyr1, pts, pts, valid, 15, 30, 0.01)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(pts), atol=1e-3)
    # The corr path's rounding shifts the convergence point within the
    # track_precision (0.01 px) tolerance of the scheme itself.
    np.testing.assert_allclose(np.asarray(b.pts), np.asarray(pts), atol=2e-3)


def test_corr_pallas_kernel_interpret(monkeypatch):
    """The Pallas iteration kernel (interpret mode) must match the XLA loop,
    including under vmap (custom_vmap folds the batch into the feature axis)."""
    import jax
    import msckf_stereo_c_tpu.ops.klt_corr as kc

    img = _test_image()
    M = np.float32([[1, 0, 4.3], [0, 1, -3.1]])
    img2 = cv2.warpAffine(img, M, (320, 240))
    pyr1, pyr2 = _pyr(img, 2), _pyr(img2, 2)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(40, 200, (24, 2)).astype(np.float32))
    valid = jnp.ones(24, bool)

    xla = optical_flow_pyr_lk_corr(pyr1, pyr2, pts, pts, valid, 15, 30, 0.01)
    monkeypatch.setattr(kc, "_LOOP_MODE", "interpret")
    pal = optical_flow_pyr_lk_corr(pyr1, pyr2, pts, pts, valid, 15, 30, 0.01)
    np.testing.assert_array_equal(np.asarray(xla.valid), np.asarray(pal.valid))
    ok = np.asarray(xla.valid)
    np.testing.assert_allclose(np.asarray(xla.pts)[ok], np.asarray(pal.pts)[ok], atol=5e-2)

    B = 3
    batched = jax.jit(
        jax.vmap(lambda p: optical_flow_pyr_lk_corr(pyr1, pyr2, p, p, valid))
    )(jnp.broadcast_to(pts, (B, 24, 2)))
    np.testing.assert_allclose(
        np.asarray(batched.pts)[1][ok], np.asarray(pal.pts)[ok], atol=5e-2
    )


def test_corr_border_guesses():
    """Initial guesses outside the image / search range follow the gemm
    clamped-walk semantics exactly (the carried iterate is unclipped until
    the first update)."""
    img = _test_image(seed=3)
    img2 = np.roll(img, (2, 1), (0, 1))
    pyr1, pyr2 = _pyr(img, 2), _pyr(img2, 2)
    pts = jnp.asarray(
        [[9.0, 9.0], [310.0, 230.0], [160.0, 8.5], [8.2, 120.0]], jnp.float32
    )
    # Guesses pushed far off the true position, some outside the image.
    guess = pts + jnp.asarray([[25.0, 0.0], [15.0, 15.0], [-30.0, 2.0], [0.0, -20.0]], jnp.float32)
    valid = jnp.ones(4, bool)
    a = optical_flow_pyr_lk_gemm(pyr1, pyr2, pts, guess, valid, 15, 30, 0.01)
    b = optical_flow_pyr_lk_corr(pyr1, pyr2, pts, guess, valid, 15, 30, 0.01)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts), atol=5e-2)
