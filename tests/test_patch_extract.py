"""Pallas patch extraction vs the gather formulation (exact integer copies)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msckf_stereo_c_tpu.ops.patch_extract import extract_patches_pallas


def _oracle(img, org, S):
    return jax.vmap(lambda o: jax.lax.dynamic_slice(img, (o[1], o[0]), (S, S)))(org)


@pytest.mark.parametrize("shape,S", [((480, 752), 35), ((240, 376), 18), ((60, 94), 35)])
def test_matches_gather(shape, S):
    H, W = shape
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    N = 37
    org = jnp.asarray(
        np.stack(
            [rng.integers(0, W - S + 1, N), rng.integers(0, H - S + 1, N)], axis=1
        ),
        jnp.int32,
    )
    got = extract_patches_pallas(img, org, S, interpret=True)
    want = _oracle(img, org, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_extreme_origins():
    H, W, S = 480, 752, 35
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    corners = [(0, 0), (W - S, 0), (0, H - S), (W - S, H - S), (1, 7), (127, 8), (128, 9)]
    org = jnp.asarray(np.array(corners), jnp.int32)
    got = extract_patches_pallas(img, org, S, interpret=True)
    want = _oracle(img, org, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmap_shared_image():
    """vmap over a shared image folds lanes into features (no image copy)."""
    H, W, S = 240, 376, 18
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    B, N = 3, 11
    org = jnp.asarray(
        np.stack(
            [rng.integers(0, W - S + 1, (B, N)), rng.integers(0, H - S + 1, (B, N))],
            axis=2,
        ),
        jnp.int32,
    )
    got = jax.vmap(lambda o: extract_patches_pallas(img, o, S, interpret=True))(org)
    want = jax.vmap(lambda o: _oracle(img, o, S))(org)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmap_batched_images():
    H, W, S = 240, 376, 18
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 255, (2, H, W)), jnp.float32)
    N = 9
    org = jnp.asarray(
        np.stack(
            [rng.integers(0, W - S + 1, (2, N)), rng.integers(0, H - S + 1, (2, N))],
            axis=2,
        ),
        jnp.int32,
    )
    got = jax.vmap(lambda im, o: extract_patches_pallas(im, o, S, interpret=True))(imgs, org)
    want = jax.vmap(_oracle, in_axes=(0, 0, None))(imgs, org, S)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
