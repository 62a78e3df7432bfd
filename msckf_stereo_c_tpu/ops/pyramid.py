"""Gaussian image pyramids (vikit ``pyr_down`` equivalent, used by the
reference at image_processor.cpp:213-245).

OpenCV-compatible pyrDown: separable 5-tap Gaussian [1,4,6,4,1]/16 with
REFLECT_101 borders, then factor-2 decimation; output size (n+1)//2.
Implemented with XLA convolutions (the VPU handles these well; no Pallas
needed — the op is bandwidth-trivial next to KLT)."""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
from jax import lax

_KERNEL = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _reflect101_pad(img: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101: edge pixel not repeated (gfedcb|abcdefgh)."""
    n = img.shape[axis]
    head = lax.slice_in_dim(img, 1, pad + 1, axis=axis)
    head = jnp.flip(head, axis=axis)
    tail = lax.slice_in_dim(img, n - pad - 1, n - 1, axis=axis)
    tail = jnp.flip(tail, axis=axis)
    return jnp.concatenate([head, img, tail], axis=axis)


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level down. img: (..., H, W) float; returns
    (..., (H+1)//2, (W+1)//2).

    Blur and decimation are fused: only the kept rows/columns are computed
    (the naive blur-then-decimate does 2x the arithmetic and materializes a
    full-res intermediate)."""
    dtype = img.dtype
    k = _KERNEL.astype(dtype)
    H = img.shape[-2]
    W = img.shape[-1]
    Ho = (H + 1) // 2
    Wo = (W + 1) // 2

    # Vertical: strided slices pick rows 2j+i-2 directly.
    x = _reflect101_pad(img, 2, axis=-2)
    rows = sum(
        k[i]
        * lax.slice_in_dim(x, i, i + 2 * Ho - 1, stride=2, axis=-2)
        for i in range(5)
    )

    # Horizontal on the half-height intermediate.
    x = _reflect101_pad(rows, 2, axis=-1)
    cols = sum(
        k[i]
        * lax.slice_in_dim(x, i, i + 2 * Wo - 1, stride=2, axis=-1)
        for i in range(5)
    )
    return cols


def build_pyramid(img: jnp.ndarray, levels: int = 4) -> List[jnp.ndarray]:
    """Level-0 is the input image (reference createImagePyramids hardcodes
    4 levels, image_processor.cpp:232)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr
