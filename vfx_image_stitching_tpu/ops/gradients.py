"""Reference 3x3 gradient convolutions and gradient orientation fields.

The reference computes gradients with a generic shifted-add conv2d over an
edge-padded image (image_stitching_harris.py:49-61) using the signed
kernels ``Hx=[[0,0,0],[1,0,-1],[0,0,0]]`` and ``Hy=[[0,1,0],[0,0,0],
[0,-1,0]]`` (image_stitching_harris.py:150-155).  Note these compute
``I(x-1) - I(x+1)`` — a *negated* central difference — and the sign feeds
the descriptor orientation histograms, so it must match exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

HX = np.array([[0, 0, 0], [1, 0, -1], [0, 0, 0]], dtype=np.float32)
HY = np.array([[0, 1, 0], [0, 0, 0], [0, -1, 0]], dtype=np.float32)


def conv2d_edge(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """2-D convolution over trailing (H, W) with edge padding.

    Semantics of the reference conv2d (image_stitching_harris.py:49-61):
    k^2 shifted adds of the edge-padded image.  float32 accumulation (the
    reference accumulates float64; differences are << the uint8 blend
    tolerance).
    """
    kernel = np.asarray(kernel, dtype=np.float32)
    m, n = kernel.shape
    h, w = img.shape[-2], img.shape[-1]
    from vfx_image_stitching_tpu.ops.gaussian import edge_pad_axis

    pad = jnp.asarray(img, jnp.float32)
    pad = edge_pad_axis(pad, m // 2, pad.ndim - 2)
    pad = edge_pad_axis(pad, n // 2, pad.ndim - 1)
    out = None
    for i in range(m):
        for j in range(n):
            if kernel[i, j] == 0.0:
                continue
            term = pad[..., i : i + h, j : j + w] * jnp.float32(kernel[i, j])
            out = term if out is None else out + term
    if out is None:
        out = jnp.zeros_like(img, dtype=jnp.float32)
    return out


def reference_gradients(gray: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) with the reference's signed kernels."""
    return conv2d_edge(gray, HX), conv2d_edge(gray, HY)


def calc_orientation(ix: jnp.ndarray, iy: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient magnitude and angle in degrees [0, 360).

    Parity with image_stitching_harris.py:63-70.
    """
    m = jnp.sqrt(ix * ix + iy * iy)
    theta = jnp.arctan2(iy, ix) * (180.0 / np.pi)
    theta = jnp.mod(theta + 360.0, 360.0)
    return m, theta
