"""Resize primitives matched to the cv2 calls the reference makes.

* 2x bilinear upsample (sift_impl.py:53, ``cv2.resize(fx=2, fy=2,
  INTER_LINEAR)``): half-pixel-center sampling with edge clamping.
* 2x nearest downsample (sift_impl.py:96, ``cv2.resize((w//2, h//2),
  INTER_NEAREST)``): OpenCV picks ``src = floor(dst*2)`` which is exactly
  the even-index slice ``img[::2, ::2]`` cropped to (h//2, w//2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _linear_weights(n_out: int, n_in: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cv2 INTER_LINEAR source indices/weights for a 1-D axis (float64)."""
    coords = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.floor(coords).astype(np.int64)
    frac = coords - i0
    # cv2 clamps: coords below 0 use pixel 0 with weight 1; coords past the
    # last pixel use it with weight 1.
    frac = np.where(i0 < 0, 0.0, frac)
    i0 = np.clip(i0, 0, n_in - 1)
    frac = np.where(i0 >= n_in - 1, 0.0, frac)
    i1 = np.minimum(i0 + 1, n_in - 1)
    return i0, i1, frac.astype(np.float32)


def upsample2x_linear(img: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample of trailing (H, W); cv2 INTER_LINEAR parity."""
    h, w = img.shape[-2], img.shape[-1]
    y0, y1, fy = _linear_weights(2 * h, h)
    x0, x1, fx = _linear_weights(2 * w, w)
    x = jnp.asarray(img, jnp.float32)
    top = x[..., y0, :]
    bot = x[..., y1, :]
    fy_b = jnp.asarray(fy)[..., :, None]
    rows = top * (1.0 - fy_b) + bot * fy_b
    left = rows[..., :, x0]
    right = rows[..., :, x1]
    fx_b = jnp.asarray(fx)
    return left * (1.0 - fx_b) + right * fx_b


def downsample2x_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x downsample of trailing (H, W) to (h//2, w//2).

    The element selection is split into a row-stride slice, an
    optimization barrier, and a column-stride slice: fusing the combined
    2-D strided gather into downstream consumers is pathological on TPU
    (the next pyramid octave's blurs cost 7x more reading through it —
    2.38 vs 0.34 ms/img for octaves 0+1, docs/DEVNOTES.md r3).  Same
    elements either way — bit-identical output.
    """
    import jax

    h, w = img.shape[-2], img.shape[-1]
    rows = jax.lax.optimization_barrier(img[..., : (h // 2) * 2 : 2, :])
    return rows[..., :, : (w // 2) * 2 : 2]
