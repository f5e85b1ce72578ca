"""Separable Gaussian blur with cv2.GaussianBlur parity.

cv2 parity rules (verified against the installed OpenCV, see
tests/test_ops.py):
  * auto kernel size for float images: ``ksize = round(sigma*8 + 1) | 1``
    (OpenCV's ``cvRound(sigma*(depth==CV_8U?3:4)*2+1)|1`` with float depth);
  * kernel values ``exp(-i^2/(2 sigma^2))`` normalized to sum 1;
  * border handling BORDER_REFLECT_101, which is ``jnp.pad(mode='reflect')``.

Used by the Harris structure tensor (image_stitching_harris.py:161-163),
the Harris descriptor patch blur (image_stitching_harris.py:91), and every
SIFT pyramid level (sift_impl.py:56,91).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def cv2_auto_ksize(sigma: float) -> int:
    """OpenCV's automatic Gaussian kernel size for float-depth images."""
    return int(round(sigma * 8 + 1)) | 1


@functools.lru_cache(maxsize=None)
def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity (float32)."""
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(i**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _reflect101_pad(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (pad, pad)
    return jnp.pad(x, cfg, mode="reflect")


def _conv1d_taps(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """k-tap 1-D convolution along ``axis`` as shifted adds (XLA fuses)."""
    k = len(kernel)
    pad = k // 2
    xp = _reflect101_pad(x, pad, axis)
    n = x.shape[axis]
    out = None
    for t in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + n)
        term = xp[tuple(sl)] * jnp.float32(kernel[t])
        out = term if out is None else out + term
    return out


def gaussian_blur(
    img: jnp.ndarray, sigma: float, ksize: int | None = None
) -> jnp.ndarray:
    """Blur the trailing (H, W) dims of ``img`` (any leading batch dims).

    ``ksize=None`` applies cv2's auto-size rule.  Input is converted to
    float32; border handling is BORDER_REFLECT_101.
    """
    if ksize is None:
        ksize = cv2_auto_ksize(sigma)
    if ksize <= 1:
        return jnp.asarray(img, jnp.float32)
    kernel = gaussian_kernel1d(ksize, sigma)
    x = jnp.asarray(img, jnp.float32)
    x = _conv1d_taps(x, kernel, axis=x.ndim - 2)  # vertical
    x = _conv1d_taps(x, kernel, axis=x.ndim - 1)  # horizontal
    return x
