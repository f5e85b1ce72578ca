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
    """BORDER_REFLECT_101 pad, built from flipped edge slices.

    Bit-identical to ``jnp.pad(mode='reflect')`` (same source elements,
    no arithmetic).  As a STANDALONE executable the jnp.pad lowering
    costs ~3.4x the whole shifted-add blur on the sublane (row) axis
    (0.37 vs 0.11 ms for a 27-tap vertical pass at 768x1024); inside
    the fused lax.map pipeline XLA fuses either form equally (measured
    neutral, docs/DEVNOTES.md r3 pad probes), so this mainly helps the
    reference-shaped per-stage API and other small-jit callers.  Falls
    back to jnp.pad for the multi-reflection case (pad >= dim, tail
    pyramid octaves).
    """
    n = x.shape[axis]
    if pad >= n:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (pad, pad)
        return jnp.pad(x, cfg, mode="reflect")
    import jax

    top = jnp.flip(jax.lax.slice_in_dim(x, 1, pad + 1, axis=axis), axis=axis)
    bot = jnp.flip(
        jax.lax.slice_in_dim(x, n - pad - 1, n - 1, axis=axis), axis=axis
    )
    return jnp.concatenate([top, x, bot], axis=axis)


def edge_pad_axis(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """BORDER_REPLICATE pad along one axis via repeated edge slices.

    Bit-identical to ``jnp.pad(mode='edge')`` with the same
    better-lowering rationale as :func:`_reflect101_pad`.
    """
    if pad == 0:
        return x
    import jax

    n = x.shape[axis]
    top = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    bot = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    reps = [1] * x.ndim
    reps[axis] = pad
    return jnp.concatenate(
        [jnp.tile(top, reps), x, jnp.tile(bot, reps)], axis=axis
    )


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
