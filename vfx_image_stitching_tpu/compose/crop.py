"""Rectangling crop (image_stitching_harris.py:381-420).

Gray > black_threshold defines content; the bounding box is shrunk by
``extra_margin`` in y only (the reference's x-shrink is commented out at
image_stitching_harris.py:412-413); a degenerate box or an all-black image
returns the input unchanged.  Mask reductions run on device; the final
(dynamic-shape) slice happens on the host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.ops.color import bgr_to_gray_u8


@jax.jit
def _content_bounds(img: jnp.ndarray, black_threshold: jnp.ndarray):
    gray = bgr_to_gray_u8(img)
    mask = gray > black_threshold
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    h, w = gray.shape
    y_min = jnp.argmax(rows)
    y_max = h - 1 - jnp.argmax(rows[::-1])
    x_min = jnp.argmax(cols)
    x_max = w - 1 - jnp.argmax(cols[::-1])
    return y_min, y_max, x_min, x_max, jnp.any(rows)


def crop_bounds(img_device, black_threshold: int):
    """Device-side bounds of a (possibly device-resident) mosaic."""
    return jax.device_get(
        _content_bounds(jnp.asarray(img_device), jnp.uint8(black_threshold))
    )


def apply_crop(
    img: np.ndarray, bounds, extra_margin: int
) -> np.ndarray:
    """Host-side slice with the reference margin semantics."""
    y_min, y_max, x_min, x_max, any_content = bounds
    h = img.shape[0]
    if not bool(any_content):
        return img
    y_min = max(0, int(y_min) + extra_margin)
    y_max = min(h - 1, int(y_max) - extra_margin)
    if y_min > y_max or int(x_min) > int(x_max):
        return img
    return img[y_min : y_max + 1, int(x_min) : int(x_max) + 1]


def rectangle_crop(
    img, black_threshold: int, extra_margin: int, bounds=None
) -> np.ndarray:
    """Crop to the content bounding box, shrunk by extra_margin in y.

    ``img`` may be a NumPy array or a device array; pass precomputed
    ``bounds`` (from :func:`crop_bounds` on the device-resident mosaic) to
    avoid re-uploading a host copy just for the reductions.
    """
    if bounds is None:
        bounds = crop_bounds(img, black_threshold)
    return apply_crop(np.asarray(img), bounds, extra_margin)
