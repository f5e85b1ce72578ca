"""Rectangling crop (image_stitching_harris.py:381-420).

Gray > black_threshold defines content; the bounding box is shrunk by
``extra_margin`` in y only (the reference's x-shrink is commented out at
image_stitching_harris.py:412-413); a degenerate box or an all-black image
returns the input unchanged.  Mask reductions run on device; the final
(dynamic-shape) slice happens on the host.
"""

from __future__ import annotations

import functools

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


@jax.jit
def mosaic_with_bounds(img: jnp.ndarray, black_threshold: jnp.ndarray):
    """Mosaic + content bounds as ONE u8 buffer (single-transfer pull).

    ``jax.device_get`` of a (bounds-tuple, mosaic) pair issues one fetch
    per leaf — six round trips on a tunneled link (~50 ms RTT each,
    docs/DEVNOTES.md).  This packs the five bounds scalars into the
    first 10 bytes of an extra u8 row appended to the mosaic (values
    < 2^16, little-endian pairs) so the whole result is one array and
    one transfer; :func:`unpack_mosaic_bounds` reverses it on host.
    """
    h, w, c = img.shape
    if max(h, w) >= 1 << 16:
        raise ValueError(
            f"mosaic {img.shape} exceeds the 16-bit bounds packing; "
            "widen the encoding in mosaic_with_bounds"
        )
    y0, y1, x0, x1, anyc = _content_bounds(img, black_threshold)
    vals = jnp.stack(
        [y0, y1, x0, x1, anyc.astype(jnp.int32)]
    ).astype(jnp.int32)
    lo = (vals & 0xFF).astype(jnp.uint8)
    hi = ((vals >> 8) & 0xFF).astype(jnp.uint8)
    extra = jnp.zeros((w * c,), jnp.uint8)
    extra = extra.at[0:10:2].set(lo).at[1:10:2].set(hi)
    return jnp.concatenate([img.reshape(-1), extra]).reshape(h + 1, w, c)


def ceil_split(buf, n: int):
    """Split along axis 0 into n ceil-sized chunks (tracing-safe).

    Shared by the mosaic strip pull (rows) and the result-bundle strip
    pull (flat bytes) so the chunking arithmetic cannot drift.
    """
    m = buf.shape[0]
    per = -(-m // n)  # ceil
    return tuple(
        buf[i * per : min((i + 1) * per, m)]
        for i in range(n)
        if i * per < m
    )


@functools.partial(jax.jit, static_argnames=("n_strips",))
def mosaic_with_bounds_strips(
    img: jnp.ndarray, black_threshold: jnp.ndarray, n_strips: int
):
    """:func:`mosaic_with_bounds` split into ``n_strips`` row blocks.

    The tunneled harness (docs/DEVNOTES.md) moves a single device_get
    stream at well under line rate; pulling the strips CONCURRENTLY
    from host threads overlaps the per-transfer round trips and can
    multiplex the link.  The split happens inside this one executable
    (host-side slicing of a device array would compile one slice
    program per strip shape).  Reassemble with ``np.concatenate`` after
    :func:`pull_strips`; then :func:`unpack_mosaic_bounds` as usual.
    """
    return ceil_split(mosaic_with_bounds(img, black_threshold), n_strips)


def pull_strips(strips) -> np.ndarray:
    """Concurrent device_get of row strips; returns the stacked buffer."""
    if len(strips) == 1:
        return np.asarray(jax.device_get(strips[0]))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(strips)) as ex:
        parts = list(ex.map(jax.device_get, strips))
    return np.concatenate(parts, axis=0)


def unpack_mosaic_bounds(buf: np.ndarray):
    """Host-side inverse of :func:`mosaic_with_bounds`."""
    mosaic = buf[:-1]
    raw = buf[-1].reshape(-1)[:10].astype(np.int64)
    vals = raw[0::2] | (raw[1::2] << 8)
    bounds = (vals[0], vals[1], vals[2], vals[3], bool(vals[4]))
    return mosaic, bounds


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
