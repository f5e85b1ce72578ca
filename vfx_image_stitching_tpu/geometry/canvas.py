"""Canvas placement replacing the reference's translate-by-pad.

``pad_image(img, mx, my)`` in the reference (image_stitching_harris.py:
311-325) zero-pads an image so its content shifts by ``(max(round(mx),0),
max(round(my),0))`` and its size grows by ``(|round(mx)|, |round(my)|)``.
On TPU shapes must be static, so the same effect is achieved by placing
content into a precomputed fixed-size canvas with
``lax.dynamic_update_slice``; the host-side planner
(:mod:`vfx_image_stitching_tpu.compose.plan`) computes all offsets with
reference-parity float64 rounding.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pad_amounts(move: float) -> Tuple[int, int]:
    """(content offset, size growth) for one axis of pad_image.

    ``int(round(move))`` in the reference is NumPy/Python banker's rounding.
    """
    m = int(round(move))
    return (max(m, 0), abs(m))


def place_on_canvas(
    img: jnp.ndarray, canvas_h: int, canvas_w: int, off_y, off_x
) -> jnp.ndarray:
    """Place (H, W, C) content at (off_y, off_x) on a zero canvas.

    Offsets may be traced int32 scalars (used inside the compositing scan).
    Content must fit: callers guarantee off + extent <= canvas (the planner
    sizes the canvas to the exact union).
    """
    canvas = jnp.zeros((canvas_h, canvas_w) + img.shape[2:], dtype=img.dtype)
    return jax.lax.dynamic_update_slice(
        canvas, img, (off_y, off_x) + (0,) * (img.ndim - 2)
    )
