"""Device-side sequential compositor (fixed final-canvas shape).

Replicates ``blend_two_images`` semantics (image_stitching_harris.py:
327-376) at a fixed shape: per-column occupancy (any nonzero value in the
column slab), a counter-based alpha ramp (the counter increments once per
overlapping column *encountered left-to-right* == exclusive cumsum of the
overlap mask), single-source copy-through, and a uint8 truncation cast at
every step.  The cast matters: a blended pixel that lands in (0, 1) floors
to 0 and counts as "no data" in later steps — a known reference artifact
that must be reproduced for pixel parity.

The growing canvas is replaced by the host-planned final canvas
(:mod:`vfx_image_stitching_tpu.compose.plan`): the mosaic never moves; each
image is placed once at its absolute offset via ``dynamic_update_slice``;
the fold itself is a ``lax.scan`` over steps.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.compose.plan import ComposePlan
from vfx_image_stitching_tpu.geometry.canvas import place_on_canvas


def _blend_pair(
    canvas_a: jnp.ndarray, canvas_b: jnp.ndarray, overlap_range: jnp.ndarray
) -> jnp.ndarray:
    """One blend: (H, W, 3) uint8 canvases -> uint8 result."""
    a = canvas_a.astype(jnp.float32)
    b = canvas_b.astype(jnp.float32)
    any_a = jnp.any(canvas_a != 0, axis=(0, 2))  # (W,)
    any_b = jnp.any(canvas_b != 0, axis=(0, 2))
    overlap = any_a & any_b
    counter = jnp.cumsum(overlap.astype(jnp.float32)) - overlap.astype(jnp.float32)
    alpha = jnp.where(
        overlap_range != 0.0, counter / jnp.where(overlap_range != 0.0, overlap_range, 1.0), 0.0
    )
    blended = (1.0 - alpha)[None, :, None] * a + alpha[None, :, None] * b
    col = overlap[None, :, None]
    out = jnp.where(
        col,
        blended,
        jnp.where(any_a[None, :, None], a, jnp.where(any_b[None, :, None], b, 0.0)),
    )
    # Non-degenerate inputs stay in [0, 255] (alpha in [0, 1]); degenerate
    # match pairs can push alpha outside it, where NumPy's float->uint8 cast
    # wraps mod 256 but XLA's conversion is backend-defined.  Clamp for a
    # deterministic result (deliberate deviation from NumPy wraparound on
    # garbage inputs only; see ADVICE r1).
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _compose_scan(
    images: jnp.ndarray,
    mosaic0_off: jnp.ndarray,
    step_idx: jnp.ndarray,
    step_off: jnp.ndarray,
    step_swapped: jnp.ndarray,
    step_ovr: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    mosaic = place_on_canvas(images[0], height, width, mosaic0_off[0], mosaic0_off[1])

    def body(mosaic, xs):
        idx, off, swapped, ovr = xs
        img_canvas = place_on_canvas(images[idx], height, width, off[0], off[1])
        a = jnp.where(swapped, img_canvas, mosaic)
        b = jnp.where(swapped, mosaic, img_canvas)
        return _blend_pair(a, b, ovr), None

    mosaic, _ = jax.lax.scan(
        body, mosaic, (step_idx, step_off, step_swapped, step_ovr)
    )
    return mosaic


def compose_mosaic(
    images: jnp.ndarray,
    plan: ComposePlan,
    return_steps: bool = False,
) -> jnp.ndarray | Tuple[jnp.ndarray, List[np.ndarray]]:
    """Fold the cylindrical image batch into the final mosaic.

    Args:
      images: (N, H, W, 3) uint8 cylindrical batch (image order = pano.txt).
      plan: host compositing plan.
      return_steps: also return each step's mosaic cropped to its local
        canvas (regenerates the reference ``pano_step_*`` intermediates).
    """
    if not plan.steps:
        mosaic = place_on_canvas(
            jnp.asarray(images[0]), plan.height, plan.width,
            plan.mosaic0_off_y, plan.mosaic0_off_x,
        )
        return (mosaic, []) if return_steps else mosaic

    idx = jnp.asarray([s.img_index for s in plan.steps], jnp.int32)
    off = jnp.asarray(
        [[s.img_off_y, s.img_off_x] for s in plan.steps], jnp.int32
    )
    swapped = jnp.asarray([s.swapped for s in plan.steps], bool)
    ovr = jnp.asarray([s.overlap_range for s in plan.steps], jnp.float32)

    if not return_steps:
        return _compose_scan(
            jnp.asarray(images), jnp.asarray(
                [plan.mosaic0_off_y, plan.mosaic0_off_x], jnp.int32
            ),
            idx, off, swapped, ovr, plan.height, plan.width,
        )

    # step-capture path: same jitted step body, Python-driven
    images = jnp.asarray(images)
    mosaic = place_on_canvas(
        images[0], plan.height, plan.width, plan.mosaic0_off_y, plan.mosaic0_off_x
    )
    captured: List[np.ndarray] = []
    for k, s in enumerate(plan.steps):
        img_canvas = place_on_canvas(
            images[idx[k]], plan.height, plan.width, off[k, 0], off[k, 1]
        )
        a = jnp.where(swapped[k], img_canvas, mosaic)
        b = jnp.where(swapped[k], mosaic, img_canvas)
        mosaic = _blend_pair(a, b, ovr[k])
        local = np.asarray(mosaic)[
            s.frame_off_y : s.frame_off_y + s.local_h,
            s.frame_off_x : s.frame_off_x + s.local_w,
        ]
        captured.append(local)
    return mosaic, captured
