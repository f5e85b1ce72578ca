"""Pallas TPU kernel for the SIFT orientation-histogram hot spot.

The orientation stage gathers a per-keypoint pixel window and reduces it
into a 36-bin histogram.  The XLA formulation materializes (K, S, S)
window tensors in HBM and runs 36 masked reductions over them — 36x the
window traffic.  This kernel keeps each window on-chip: per grid step the
pipeline fetches a 2x2 neighborhood of (40, 128)-aligned tiles around one
keypoint (Blocked indexing cannot express unaligned windows, but any
41-wide window lies inside two consecutive 40-row / 128-lane tiles), the
VPU computes weights/bins/mask over the tiles, and only the 36 sums leave
the core.

Why not manual DMA: ``make_async_copy`` from an HBM ref crashes this
environment's AOT Mosaic compile helper (SIGABRT, reproduced on a
minimal kernel); scalar-prefetched *block-mapped* fetches compile and run
fine, so the kernel is built entirely from those.

The descriptor stage deliberately stays on the XLA one-hot GEMM path: its
128-bin one-hot construction costs the same VPU work either way and the
GEMM reduction rides the MXU, so a Pallas version has nothing to win
(measured; see models/sift/descriptor.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 40      # row-tile height: two tiles cover any <=41-row window
TILE_C = 128     # lane-tile width: two tiles cover any <=129-col window
OUT_ROWS = 8     # output block sublane height (TPU alignment)
OUT_LANES = 128  # output row width (36 bins zero-padded)


def _orientation_kernel(
    # scalar prefetch
    r0_ref, c0_ref, layer_ref, cy_ref, cx_ref, rad_ref, wf_ref, valid_ref,
    # block-mapped inputs: 2x2 tiles of mag and ang
    m00, m01, m10, m11, a00, a01, a10, a11,
    # output
    out_ref,
    *, num_bins: int, h: int, w: int,
):
    i = pl.program_id(0)
    base_r = r0_ref[i] * TILE_R
    base_c = c0_ref[i] * TILE_C
    cy = cy_ref[i]
    cx = cx_ref[i]
    rad = rad_ref[i]
    wf = wf_ref[i]
    ok = valid_ref[i] != 0

    tiles = ((m00, a00, 0, 0), (m01, a01, 0, 1),
             (m10, a10, 1, 0), (m11, a11, 1, 1))
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)

    contribs = []
    bins = []
    for (m_t, a_t, tr, tc) in tiles:
        rows = base_r + tr * TILE_R + row_iota
        cols = base_c + tc * TILE_C + col_iota
        dy = rows - cy
        dx = cols - cx
        mask = (
            (jnp.abs(dy) <= rad) & (jnp.abs(dx) <= rad)
            & (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
            & ok
        )
        d2 = (dy * dy + dx * dx).astype(jnp.float32)
        weight = jnp.exp(wf * d2)
        contribs.append(jnp.where(mask, weight * m_t[0], 0.0))
        bins.append(jnp.mod(
            jnp.rint(a_t[0] * (num_bins / 360.0)).astype(jnp.int32), num_bins
        ))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_LANES), 1)
    row = jnp.zeros((1, OUT_LANES), jnp.float32)
    for b in range(num_bins):
        sb = sum(
            jnp.sum(jnp.where(bn == b, ct, 0.0))
            for ct, bn in zip(contribs, bins)
        )
        row = jnp.where(lane == b, sb, row)
    out_ref[pl.ds(jnp.mod(i, OUT_ROWS), 1), :] = row


@functools.partial(
    jax.jit,
    static_argnames=("half", "num_bins", "img_h", "img_w", "interpret"),
)
def orientation_histograms(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    layer: jnp.ndarray,
    cy: jnp.ndarray,
    cx: jnp.ndarray,
    radius: jnp.ndarray,
    weight_factor: jnp.ndarray,
    valid: jnp.ndarray,
    half: int,
    img_h: int,
    img_w: int,
    num_bins: int = 36,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K, num_bins) raw orientation histograms (sift_impl.py:256-271).

    ``half`` (the window half-radius cap) must satisfy 2*half+1 <= TILE_R+1
    and <= TILE_C+1 so the 2x2 tile neighborhood covers every window.
    """
    assert 2 * half + 1 <= TILE_R + 1, half
    k = layer.shape[0]
    pad = (-k) % OUT_ROWS
    if pad:
        (layer, cy, cx, radius, weight_factor, valid) = (
            jnp.pad(a, (0, pad))
            for a in (layer, cy, cx, radius, weight_factor, valid)
        )
    kp = layer.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"

    # pad stacks so tile (r0+1, c0+1) always exists
    hs, ws = mag_stack.shape[-2:]
    ph = (-hs) % TILE_R + TILE_R
    pw = (-ws) % TILE_C + TILE_C
    if ph or pw:
        cfgp = [(0, 0), (0, ph), (0, pw)]
        mag_stack = jnp.pad(mag_stack, cfgp)
        ang_stack = jnp.pad(ang_stack, cfgp)

    sy = jnp.clip(cy - half, 0, hs - 1)
    sx = jnp.clip(cx - half, 0, ws - 1)
    r0 = sy // TILE_R
    c0 = sx // TILE_C

    def tile_spec(tr, tc):
        return pl.BlockSpec(
            (1, TILE_R, TILE_C),
            lambda i, r0_ref, c0_ref, layer_ref, *_: (
                layer_ref[i], r0_ref[i] + tr, c0_ref[i] + tc
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(kp,),
        in_specs=[tile_spec(tr, tc) for tr in (0, 1) for tc in (0, 1)] * 2,
        out_specs=pl.BlockSpec(
            (OUT_ROWS, OUT_LANES),
            lambda i, *_: (i // OUT_ROWS, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _orientation_kernel, num_bins=num_bins, h=img_h, w=img_w
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, OUT_LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        r0.astype(jnp.int32), c0.astype(jnp.int32), layer.astype(jnp.int32),
        cy.astype(jnp.int32), cx.astype(jnp.int32), radius.astype(jnp.int32),
        weight_factor.astype(jnp.float32), valid.astype(jnp.int32),
        *([mag_stack.astype(jnp.float32)] * 4),
        *([ang_stack.astype(jnp.float32)] * 4),
    )
    return out[:k, :num_bins]
