"""Pallas TPU kernels for the SIFT window-histogram hot spots.

The orientation and descriptor stages gather a per-keypoint pixel window
and reduce it into a histogram.  The XLA formulation materializes
(K, S, S) window tensors and runs dozens of masked reductions over them —
HBM-bandwidth bound.  These kernels instead process a *block of 8
keypoints per grid step*: each window is DMA'd HBM -> VMEM (contiguous
row copies, 16 in flight per step), all sample math runs on the VPU in
VMEM, and only the histograms leave the core.  Traffic per keypoint drops
from ~36x window reads to exactly one.

Scalar-prefetch (PrefetchScalarGridSpec) carries the per-keypoint window
coordinates so DMA sources are known before the body runs.  TPU tiling
requires output blocks with (8, 128)-aligned trailing dims — hence the
8-keypoint block and the 128-wide (zero-padded for orientation) output
rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8          # keypoints per grid step
OUT_LANES = 128    # padded output row width (TPU lane alignment)


def _pad_block(*arrays):
    """Zero-pad (K,) per-keypoint arrays up to a multiple of BLOCK."""
    k = arrays[0].shape[0]
    pad = (-k) % BLOCK
    if pad == 0:
        return k, arrays
    return k, tuple(jnp.pad(a, (0, pad)) for a in arrays)


def _orientation_kernel(
    # scalar prefetch
    layer_ref, sy_ref, sx_ref, cy_ref, cx_ref, rad_ref, wf_ref, valid_ref,
    # inputs
    mag_hbm, ang_hbm,
    # output
    out_ref,
    # scratch
    mag_win, ang_win, sem,
    *, s: int, num_bins: int, h: int, w: int, block: int,
):
    step = pl.program_id(0)

    copies = []
    for p in range(block):
        i = step * block + p
        l = layer_ref[i]
        sy = sy_ref[i]
        sx = sx_ref[i]
        cm = pltpu.make_async_copy(
            mag_hbm.at[l, pl.ds(sy, s), pl.ds(sx, s)],
            mag_win.at[p], sem.at[2 * p],
        )
        ca = pltpu.make_async_copy(
            ang_hbm.at[l, pl.ds(sy, s), pl.ds(sx, s)],
            ang_win.at[p], sem.at[2 * p + 1],
        )
        cm.start()
        ca.start()
        copies.append((cm, ca))
    for cm, ca in copies:
        cm.wait()
        ca.wait()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    for p in range(block):
        i = step * block + p
        rows = sy_ref[i] + row_iota
        cols = sx_ref[i] + col_iota
        dy = rows - cy_ref[i]
        dx = cols - cx_ref[i]
        rad = rad_ref[i]
        mask = (
            (jnp.abs(dy) <= rad) & (jnp.abs(dx) <= rad)
            & (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
            & (valid_ref[i] != 0)
        )
        d2 = (dy * dy + dx * dx).astype(jnp.float32)
        weight = jnp.exp(wf_ref[i] * d2)
        contrib = jnp.where(mask, weight * mag_win[p], 0.0)
        bins = jnp.mod(
            jnp.rint(ang_win[p] * (num_bins / 360.0)).astype(jnp.int32),
            num_bins,
        )
        # scalar stores to VMEM are not supported: build the output row as
        # a vector (scalar bin sums splatted onto their lane) and store once
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_LANES), 1)
        row = jnp.zeros((1, OUT_LANES), jnp.float32)
        for b in range(num_bins):
            sb = jnp.sum(jnp.where(bins == b, contrib, 0.0))
            row = jnp.where(lane == b, sb, row)
        out_ref[p, :] = row[0]


@functools.partial(
    jax.jit, static_argnames=("s", "num_bins", "img_h", "img_w", "interpret")
)
def orientation_histograms(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    layer: jnp.ndarray,
    sy: jnp.ndarray,
    sx: jnp.ndarray,
    cy: jnp.ndarray,
    cx: jnp.ndarray,
    radius: jnp.ndarray,
    weight_factor: jnp.ndarray,
    valid: jnp.ndarray,
    s: int,
    img_h: int,
    img_w: int,
    num_bins: int = 36,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K, num_bins) raw orientation histograms (sift_impl.py:256-271).

    ``mag_stack``/``ang_stack`` are (6, Hp, Wp) with Hp, Wp >= s (padded
    only so windows fit); window starts (sy, sx) must satisfy
    0 <= sy <= Hp-s (pre-clamped by the caller); the in-bounds masks use
    the *unpadded* image dims ``img_h, img_w``.  K must be a multiple of
    BLOCK (capacities are powers of two).
    """
    k, (layer, sy, sx, cy, cx, radius, weight_factor, valid) = _pad_block(
        layer, sy, sx, cy, cx, radius, weight_factor, valid
    )
    kp = layer.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"
    block = 1 if interpret else BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(kp // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, OUT_LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block, s, s), jnp.float32),
            pltpu.VMEM((block, s, s), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * block,)),
        ],
    )
    kernel = functools.partial(
        _orientation_kernel, s=s, num_bins=num_bins, h=img_h, w=img_w,
        block=block,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, OUT_LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        layer.astype(jnp.int32), sy.astype(jnp.int32), sx.astype(jnp.int32),
        cy.astype(jnp.int32), cx.astype(jnp.int32), radius.astype(jnp.int32),
        weight_factor.astype(jnp.float32), valid.astype(jnp.int32),
        mag_stack.astype(jnp.float32), ang_stack.astype(jnp.float32),
    )
    return out[:k, :num_bins]


def _descriptor_kernel(
    # scalar prefetch
    layer_ref, sy_ref, sx_ref, py_ref, px_ref, halfw_ref,
    cos_ref, sin_ref, hw_ref, angle_ref, valid_ref,
    # inputs
    mag_hbm, ang_hbm,
    # output
    out_ref,
    # scratch
    mag_win, ang_win, sem,
    *, s: int, num_bins: int, window_width: int, h: int, w: int, block: int,
):
    step = pl.program_id(0)

    copies = []
    for p in range(block):
        i = step * block + p
        l = layer_ref[i]
        sy = sy_ref[i]
        sx = sx_ref[i]
        cm = pltpu.make_async_copy(
            mag_hbm.at[l, pl.ds(sy, s), pl.ds(sx, s)],
            mag_win.at[p], sem.at[2 * p],
        )
        ca = pltpu.make_async_copy(
            ang_hbm.at[l, pl.ds(sy, s), pl.ds(sx, s)],
            ang_win.at[p], sem.at[2 * p + 1],
        )
        cm.start()
        ca.start()
        copies.append((cm, ca))
    for cm, ca in copies:
        cm.wait()
        ca.wait()

    ww = window_width
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    for p in range(block):
        i = step * block + p
        rows = sy_ref[i] + row_iota
        cols = sx_ref[i] + col_iota
        ys = (rows - py_ref[i]).astype(jnp.float32)
        xs = (cols - px_ref[i]).astype(jnp.float32)
        half_w = halfw_ref[i].astype(jnp.float32)
        in_win = (jnp.abs(ys) <= half_w) & (jnp.abs(xs) <= half_w)
        in_bounds = (rows > 0) & (rows < h - 1) & (cols > 0) & (cols < w - 1)

        cos_a = cos_ref[i]
        sin_a = sin_ref[i]
        hwid = hw_ref[i]
        r_rot = xs * sin_a + ys * cos_a
        c_rot = xs * cos_a - ys * sin_a
        r_bin = r_rot / hwid + (0.5 * ww - 0.5)
        c_bin = c_rot / hwid + (0.5 * ww - 0.5)
        in_bin = (r_bin > -1.0) & (r_bin < ww) & (c_bin > -1.0) & (c_bin < ww)
        mask = in_win & in_bounds & in_bin & (valid_ref[i] != 0)

        weight_mul = -0.5 / ((0.5 * ww) ** 2)
        weight = jnp.exp(
            weight_mul * ((r_rot / hwid) ** 2 + (c_rot / hwid) ** 2)
        )
        wm = jnp.where(mask, weight * mag_win[p], 0.0)

        r_bin = jnp.where(mask, r_bin, 0.0)
        c_bin = jnp.where(mask, c_bin, 0.0)
        ob = jnp.mod(
            (ang_win[p] - angle_ref[i]) * (num_bins / 360.0),
            jnp.float32(num_bins),
        )
        ob = jnp.where(mask, ob, 0.0)

        r0 = jnp.floor(r_bin).astype(jnp.int32)
        c0 = jnp.floor(c_bin).astype(jnp.int32)
        o0 = jnp.mod(jnp.floor(ob).astype(jnp.int32), num_bins)
        rf = r_bin - r0.astype(jnp.float32)
        cf = c_bin - c0.astype(jnp.float32)
        of = ob - o0.astype(jnp.float32)

        c1 = wm * rf
        c0w = wm - c1
        o1 = jnp.mod(o0 + 1, num_bins)

        # the reference crops the (ww+2)^2 tensor's padding ring
        # (sift_impl.py:509), so only the inner ww x ww cells are computed;
        # bin sums are splatted onto lanes and stored as one row vector
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_LANES), 1)
        row = jnp.zeros((1, OUT_LANES), jnp.float32)
        for r in range(1, ww + 1):
            wr = (
                jnp.where(r0 + 1 == r, c0w, 0.0)
                + jnp.where(r0 + 2 == r, c1, 0.0)
            )
            for c in range(1, ww + 1):
                wc = jnp.where(c0 + 1 == c, 1.0 - cf, 0.0) + jnp.where(
                    c0 + 2 == c, cf, 0.0
                )
                wrc = wr * wc
                for o in range(num_bins):
                    contrib = jnp.where(
                        o0 == o, wrc * (1.0 - of), 0.0
                    ) + jnp.where(o1 == o, wrc * of, 0.0)
                    idx = ((r - 1) * ww + (c - 1)) * num_bins + o
                    row = jnp.where(lane == idx, jnp.sum(contrib), row)
        out_ref[p, :] = row[0]


@functools.partial(
    jax.jit,
    static_argnames=("s", "num_bins", "window_width", "img_h", "img_w",
                     "interpret"),
)
def descriptor_histograms(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    layer: jnp.ndarray,
    sy: jnp.ndarray,
    sx: jnp.ndarray,
    py: jnp.ndarray,
    px: jnp.ndarray,
    half_w: jnp.ndarray,
    cos_a: jnp.ndarray,
    sin_a: jnp.ndarray,
    hist_width: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    s: int,
    img_h: int,
    img_w: int,
    num_bins: int = 8,
    window_width: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K, ww^2 * num_bins) trilinear histograms (sift_impl.py:459-509).

    Returns the tensor already cropped to the inner ww x ww cells (the
    reference discards the padding ring); the caller post-processes
    (clip/normalize/quantize).
    """
    k, (layer, sy, sx, py, px, half_w, cos_a, sin_a, hist_width, angle, valid) = (
        _pad_block(layer, sy, sx, py, px, half_w, cos_a, sin_a, hist_width,
                   angle, valid)
    )
    kp = layer.shape[0]
    out_dim = window_width * window_width * num_bins
    assert out_dim == OUT_LANES, out_dim
    interpret = interpret or jax.default_backend() == "cpu"
    block = 1 if interpret else BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(kp // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, out_dim), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block, s, s), jnp.float32),
            pltpu.VMEM((block, s, s), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * block,)),
        ],
    )
    kernel = functools.partial(
        _descriptor_kernel, s=s, num_bins=num_bins,
        window_width=window_width, h=img_h, w=img_w, block=block,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, out_dim), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        layer.astype(jnp.int32), sy.astype(jnp.int32), sx.astype(jnp.int32),
        py.astype(jnp.int32), px.astype(jnp.int32), half_w.astype(jnp.int32),
        cos_a.astype(jnp.float32), sin_a.astype(jnp.float32),
        hist_width.astype(jnp.float32), angle.astype(jnp.float32),
        valid.astype(jnp.int32),
        mag_stack.astype(jnp.float32), ang_stack.astype(jnp.float32),
    )
    return out[:k]
