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

The descriptor kernel uses the same tile scheme with the full trilinear
two-hot accumulation fused on-chip.  Its win over the XLA one-hot GEMM is
not compute but memory: the GEMM path materializes a (chunk, S^2, 36)
one-hot tensor in HBM (~130 GB of traffic over a full dataset batch);
the kernel's bins never leave VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 40      # row-tile height: two tiles cover any <=41-row window
TILE_C = 128     # lane-tile width: two tiles cover any <=129-col window
DESC_TILE_R = 88  # descriptor row-tile: two tiles cover any <=89-row window
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


def _orientation_kernel_v2(
    # scalar prefetch
    r0_ref, c0_ref, layer_ref, roff_ref, coff_ref, cy_ref, cx_ref,
    rad_ref, wf_ref, valid_ref,
    # block-mapped inputs: 2x2 tiles of mag and ang
    m00, m01, m10, m11, a00, a01, a10, a11,
    # output
    out_ref,
    *, num_bins: int, h: int, w: int, s: int,
):
    """v2: roll the window into place FIRST, then histogram one tile.

    v1 ran the 36-bin masked-reduction loop over all four (TILE_R,
    TILE_C) tiles — 4x the VPU work actually needed.  Here the 2x2 tile
    neighborhood is concatenated and rotated so the (s, s) window sits
    at the origin (the `_pair_gather_kernel` move), and the mask /
    weight / 36 masked sums run over the single (s, s) block.  Bit-
    equal results: same samples, same per-bin add order within a tile
    row-major scan (each window pixel contributes to exactly one bin).
    """
    i = pl.program_id(0)
    ro = roff_ref[i]
    co = coff_ref[i]
    sy = r0_ref[i] * TILE_R + ro
    sx = c0_ref[i] * TILE_C + co
    cy = cy_ref[i]
    cx = cx_ref[i]
    rad = rad_ref[i]
    wf = wf_ref[i]
    ok = valid_ref[i] != 0

    def gather(t00, t01, t10, t11):
        top = jnp.concatenate([t00[0], t01[0]], axis=1)
        bot = jnp.concatenate([t10[0], t11[0]], axis=1)
        full = jnp.concatenate([top, bot], axis=0)     # (2R, 2C)
        full = pltpu.roll(full, 2 * TILE_R - ro, 0)
        full = pltpu.roll(full, 2 * TILE_C - co, 1)
        return full[:s, :s]

    magw = gather(m00, m01, m10, m11)
    angw = gather(a00, a01, a10, a11)
    rows = sy + jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = sx + jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    dy = rows - cy
    dx = cols - cx
    mask = (
        (jnp.abs(dy) <= rad) & (jnp.abs(dx) <= rad)
        & (rows >= 1) & (rows <= h - 2) & (cols >= 1) & (cols <= w - 2)
        & ok
    )
    d2 = (dy * dy + dx * dx).astype(jnp.float32)
    contrib = jnp.where(mask, jnp.exp(wf * d2) * magw, 0.0)
    bins = jnp.mod(
        jnp.rint(angw * (num_bins / 360.0)).astype(jnp.int32), num_bins
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_LANES), 1)
    row = jnp.zeros((1, OUT_LANES), jnp.float32)
    for b in range(num_bins):
        sb = jnp.sum(jnp.where(bins == b, contrib, 0.0))
        row = jnp.where(lane == b, sb, row)
    out_ref[pl.ds(jnp.mod(i, OUT_ROWS), 1), :] = row


@functools.partial(
    jax.jit,
    static_argnames=("half", "num_bins", "img_h", "img_w", "interpret"),
)
def orientation_histograms_v2(
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
    """(K, num_bins) raw orientation histograms — roll-into-place kernel."""
    assert 2 * half + 1 <= TILE_R + 1, half
    s = 2 * half + 1
    k = layer.shape[0]
    pad = (-k) % OUT_ROWS
    if pad:
        (layer, cy, cx, radius, weight_factor, valid) = (
            jnp.pad(a, (0, pad))
            for a in (layer, cy, cx, radius, weight_factor, valid)
        )
    kp = layer.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"

    hs, ws = mag_stack.shape[-2:]
    ph = (-hs) % TILE_R + TILE_R
    pw = (-ws) % TILE_C + TILE_C
    if ph or pw:
        cfgp = [(0, 0), (0, ph), (0, pw)]
        mag_stack = jnp.pad(mag_stack, cfgp)
        ang_stack = jnp.pad(ang_stack, cfgp)

    # same clamped starts as v1 — masks come from absolute coords
    sy = jnp.clip(cy - half, 0, hs - 1).astype(jnp.int32)
    sx = jnp.clip(cx - half, 0, ws - 1).astype(jnp.int32)
    r0 = sy // TILE_R
    c0 = sx // TILE_C
    roff = sy - r0 * TILE_R
    coff = sx - c0 * TILE_C

    def tile_spec(tr, tc):
        return pl.BlockSpec(
            (1, TILE_R, TILE_C),
            lambda i, r0_ref, c0_ref, layer_ref, *_: (
                layer_ref[i], r0_ref[i] + tr, c0_ref[i] + tc
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(kp,),
        in_specs=[tile_spec(tr, tc) for tr in (0, 1) for tc in (0, 1)] * 2,
        out_specs=pl.BlockSpec(
            (OUT_ROWS, OUT_LANES),
            lambda i, *_: (i // OUT_ROWS, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _orientation_kernel_v2, num_bins=num_bins, h=img_h, w=img_w, s=s
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, OUT_LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        r0, c0, layer.astype(jnp.int32), roff, coff,
        cy.astype(jnp.int32), cx.astype(jnp.int32), radius.astype(jnp.int32),
        weight_factor.astype(jnp.float32), valid.astype(jnp.int32),
        *([mag_stack.astype(jnp.float32)] * 4),
        *([ang_stack.astype(jnp.float32)] * 4),
    )
    return out[:k, :num_bins]


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


def _descriptor_kernel(
    # scalar prefetch
    r0_ref, c0_ref, layer_ref, py_ref, px_ref, halfw_ref,
    cos_ref, sin_ref, hw_ref, angle_ref, valid_ref,
    # block-mapped inputs: 2x2 tiles of mag and ang
    m00, m01, m10, m11, a00, a01, a10, a11,
    # output
    out_ref,
    *, num_bins: int, window_width: int, h: int, w: int,
    tile_r: int = DESC_TILE_R,
):
    i = pl.program_id(0)
    base_r = r0_ref[i] * tile_r
    base_c = c0_ref[i] * TILE_C
    py = py_ref[i]
    px = px_ref[i]
    half_w = halfw_ref[i].astype(jnp.float32)
    cos_a = cos_ref[i]
    sin_a = sin_ref[i]
    hwid = hw_ref[i]
    angle = angle_ref[i]
    ok = valid_ref[i] != 0
    ww = window_width
    weight_mul = -0.5 / ((0.5 * ww) ** 2)

    tiles = ((m00, a00, 0, 0), (m01, a01, 0, 1),
             (m10, a10, 1, 0), (m11, a11, 1, 1))
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_r, TILE_C), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_r, TILE_C), 1)

    per_tile = []
    for (m_t, a_t, tr, tc) in tiles:
        rows = base_r + tr * tile_r + row_iota
        cols = base_c + tc * TILE_C + col_iota
        ys = (rows - py).astype(jnp.float32)
        xs = (cols - px).astype(jnp.float32)
        in_win = (jnp.abs(ys) <= half_w) & (jnp.abs(xs) <= half_w)
        in_bounds = (rows > 0) & (rows < h - 1) & (cols > 0) & (cols < w - 1)
        r_rot = xs * sin_a + ys * cos_a
        c_rot = xs * cos_a - ys * sin_a
        r_bin = r_rot / hwid + (0.5 * ww - 0.5)
        c_bin = c_rot / hwid + (0.5 * ww - 0.5)
        in_bin = (r_bin > -1.0) & (r_bin < ww) & (c_bin > -1.0) & (c_bin < ww)
        mask = in_win & in_bounds & in_bin & ok
        weight = jnp.exp(
            weight_mul * ((r_rot / hwid) ** 2 + (c_rot / hwid) ** 2)
        )
        wm = jnp.where(mask, weight * m_t[0], 0.0)
        r_bin = jnp.where(mask, r_bin, 0.0)
        c_bin = jnp.where(mask, c_bin, 0.0)
        ob = jnp.mod(
            (a_t[0] - angle) * (num_bins / 360.0), jnp.float32(num_bins)
        )
        ob = jnp.where(mask, ob, 0.0)
        r0b = jnp.floor(r_bin).astype(jnp.int32)
        c0b = jnp.floor(c_bin).astype(jnp.int32)
        o0b = jnp.mod(jnp.floor(ob).astype(jnp.int32), num_bins)
        rf = r_bin - r0b.astype(jnp.float32)
        cf = c_bin - c0b.astype(jnp.float32)
        of = ob - o0b.astype(jnp.float32)
        c1 = wm * rf
        per_tile.append(
            dict(r0=r0b, c0=c0b, o0=o0b, o1=jnp.mod(o0b + 1, num_bins),
                 cf=cf, of=of, c1=c1, c0w=wm - c1)
        )

    # Accumulation note (measured, round 2): an MXU formulation — 16
    # spatial-cell planes x num_bins orientation planes contracted as a
    # (16, S')@(S', nb) dot — passes in interpret mode but the Mosaic
    # remote compiler rejects any dot whose operands come from
    # stacked/reshaped computed vectors (probed: plain ref-fed 2-D dots
    # compile, stack/reshape compile, their combination with dot does
    # not).  The deeper blocker is structural anyway: the 2x2 tile
    # neighborhood is (2*DESC_TILE_R) x 256 samples, ~14x the typical
    # 57-wide window, so any per-keypoint-grid kernel pays 14x the
    # compute of the XLA small-bucket GEMM path — which is why the GEMM
    # path stays the default (descriptor.py).  Kept: the original
    # per-cell masked-reduction accumulation, which compiles and is
    # pinned by tests/test_tpu.py on real hardware.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_LANES), 1)
    row = jnp.zeros((1, OUT_LANES), jnp.float32)
    # only the inner ww x ww cells survive the reference's padding-ring
    # crop (sift_impl.py:509)
    for r in range(1, ww + 1):
        wr = [
            jnp.where(t["r0"] + 1 == r, t["c0w"], 0.0)
            + jnp.where(t["r0"] + 2 == r, t["c1"], 0.0)
            for t in per_tile
        ]
        for c in range(1, ww + 1):
            wrc = [
                wr_t * (
                    jnp.where(t["c0"] + 1 == c, 1.0 - t["cf"], 0.0)
                    + jnp.where(t["c0"] + 2 == c, t["cf"], 0.0)
                )
                for wr_t, t in zip(wr, per_tile)
            ]
            for o in range(num_bins):
                sb = sum(
                    jnp.sum(
                        jnp.where(t["o0"] == o, w_t * (1.0 - t["of"]), 0.0)
                        + jnp.where(t["o1"] == o, w_t * t["of"], 0.0)
                    )
                    for w_t, t in zip(wrc, per_tile)
                )
                idx = ((r - 1) * ww + (c - 1)) * num_bins + o
                row = jnp.where(lane == idx, sb, row)
    out_ref[pl.ds(jnp.mod(i, OUT_ROWS), 1), :] = row


@functools.partial(
    jax.jit,
    static_argnames=("half_cap", "num_bins", "window_width", "img_h", "img_w",
                     "interpret", "tile_r"),
)
def descriptor_histograms(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    layer: jnp.ndarray,
    py: jnp.ndarray,
    px: jnp.ndarray,
    half_w: jnp.ndarray,
    cos_a: jnp.ndarray,
    sin_a: jnp.ndarray,
    hist_width: jnp.ndarray,
    angle: jnp.ndarray,
    valid: jnp.ndarray,
    half_cap: int,
    img_h: int,
    img_w: int,
    num_bins: int = 8,
    window_width: int = 4,
    interpret: bool = False,
    tile_r: int = DESC_TILE_R,
) -> jnp.ndarray:
    """(K, 128) trilinear descriptor histograms (sift_impl.py:459-509).

    Same blocked 2x2-tile window scheme as the orientation kernel, with
    the full trilinear two-hot accumulation fused on-chip — no (K, S^2,
    36) HBM intermediate at all.  Returns the tensor already cropped to
    the inner ww x ww cells; the caller post-processes.

    ``tile_r`` sizes the row tile (two tiles must cover the window:
    2*half_cap+1 <= tile_r+1); the 56-row tile serves the small bucket's
    57-wide windows with 36% of the default tile's samples
    (scripts/probe_desc_small_pallas_r5.py A/Bs it vs the GEMM path).
    """
    assert 2 * half_cap + 1 <= tile_r + 1, (half_cap, tile_r)
    assert tile_r % 8 == 0, tile_r
    out_dim = window_width * window_width * num_bins
    assert out_dim == OUT_LANES, out_dim
    k = layer.shape[0]
    pad = (-k) % OUT_ROWS
    if pad:
        (layer, py, px, half_w, cos_a, sin_a, hist_width, angle, valid) = (
            jnp.pad(a, (0, pad))
            for a in (layer, py, px, half_w, cos_a, sin_a, hist_width,
                      angle, valid)
        )
        hist_width = jnp.where(hist_width == 0.0, 1.0, hist_width)
    kp = layer.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"

    hs, ws = mag_stack.shape[-2:]
    ph = (-hs) % tile_r + tile_r
    pw = (-ws) % TILE_C + TILE_C
    if ph or pw:
        cfgp = [(0, 0), (0, ph), (0, pw)]
        mag_stack = jnp.pad(mag_stack, cfgp)
        ang_stack = jnp.pad(ang_stack, cfgp)

    sy = jnp.clip(py - half_cap, 0, hs - 1)
    sx = jnp.clip(px - half_cap, 0, ws - 1)
    r0 = sy // tile_r
    c0 = sx // TILE_C

    def tile_spec(tr, tc):
        return pl.BlockSpec(
            (1, tile_r, TILE_C),
            lambda i, r0_ref, c0_ref, layer_ref, *_: (
                layer_ref[i], r0_ref[i] + tr, c0_ref[i] + tc
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(kp,),
        in_specs=[tile_spec(tr, tc) for tr in (0, 1) for tc in (0, 1)] * 2,
        out_specs=pl.BlockSpec(
            (OUT_ROWS, OUT_LANES),
            lambda i, *_: (i // OUT_ROWS, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _descriptor_kernel, num_bins=num_bins, window_width=window_width,
        h=img_h, w=img_w, tile_r=tile_r,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, OUT_LANES), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        r0.astype(jnp.int32), c0.astype(jnp.int32), layer.astype(jnp.int32),
        py.astype(jnp.int32), px.astype(jnp.int32), half_w.astype(jnp.int32),
        cos_a.astype(jnp.float32), sin_a.astype(jnp.float32),
        hist_width.astype(jnp.float32), angle.astype(jnp.float32),
        valid.astype(jnp.int32),
        *([mag_stack.astype(jnp.float32)] * 4),
        *([ang_stack.astype(jnp.float32)] * 4),
    )
    return out[:k]


def _pair_gather_kernel(
    # scalar prefetch
    r0_ref, c0_ref, layer_ref, roff_ref, coff_ref,
    # block-mapped inputs: 2x2 tiles of mag and ang
    m00, m01, m10, m11, a00, a01, a10, a11,
    # outputs
    out_m, out_a,
    *, s: int, tr: int, tc: int,
):
    i = pl.program_id(0)
    ro = roff_ref[i]
    co = coff_ref[i]

    def gather(t00, t01, t10, t11):
        top = jnp.concatenate([t00[0], t01[0]], axis=1)
        bot = jnp.concatenate([t10[0], t11[0]], axis=1)
        full = jnp.concatenate([top, bot], axis=0)        # (2tr, 2tc)
        # rotate the window start to the origin (dynamic sublane/lane
        # roll; shifts kept positive: ro in [0, tr), co in [0, tc))
        full = pltpu.roll(full, 2 * tr - ro, 0)
        full = pltpu.roll(full, 2 * tc - co, 1)
        return full[:s, :s]

    out_m[0] = gather(m00, m01, m10, m11)
    out_a[0] = gather(a00, a01, a10, a11)


@functools.partial(jax.jit, static_argnames=("half_cap", "interpret"))
def pair_window_gather(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    layer: jnp.ndarray,
    cy: jnp.ndarray,
    cx: jnp.ndarray,
    half_cap: int,
    interpret: bool = False,
):
    """(K, S, S) mag+ang windows with S = 2*half_cap + 1 — Pallas path.

    Drop-in replacement for orientation._window_gather_pair (same
    clamped-start semantics; bit-exact data movement): the vmapped
    per-keypoint ``dynamic_slice`` lowers to a sequential while loop
    (~2.7 us per keypoint — ~105 ms/run of the round-3 device profile);
    here a pipelined grid fetches the 2x2 (tr, 128)-tile neighborhood
    of each window and the VPU rotates it into place, so the cost is
    ~the tile DMA.  Returns ``(magw, angw, sy, sx)`` — window starts,
    from which callers derive absolute coords.
    """
    s = 2 * half_cap + 1
    tr = ((s - 1 + 7) // 8) * 8           # 2 tiles cover any window: s <= tr+1
    tc = TILE_C
    n_l, h, w = mag_stack.shape
    hp = max(h, s)
    wp = max(w, s)
    sy = jnp.clip(cy - half_cap, 0, hp - s).astype(jnp.int32)
    sx = jnp.clip(cx - half_cap, 0, wp - s).astype(jnp.int32)

    # pad so tiles (r0+1, c0+1) always exist
    n_tr = hp // tr + 2
    n_tc = wp // tc + 2
    pads = [(0, 0), (0, n_tr * tr - h), (0, n_tc * tc - w)]
    mag_stack = jnp.pad(mag_stack, pads)
    ang_stack = jnp.pad(ang_stack, pads)

    r0 = sy // tr
    c0 = sx // tc
    roff = sy - r0 * tr
    coff = sx - c0 * tc
    k = layer.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"

    def tile_spec(tdr, tdc):
        return pl.BlockSpec(
            (1, tr, tc),
            lambda i, r0_ref, c0_ref, layer_ref, *_: (
                layer_ref[i], r0_ref[i] + tdr, c0_ref[i] + tdc
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(k,),
        in_specs=[tile_spec(tdr, tdc) for tdr in (0, 1) for tdc in (0, 1)] * 2,
        out_specs=[
            pl.BlockSpec((1, s, s), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
    )
    kernel = functools.partial(_pair_gather_kernel, s=s, tr=tr, tc=tc)
    magw, angw = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((k, s, s), jnp.float32)] * 2,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        r0, c0, layer.astype(jnp.int32), roff, coff,
        *([mag_stack.astype(jnp.float32)] * 4),
        *([ang_stack.astype(jnp.float32)] * 4),
    )
    return magw, angw, sy, sx


def _newton_resident_kernel(
    # scalar prefetch
    nlive_ref, l_ref, y_ref, x_ref, v_ref,
    # whole-stack VMEM input
    dog_ref,
    # outputs
    outf_ref, outi_ref,
    *, h: int, w: int, hp: int, wp: int, border: int, num_intervals: int,
    max_iters: int, chunk: int,
):
    """Per-candidate scalar Newton over a VMEM-resident DoG stack.

    Mirrors ``localize._make_newton_body`` (itself sift_impl.py:175-195):
    same compute -> store -> converge-check -> move order, expressed per
    candidate on the scalar core so settled candidates stop paying
    iterations (75% settle at iteration 1 — docs/DEVNOTES.md fused-
    attribution entry; an XLA masked loop must run all 5 for everyone).

    The 3x3x3 cube read uses the feas2-validated slab scheme
    (docs/PROBE_LOCALIZE_RESIDENT_r04.json): Mosaic requires vector
    loads at (8, 128)-aligned offsets, so each layer loads an aligned
    (16, slab) window, ``pltpu.roll`` rotates the wanted cell to the
    origin (dynamic shifts are fine), and the 27 scalars are static
    extracts.  ``wp``/``hp`` are the padded width/height (the wrapper
    pads when w % 128 != 0 — dynamic_rotate rejects unaligned lane
    shapes — and when h % 8 != 0, so the ``pl.multiple_of(ya, 8)``
    promise below holds even at the ``hp - 16`` clamp); bounds tests
    use the LOGICAL ``h``/``w``.
    """
    step = pl.program_id(0)
    f0 = jnp.float32(0.0)
    slab = 256 if wp >= 256 else wp

    @pl.when(step < nlive_ref[0])
    def _process():
        def cand(j, carry):
            i = step * chunk + j
            ok = v_ref[i] != 0

            def run_newton():
                def cond(st):
                    t = st[0]
                    conv = st[20]
                    rej = st[21]
                    return (t < max_iters) & ~conv & ~rej

                def body(st):
                    (t, x, y, l, cx, cy, cl, _ux, _uy, _us, _gx, _gy,
                     _gs, _dxx, _dyy, _dss, _dxy, _dxs, _dys, _center,
                     conv, rej) = st

                    xa = jnp.minimum(((x - 1) // 128) * 128, wp - slab)
                    xa = pl.multiple_of(xa, 128)
                    ya = jnp.minimum(((y - 1) // 8) * 8, hp - 16)
                    ya = pl.multiple_of(ya, 8)
                    xoff = x - 1 - xa
                    yoff = y - 1 - ya
                    wins = []
                    for dl in (-1, 0, 1):
                        s16 = dog_ref[l + dl, pl.ds(ya, 16),
                                      pl.ds(xa, slab)]
                        s16 = pltpu.roll(s16, 16 - yoff, 0)
                        s16 = pltpu.roll(s16, slab - xoff, 1)
                        wins.append(s16[:3, :3])
                    win = jnp.concatenate(wins, axis=0)     # (9, 3)

                    def c(dl, dy, dx):
                        return win[(dl + 1) * 3 + (dy + 1), dx + 1] / 255.0

                    # derivatives: localize._derivatives expressions
                    gx = 0.5 * (c(0, 0, 1) - c(0, 0, -1))
                    gy = 0.5 * (c(0, 1, 0) - c(0, -1, 0))
                    gs = 0.5 * (c(1, 0, 0) - c(-1, 0, 0))
                    v = c(0, 0, 0)
                    dxx = c(0, 0, 1) - 2 * v + c(0, 0, -1)
                    dyy = c(0, 1, 0) - 2 * v + c(0, -1, 0)
                    dss = c(1, 0, 0) - 2 * v + c(-1, 0, 0)
                    dxy = 0.25 * (c(0, 1, 1) - c(0, 1, -1)
                                  - c(0, -1, 1) + c(0, -1, -1))
                    dxs = 0.25 * (c(1, 0, 1) - c(1, 0, -1)
                                  - c(-1, 0, 1) + c(-1, 0, -1))
                    dys = 0.25 * (c(1, 1, 0) - c(1, -1, 0)
                                  - c(-1, 1, 0) + c(-1, -1, 0))
                    # localize._solve3, same cofactor chain
                    c00 = dyy * dss - dys * dys
                    c01 = dys * dxs - dxy * dss
                    c02 = dxy * dys - dyy * dxs
                    det = dxx * c00 + dxy * c01 + dxs * c02
                    c11 = dxx * dss - dxs * dxs
                    c12 = dxy * dxs - dxx * dys
                    c22 = dxx * dyy - dxy * dxy
                    det_ok = jnp.abs(det) > 1e-30
                    safe = jnp.where(det_ok, det, 1.0)
                    ux = jnp.where(
                        det_ok, -(c00 * gx + c01 * gy + c02 * gs) / safe, f0)
                    uy = jnp.where(
                        det_ok, -(c01 * gx + c11 * gy + c12 * gs) / safe, f0)
                    us = jnp.where(
                        det_ok, -(c02 * gx + c12 * gy + c22 * gs) / safe, f0)

                    conv_now = (
                        (jnp.abs(ux) < 0.5) & (jnp.abs(uy) < 0.5)
                        & (jnp.abs(us) < 0.5)
                    )
                    nx = x + jnp.rint(ux).astype(jnp.int32)
                    ny = y + jnp.rint(uy).astype(jnp.int32)
                    nl = l + jnp.rint(us).astype(jnp.int32)
                    oob = (
                        (ny < border) | (ny >= h - border)
                        | (nx < border) | (nx >= w - border)
                        | (nl < 1) | (nl > num_intervals)
                    )
                    rej2 = ~conv_now & oob
                    x2 = jnp.where(conv_now, x, jnp.clip(nx, 1, w - 2))
                    y2 = jnp.where(conv_now, y, jnp.clip(ny, 1, h - 2))
                    l2 = jnp.where(conv_now, l,
                                   jnp.clip(nl, 1, num_intervals))
                    return (t + 1, x2, y2, l2, x, y, l, ux, uy, us,
                            gx, gy, gs, dxx, dyy, dss, dxy, dxs, dys, v,
                            conv_now, rej2)

                x0 = x_ref[i]
                y0 = y_ref[i]
                l0 = l_ref[i]
                i0 = jnp.int32(0)
                st0 = (i0, x0, y0, l0, x0, y0, l0,
                       f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0,
                       jnp.bool_(False), jnp.bool_(False))
                return jax.lax.while_loop(cond, body, st0)

            def zeros():
                i0 = jnp.int32(0)
                return (i0, i0, i0, i0, i0, i0, i0,
                        f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0,
                        jnp.bool_(False), jnp.bool_(False))

            (t, x, y, l, cx, cy, cl, ux, uy, us, gx, gy, gs,
             dxx, dyy, dss, dxy, dxs, dys, center, conv, rej) = (
                jax.lax.cond(ok, run_newton, zeros)
            )

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            rowf = jnp.zeros((1, 128), jnp.float32)
            for slot, val in enumerate(
                (ux, uy, us, gx, gy, gs, center,
                 dxx, dyy, dss, dxy, dxs, dys)
            ):
                rowf = jnp.where(lane == slot, val, rowf)
            rowi = jnp.zeros((1, 128), jnp.int32)
            for slot, val in enumerate(
                (x, y, l, cx, cy, cl,
                 conv.astype(jnp.int32), rej.astype(jnp.int32))
            ):
                rowi = jnp.where(lane == slot, val, rowi)
            outf_ref[pl.ds(j, 1), :] = rowf
            outi_ref[pl.ds(j, 1), :] = rowi
            return carry

        jax.lax.fori_loop(0, chunk, cand, 0)

    @pl.when(step >= nlive_ref[0])
    def _skip():
        outf_ref[:, :] = jnp.zeros((chunk, 128), jnp.float32)
        outi_ref[:, :] = jnp.zeros((chunk, 128), jnp.int32)


def localize_newton_resident(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    n_live_chunks: jnp.ndarray,
    cfg_border: int,
    cfg_num_intervals: int,
    cfg_max_iters: int,
    chunk: int,
    interpret: bool = False,
):
    """Run the resident-stack Newton kernel; returns the 22-lane state.

    ``dog`` is one octave's (L, H, W) stack (f32, 0..255-scale values as
    everywhere in the pipeline); ``n_live_chunks`` the
    chunking.live_chunk_bound of ``cand_valid``.  Output is
    ``(outf (K, 128) f32, outi (K, 128) i32)`` holding the per-candidate
    final Newton state in the lane layout the localize wrapper unpacks.
    The caller guarantees h >= 16; lane padding to a 128 multiple
    happens here (Mosaic dynamic_rotate rejects unaligned lane shapes).
    """
    nl, h, w = dog.shape
    wp = ((w + 127) // 128) * 128
    hp = ((h + 7) // 8) * 8
    if wp != w or hp != h:
        dog = jnp.pad(dog, [(0, 0), (0, hp - h), (0, wp - w)])
    k = layer.shape[0]
    n_chunks = k // chunk
    interpret = interpret or jax.default_backend() == "cpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, 128), lambda s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 128), lambda s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _newton_resident_kernel,
        h=h, w=w, hp=hp, wp=wp, border=cfg_border,
        num_intervals=cfg_num_intervals,
        max_iters=cfg_max_iters, chunk=chunk,
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((k, 128), jnp.float32),
            jax.ShapeDtypeStruct((k, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * nl * hp * wp + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        n_live_chunks.astype(jnp.int32).reshape(1),
        layer.astype(jnp.int32), y.astype(jnp.int32),
        x.astype(jnp.int32), cand_valid.astype(jnp.int32),
        dog.astype(jnp.float32),
    )
