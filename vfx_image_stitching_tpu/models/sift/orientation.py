"""Orientation assignment (sift_impl.py:246-293 parity).

Per localized candidate: a Gaussian-weighted 36-bin histogram of gradient
directions over a data-dependent radius window, [1,4,6,4,1]/16 circular
smoothing, and one keypoint per local peak >= 0.8*max with a parabolic
sub-bin angle.  The reference's per-pixel double loop becomes a vmapped
contiguous dynamic-slice window gather (capacity ``max_radius``, audited
>= the datasets' max radius 17) + 36 masked reductions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig
from vfx_image_stitching_tpu.models.sift.localize import Localized
from vfx_image_stitching_tpu.models.sift.keypoints import Keypoints

_INT_MIN = jnp.iinfo(jnp.int32).min


def _pad_stack(stack: jnp.ndarray, min_h: int, min_w: int) -> jnp.ndarray:
    """Zero-pad trailing dims so dynamic_slice windows always fit."""
    h, w = stack.shape[-2:]
    ph, pw = max(0, min_h - h), max(0, min_w - w)
    if ph or pw:
        cfg = [(0, 0)] * (stack.ndim - 2) + [(0, ph), (0, pw)]
        stack = jnp.pad(stack, cfg)
    return stack


def _window_gather(
    stack: jnp.ndarray, layer: jnp.ndarray, cy: jnp.ndarray, cx: jnp.ndarray,
    half: int, lane_align: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(K, S, W) windows centered near (cy, cx) plus their absolute coords.

    Slice starts are clamped; masks must be built from the returned
    absolute coordinates, not from the nominal center.  With
    ``lane_align`` the slice width rounds up to a multiple of 128 (TPU
    lane width) — wider but aligned copies.
    """
    s = 2 * half + 1
    w = ((s + 127) // 128) * 128 if lane_align else s
    stack = _pad_stack(stack, s, w)
    hp, wp = stack.shape[-2:]
    sy = jnp.clip(cy - half, 0, hp - s)
    sx = jnp.clip(cx - half, 0, wp - w)

    def one(l, yy, xx):
        return jax.lax.dynamic_slice(stack, (l, yy, xx), (1, s, w))[0]

    win = jax.vmap(one)(layer, sy, sx)
    rows = sy[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    cols = sx[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]
    return win, rows, cols


def combine_mag_ang(mag_stack: jnp.ndarray,
                    ang_stack: jnp.ndarray) -> jnp.ndarray:
    """(L, H, 2, W) interleave of the gradient fields for paired gathers.

    Built ONCE per octave (outside any per-chunk loop — inside it the
    copy would repeat per chunk) and consumed by
    :func:`_window_gather_pair`.
    """
    return jnp.stack([mag_stack, ang_stack], axis=-2)


def _window_gather_pair(
    stack2: jnp.ndarray, layer: jnp.ndarray,
    cy: jnp.ndarray, cx: jnp.ndarray, half: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather matching mag+ang windows with ONE dynamic_slice per keypoint.

    The vmapped per-keypoint ``dynamic_slice`` lowers to a sequential
    while loop on TPU (~1.3 us per slice); gathering mag and ang
    separately doubles it.  ``stack2`` is the (L, H, 2, W) interleave
    from :func:`combine_mag_ang`.  Returns ``(magw, angw, rows, cols)``
    shaped like two :func:`_window_gather` calls.
    """
    s = 2 * half + 1
    hp = max(stack2.shape[-3], s)
    wp = max(stack2.shape[-1], s)
    if (hp, wp) != (stack2.shape[-3], stack2.shape[-1]):
        stack2 = jnp.pad(
            stack2,
            [(0, 0), (0, hp - stack2.shape[-3]), (0, 0),
             (0, wp - stack2.shape[-1])],
        )
    sy = jnp.clip(cy - half, 0, hp - s)
    sx = jnp.clip(cx - half, 0, wp - s)

    def one(l, yy, xx):
        return jax.lax.dynamic_slice(stack2, (l, yy, 0, xx), (1, s, 2, s))[0]

    win = jax.vmap(one)(layer, sy, sx)                    # (K, S, 2, S)
    rows = sy[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    cols = sx[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    return win[:, :, 0, :], win[:, :, 1, :], rows, cols


def _masked_histogram(
    contrib: jnp.ndarray, bins: jnp.ndarray, num_bins: int
) -> jnp.ndarray:
    """(K, num_bins) histogram via unrolled masked reductions (VPU-friendly)."""
    return jnp.stack(
        [
            jnp.sum(jnp.where(bins == b, contrib, 0.0), axis=-1)
            for b in range(num_bins)
        ],
        axis=-1,
    )


def assign_orientations_chunked(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    loc: Localized,
    octave: int,
    cfg: SiftConfig,
    chunk: int = 512,
    layer_base: int = 0,
) -> Keypoints:
    """`assign_orientations` over the live leading candidate chunks only.

    Localized capacities are audited worst-case and `compact_localized`
    packs valid candidates to the front, so tail chunks of a typical
    image are filler — the loop's trip count is the live chunk bound
    (vmap-safe, unlike the earlier per-chunk cond: see
    models/sift/chunking.py).  The candidate-major emission order is
    preserved (chunks are processed in order and each emits its own
    candidate-major block; skipped tail chunks emit all-zero /
    valid=False rows, exactly like the old dead branch).
    """
    k = loc.x.shape[0]
    if k <= chunk:
        chunk = k  # single chunk — still worth the live bound: tail
        #            octaves of a typical image have zero candidates
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k
    p_cap = cfg.capacities.max_orientations

    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )

    n_chunks = k // chunk
    reshaped = Localized(*[f.reshape(n_chunks, chunk) for f in loc])
    m = chunk * p_cap
    zf = jnp.zeros((n_chunks, m), jnp.float32)
    zi = jnp.zeros((n_chunks, m), jnp.int32)
    out_zeros = Keypoints(
        x=zf, y=zf, size=zf, angle=zf, response=zf, octave=zi,
        valid=jnp.zeros((n_chunks, m), bool), ix=zi, iy=zi,
        jx=zi, jy=zi, jl=zi,
    )

    def body_fn(i):
        loc_c = Localized(*index_chunk(tuple(reshaped), i))
        return assign_orientations(mag_stack, ang_stack, loc_c, octave, cfg,
                                   layer_base=layer_base)

    out = chunked_live_loop(
        live_chunk_bound(loc.valid, chunk), body_fn, out_zeros
    )
    return Keypoints(*[f.reshape(k * p_cap) for f in out])


def assign_orientations(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    loc: Localized,
    octave: int,
    cfg: SiftConfig,
    layer_base: int = 0,
) -> Keypoints:
    """Emit up to ``max_orientations`` oriented keypoints per candidate.

    Returns a Keypoints set of capacity K * max_orientations, ordered
    (candidate-major, peak-bin ascending) to match the reference's
    emission order.  ``layer_base`` re-bases the gradient-stack plane
    index: the pipeline passes 3-level stacks holding layers
    1..num_intervals (layer_base=1); the reference-shaped API passes
    full 6-level stacks (layer_base=0).
    """
    caps = cfg.capacities
    half = caps.max_radius
    nb = cfg.num_bins
    h, w = mag_stack.shape[-2:]

    inv_scale_o = jnp.float32(2.0 ** -(octave))
    scale = cfg.scale_factor * loc.size * jnp.float32(2.0 ** -(octave + 1))
    radius = jnp.rint(cfg.radius_factor * scale).astype(jnp.int32)
    weight_factor = -0.5 / (scale * scale)
    cx = jnp.rint(loc.pt_x * inv_scale_o).astype(jnp.int32)
    cy = jnp.rint(loc.pt_y * inv_scale_o).astype(jnp.int32)
    k = loc.x.shape[0]
    # filler slots carry layer 0, which re-bases below 0 — clamp so the
    # (masked-out) window fetch stays in bounds
    lyr = jnp.clip(loc.layer - layer_base, 0, mag_stack.shape[-3] - 1)

    if cfg.use_pallas:
        import os

        from vfx_image_stitching_tpu.models.sift import pallas_kernels as pk

        # v2 rolls the window into place before the 36-bin reduction
        # (4x less VPU work, bit-equal); VFX_ORIENT_V2=0 restores v1
        hist = (
            pk.orientation_histograms_v2
            if os.environ.get("VFX_ORIENT_V2", "1") == "1"
            else pk.orientation_histograms
        )
        raw = hist(
            mag_stack, ang_stack, lyr, cy, cx, radius, weight_factor,
            loc.valid, half, h, w, nb,
        )
    else:
        magw, rows, cols = _window_gather(mag_stack, lyr, cy, cx, half)
        angw, _, _ = _window_gather(ang_stack, lyr, cy, cx, half)

        dy = rows - cy[:, None]           # (K, S)
        dx = cols - cx[:, None]
        in_radius = (
            (jnp.abs(dy) <= radius[:, None])[:, :, None]
            & (jnp.abs(dx) <= radius[:, None])[:, None, :]
        )
        in_bounds = (
            ((rows >= 1) & (rows <= h - 2))[:, :, None]
            & ((cols >= 1) & (cols <= w - 2))[:, None, :]
        )
        d2 = (dy * dy)[:, :, None] + (dx * dx)[:, None, :]
        weight = jnp.exp(weight_factor[:, None, None] * d2.astype(jnp.float32))
        contrib = jnp.where(in_radius & in_bounds, weight * magw, 0.0)
        bins = jnp.mod(
            jnp.rint(angw * (nb / 360.0)).astype(jnp.int32), nb
        )
        raw = _masked_histogram(contrib.reshape(k, -1), bins.reshape(k, -1), nb)

    # circular [1,4,6,4,1]/16 smoothing (sift_impl.py:273-277)
    smooth = (
        6.0 * raw
        + 4.0 * (jnp.roll(raw, 1, axis=-1) + jnp.roll(raw, -1, axis=-1))
        + jnp.roll(raw, 2, axis=-1) + jnp.roll(raw, -2, axis=-1)
    ) / 16.0
    maxv = jnp.max(smooth, axis=-1, keepdims=True)
    left = jnp.roll(smooth, 1, axis=-1)
    right = jnp.roll(smooth, -1, axis=-1)
    qualify = (
        (smooth > left) & (smooth > right)
        & (smooth >= cfg.peak_ratio * maxv)
        & loc.valid[:, None]
    )

    # first max_orientations qualifying bins in ascending order
    p_cap = caps.max_orientations
    bin_ids = jnp.arange(nb, dtype=jnp.int32)[None, :]
    sel_scores = jnp.where(qualify, -bin_ids, _INT_MIN)
    top, _ = jax.lax.top_k(sel_scores, p_cap)
    peak_valid = top > _INT_MIN
    p = jnp.where(peak_valid, -top, 0)                      # (K, P)

    rowsk = jnp.arange(k)[:, None]
    s_p = smooth[rowsk, p]
    s_l = smooth[rowsk, (p - 1) % nb]
    s_r = smooth[rowsk, (p + 1) % nb]
    denom = s_l - 2.0 * s_p + s_r
    denom = jnp.where(denom == 0.0, 1.0, denom)
    interp = jnp.mod(p.astype(jnp.float32) + 0.5 * (s_l - s_r) / denom, nb)
    angle = 360.0 - interp * (360.0 / nb)
    angle = jnp.where(jnp.abs(angle - 360.0) < cfg.float_tolerance, 0.0, angle)

    def expand(f):
        return jnp.broadcast_to(f[:, None], (k, p_cap)).reshape(-1)

    return Keypoints(
        x=expand(loc.pt_x),
        y=expand(loc.pt_y),
        size=expand(loc.size),
        angle=angle.reshape(-1),
        response=expand(loc.response),
        octave=expand(loc.octave_packed),
        valid=(peak_valid & loc.valid[:, None]).reshape(-1),
        ix=expand(loc.x),
        iy=expand(loc.y),
        jx=expand(loc.jx),
        jy=expand(loc.jy),
        jl=expand(loc.jl),
    )
