"""128-d SIFT descriptors as a batched trilinear one-hot GEMM.

Parity with ``generate_descriptors`` (sift_impl.py:361-526): per keypoint
a (2*half_width+1)^2 sample window, direct-differencing gradients, local
coordinates rotated by ``360 - angle``, 4x4 spatial x 8 orientation bins
with trilinear scatter into a padded (6, 6, 8) tensor, then clip at
0.2*|v|, renormalize, and ``round(512 v)`` clamped to [0, 255].

The reference's ``np.add.at`` scatter decomposes *separably*: every sample
contributes ``wm * R6 (x) C6 (x) O8`` where R6/C6/O8 are two-hot interp
vectors.  The whole descriptor is then one batched matmul
``(36, S) @ (S, 8)`` per keypoint — MXU work with no scatter at all.
Chunked over keypoints to bound the (chunk, S, 36) one-hot intermediate.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig
from vfx_image_stitching_tpu.models.sift.keypoints import Keypoints, unpack_octave
from vfx_image_stitching_tpu.models.sift.orientation import _window_gather


def _two_hot(idx: jnp.ndarray, frac_lo: jnp.ndarray, frac_hi: jnp.ndarray,
             n: int, wrap: bool) -> jnp.ndarray:
    """(..., n) vector with frac_lo at idx and frac_hi at idx+1 (opt. mod n)."""
    pos = jnp.arange(n, dtype=jnp.int32)
    idx0 = jnp.mod(idx, n) if wrap else idx
    idx1 = jnp.mod(idx + 1, n) if wrap else idx + 1
    lo = jnp.where(pos == idx0[..., None], frac_lo[..., None], 0.0)
    hi = jnp.where(pos == idx1[..., None], frac_hi[..., None], 0.0)
    return lo + hi


def _finalize(vec: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """Clip at 0.2*|v|, renormalize, round(512 v) clamped to [0, 255]."""
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    thr = norm * cfg.descriptor_max_value
    vec = jnp.minimum(vec, thr)
    norm2 = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    norm2 = jnp.maximum(norm2, cfg.float_tolerance)
    vec = vec / norm2
    return jnp.clip(jnp.rint(512.0 * vec), 0.0, 255.0).astype(jnp.float32)


def _window_params(kps: Keypoints, cfg: SiftConfig, rows_dim: int, cols_dim: int):
    """Per-keypoint descriptor window geometry (sift_impl.py:370-387)."""
    octv, layer, scl = unpack_octave(kps.octave)
    pt_x = jnp.rint(scl * kps.x).astype(jnp.int32)
    pt_y = jnp.rint(scl * kps.y).astype(jnp.int32)
    angle = 360.0 - kps.angle
    rad = jnp.deg2rad(angle)
    hist_width = cfg.scale_multiplier * 0.5 * scl * kps.size
    ww = cfg.window_width
    half_w = jnp.rint(
        hist_width * (math.sqrt(2) * (ww + 1) * 0.5)
    ).astype(jnp.int32)
    diag = int(math.sqrt(rows_dim**2 + cols_dim**2))
    half_w = jnp.minimum(half_w, diag)
    half_w = jnp.minimum(half_w, cfg.capacities.max_half_width)
    return layer, pt_x, pt_y, angle, jnp.cos(rad), jnp.sin(rad), hist_width, half_w


def compute_descriptors_pallas(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    kps: Keypoints,
    octave: int,
    cfg: SiftConfig,
    layer_base: int = 0,
) -> jnp.ndarray:
    """Tiled-window Pallas path: trilinear bins never leave VMEM."""
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        descriptor_histograms,
    )

    rows_dim, cols_dim = mag_stack.shape[-2:]
    layer, pt_x, pt_y, angle, cos_a, sin_a, hist_width, half_w = _window_params(
        kps, cfg, rows_dim, cols_dim
    )
    layer = jnp.clip(layer - layer_base, 0, mag_stack.shape[-3] - 1)
    safe_hw = jnp.where(hist_width > 0.0, hist_width, 1.0)
    vec = descriptor_histograms(
        mag_stack, ang_stack, layer, pt_y, pt_x, half_w,
        cos_a, sin_a, safe_hw, angle, kps.valid,
        cfg.capacities.max_half_width, rows_dim, cols_dim,
        cfg.desc_bins, cfg.window_width,
    )
    return _finalize(vec, cfg)


def compute_descriptors(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    kps: Keypoints,
    octave: int,
    cfg: SiftConfig,
    half_cap: int | None = None,
    layer_base: int = 0,
    ma_stack: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(K, 128) descriptors for *converted* keypoints of one octave.

    ``mag_stack``/``ang_stack`` are the gradient fields of the keypoints'
    own octave (after conversion ``unpack_octave`` yields ``octv =
    octave - 1`` and the reference reads ``gaussian_images[octv + 1]
    [layer]`` — i.e. this very octave).  The pipeline passes 3-level
    stacks holding only the consumable layers 1..num_intervals with
    ``layer_base=1``; the reference-shaped API passes full 6-level
    stacks (layer_base=0).
    """
    caps = cfg.capacities
    if half_cap is None:
        half_cap = caps.max_half_width
    s = 2 * half_cap + 1
    nb = cfg.desc_bins
    ww = cfg.window_width
    rows_dim, cols_dim = mag_stack.shape[-2:]

    octv, layer, scl = unpack_octave(kps.octave)
    pt_x = jnp.rint(scl * kps.x).astype(jnp.int32)
    pt_y = jnp.rint(scl * kps.y).astype(jnp.int32)
    angle = 360.0 - kps.angle
    rad = jnp.deg2rad(angle)
    cos_a = jnp.cos(rad)
    sin_a = jnp.sin(rad)

    hist_width = cfg.scale_multiplier * 0.5 * scl * kps.size
    half_w = jnp.rint(hist_width * (math.sqrt(2) * (ww + 1) * 0.5)).astype(jnp.int32)
    diag = int(math.sqrt(rows_dim**2 + cols_dim**2))
    half_w = jnp.minimum(half_w, diag)
    half_w = jnp.minimum(half_w, half_cap)

    lane_align = caps.desc_lane_align
    lyr = jnp.clip(layer - layer_base, 0, mag_stack.shape[-3] - 1)
    if caps.desc_pallas_gather and not lane_align:
        from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
            pair_window_gather,
        )

        magw, angw, sy, sx = pair_window_gather(
            mag_stack, ang_stack, lyr, pt_y, pt_x, half_cap
        )
        rng = jnp.arange(s, dtype=jnp.int32)
        rows = sy[:, None] + rng[None, :]
        cols = sx[:, None] + rng[None, :]
    elif ma_stack is None or lane_align:
        magw, rows, cols = _window_gather(
            mag_stack, lyr, pt_y, pt_x, half_cap, lane_align
        )
        angw, _, _ = _window_gather(
            ang_stack, lyr, pt_y, pt_x, half_cap, lane_align
        )
    else:
        # combined (L, H, 2, W) stack built ONCE per octave by the
        # chunked caller: one dynamic_slice per keypoint instead of two
        from vfx_image_stitching_tpu.models.sift.orientation import (
            _window_gather_pair,
        )

        magw, angw, rows, cols = _window_gather_pair(
            ma_stack, lyr, pt_y, pt_x, half_cap
        )

    ys = rows - pt_y[:, None]                       # (K, S) row offsets
    xs = cols - pt_x[:, None]                       # (K, S) col offsets
    in_win = (
        (jnp.abs(ys) <= half_w[:, None])[:, :, None]
        & (jnp.abs(xs) <= half_w[:, None])[:, None, :]
    )
    in_bounds = (
        ((rows > 0) & (rows < rows_dim - 1))[:, :, None]
        & ((cols > 0) & (cols < cols_dim - 1))[:, None, :]
    )
    ysf = ys.astype(jnp.float32)[:, :, None]
    xsf = xs.astype(jnp.float32)[:, None, :]
    r_rot = xsf * sin_a[:, None, None] + ysf * cos_a[:, None, None]
    c_rot = xsf * cos_a[:, None, None] - ysf * sin_a[:, None, None]
    hw = hist_width[:, None, None]
    r_bin = r_rot / hw + 0.5 * ww - 0.5
    c_bin = c_rot / hw + 0.5 * ww - 0.5
    in_bin = (r_bin > -1.0) & (r_bin < ww) & (c_bin > -1.0) & (c_bin < ww)

    weight_mul = -0.5 / ((0.5 * ww) ** 2)
    weight = jnp.exp(weight_mul * ((r_rot / hw) ** 2 + (c_rot / hw) ** 2))
    mask = in_win & in_bounds & in_bin & kps.valid[:, None, None]
    wm = jnp.where(mask, weight * magw, 0.0)

    # sanitize masked samples: hist_width of an invalid slot can be 0,
    # making r_bin/c_bin inf/nan, and 0 * nan would poison the GEMM
    r_bin = jnp.where(mask, r_bin, 0.0)
    c_bin = jnp.where(mask, c_bin, 0.0)

    orient = angw
    ob = jnp.mod((orient - angle[:, None, None]) * (nb / 360.0), nb)
    ob = jnp.where(mask, ob, 0.0)

    r0 = jnp.floor(r_bin).astype(jnp.int32)
    c0 = jnp.floor(c_bin).astype(jnp.int32)
    o0 = jnp.mod(jnp.floor(ob).astype(jnp.int32), nb)
    rf = r_bin - r0
    cf = c_bin - c0
    of = ob - o0

    k = wm.shape[0]
    s2 = wm.shape[1] * wm.shape[2]
    # reference row split: c1 = wm*rf to row r0+2, (wm - c1) to row r0+1
    c1 = wm * rf
    # rc = two_hot(rows) (x) two_hot(cols), built DIRECTLY over a
    # combined minor axis: the (K,S,S,6,6) outer product + reshape
    # forced XLA to materialize relayout copies of the bf16 one-hot
    # tensor (~20 ms/run of the r3 trace); the fused elementwise form
    # is bit-identical (same two factors, multiplied in the same f32
    # order) and born in the GEMM's layout.
    #
    # The one-hot covers ONLY the ww x ww INNER cells: the reference
    # scatters into a (ww+2, ww+2, nb) tensor and crops the padding
    # ring afterwards (sift_impl.py:509), so ring contributions never
    # reach the descriptor — building them 36-wide just to discard 20
    # of 36 GEMM output rows cost ~2x the hot tensor's HBM traffic.
    # The kept cells receive exactly the same products in the same
    # contraction order, so the dot output is bit-identical.
    import os

    inner = os.environ.get("VFX_DESC_INNER", "1") == "1"
    ra = jnp.clip(r0 + 1, 0, ww + 1)[..., None]      # lo slot per sample
    ca = jnp.clip(c0 + 1, 0, ww + 1)[..., None]
    n_cells = ww * ww if inner else (ww + 2) ** 2
    pos = jnp.arange(n_cells, dtype=jnp.int32)
    if inner:
        pa = pos // ww + 1                           # inner rows 1..ww
        pb = pos % ww + 1                            # inner cols 1..ww
    else:                                            # A/B reference path
        pa = pos // (ww + 2)
        pb = pos % (ww + 2)
    rv = jnp.where(pa == ra, (wm - c1)[..., None], 0.0) + jnp.where(
        pa == ra + 1, c1[..., None], 0.0
    )
    cv = jnp.where(pb == ca, (1.0 - cf)[..., None], 0.0) + jnp.where(
        pb == ca + 1, cf[..., None], 0.0
    )
    o8 = _two_hot(o0, (1.0 - of), of, nb, wrap=True)  # (K, S, S, 8)

    rc = (rv * cv).reshape(k, s2, n_cells)
    o8r = o8.reshape(k, s2, nb)
    if cfg.capacities.desc_bf16:
        rc = rc.astype(jnp.bfloat16)
        o8r = o8r.astype(jnp.bfloat16)
    tensor = jax.lax.dot_general(
        rc, o8r,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                # (K, n_cells, 8)
    if not inner:
        tensor = tensor.reshape(k, ww + 2, ww + 2, nb)[:, 1:-1, 1:-1, :]
    vec = tensor.reshape(k, ww * ww * nb)
    return _finalize(vec, cfg)


def compute_descriptors_chunked(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    kps: Keypoints,
    octave: int,
    cfg: SiftConfig,
    half_cap: int | None = None,
    layer_base: int = 0,
    ma_stack: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Chunked one-hot GEMM descriptor path (the measured-fastest).

    A tiled Pallas variant exists (``compute_descriptors_pallas``) but
    measured *slower* on v5e: per-keypoint 2x2 tile fetches (360 KB per
    keypoint for the 89-wide windows) outweigh the saved one-hot HBM
    traffic, while the GEMM reduction rides the MXU.  The SMALL bucket
    (57-wide windows, tile_r=56: 36% of the default tile's samples) was
    A/B'd separately on real parrington octave-0 inputs and lost 3.9x
    (21.5 vs 5.6 us/keypoint, docs/PROBE_DESC_SMALL_PALLAS_r05.json) —
    the per-grid-step overhead, not tile size, dominates at descriptor
    shapes.  ``use_pallas`` therefore gates only the orientation
    kernel, whose 41-wide windows make the tile scheme profitable.
    """
    k = kps.capacity
    chunk = min(cfg.capacities.desc_chunk, k)
    if k % chunk != 0:
        chunk = math.gcd(k, chunk) or k
    out_dim = cfg.window_width * cfg.window_width * cfg.desc_bins
    if (ma_stack is None and not cfg.capacities.desc_lane_align
            and not cfg.capacities.desc_pallas_gather):
        from vfx_image_stitching_tpu.models.sift.orientation import (
            combine_mag_ang,
        )

        ma_stack = combine_mag_ang(mag_stack, ang_stack)

    # capacities are audited worst-case; a typical image fills well
    # under half its keypoint slots, and compaction packs the valid ones
    # to the front — the loop runs only over the live leading chunks
    # (vmap-safe, unlike a per-chunk cond: see models/sift/chunking.py)
    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )

    n_chunks = k // chunk
    reshaped = Keypoints(*[f.reshape(n_chunks, chunk) for f in kps])

    def body_fn(i):
        ck = Keypoints(*index_chunk(tuple(reshaped), i))
        return compute_descriptors(
            mag_stack, ang_stack, ck, octave, cfg, half_cap, layer_base,
            ma_stack,
        )

    out = chunked_live_loop(
        live_chunk_bound(kps.valid, chunk), body_fn,
        jnp.zeros((n_chunks, chunk, out_dim), jnp.float32),
    )
    return out.reshape(k, -1)


def compute_descriptors_bucketed(
    mag_stack: jnp.ndarray,
    ang_stack: jnp.ndarray,
    kps: Keypoints,
    octave: int,
    cfg: SiftConfig,
    small_cap: int,
    big_cap: int,
    layer_base: int = 0,
) -> jnp.ndarray:
    """Size-bucketed descriptors: small windows for most keypoints.

    The sampling half-width is data dependent (~19..44 px, median ~27);
    a single fixed window must cover the max, wasting ~2.4x samples on
    the typical keypoint.  Keypoints with ``half_w <= desc_small_half``
    are compacted into a small-window pass (correct because masks discard
    samples beyond each keypoint's own half_w); the rest — plus any
    small-group overflow, which the big window also computes correctly —
    take the full-window pass.  Both groups' capacities come from the
    dataset audit.
    """
    caps = cfg.capacities
    k = kps.capacity
    rows_dim, cols_dim = mag_stack.shape[-2:]
    (_layer, _px, _py, _ang, _cos, _sin, _hw, half_w) = _window_params(
        kps, cfg, rows_dim, cols_dim
    )
    is_small = kps.valid & (half_w <= caps.desc_small_half)
    small_rank = jnp.cumsum(is_small.astype(jnp.int32)) - 1
    in_small = is_small & (small_rank < small_cap)
    in_big = kps.valid & ~in_small

    big_int = jnp.iinfo(jnp.int32).max
    arange = jnp.arange(k, dtype=jnp.int32)
    idx_small = jnp.argsort(jnp.where(in_small, arange, big_int))[:small_cap]
    idx_big = jnp.argsort(jnp.where(in_big, arange, big_int))[:big_cap]

    def take(idx, member):
        sub = Keypoints(*[f[idx] for f in kps])
        return sub._replace(valid=member[idx])

    ma_stack = None
    if not caps.desc_lane_align and not caps.desc_pallas_gather:
        from vfx_image_stitching_tpu.models.sift.orientation import (
            combine_mag_ang,
        )

        ma_stack = combine_mag_ang(mag_stack, ang_stack)
    d_small = compute_descriptors_chunked(
        mag_stack, ang_stack, take(idx_small, in_small), octave, cfg,
        half_cap=caps.desc_small_half, layer_base=layer_base,
        ma_stack=ma_stack,
    )
    d_big = compute_descriptors_chunked(
        mag_stack, ang_stack, take(idx_big, in_big), octave, cfg,
        layer_base=layer_base, ma_stack=ma_stack,
    )

    # scatter back; filler indices may collide with real rows, so each
    # group's scatter is masked by its own membership before merging
    full_small = jnp.zeros((k, d_small.shape[-1]), jnp.float32)
    full_small = full_small.at[idx_small].set(d_small)
    full_big = jnp.zeros((k, d_big.shape[-1]), jnp.float32)
    full_big = full_big.at[idx_big].set(d_big)
    desc = jnp.where(in_small[:, None], full_small,
                     jnp.where(in_big[:, None], full_big, 0.0))
    return desc, jnp.sum(in_big)
