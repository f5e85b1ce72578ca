"""Harris corner backend: fused response + NMS + batched 128-d descriptors.

Reference behavior being replicated (TPU-first re-design, not a port):
  * ``HarrisCorner`` (image_stitching_harris.py:135-185): signed 3x3
    gradients, 21x21 sigma=2 Gaussian structure tensor, ``R = det - 0.05
    tr^2``, threshold ``0.02*max(R)``, strict 3x3 NMS over the interior,
    top-200 by response (ties resolved in row-major order — Python's stable
    sort over row-major collected candidates).
  * ``compute_keypoints_and_descriptors_harris``
    (image_stitching_harris.py:187-214): drops keypoints within 8 px of the
    border *after* top-k, emits OpenCV-style (x, y).
  * ``gen_descriptor`` (image_stitching_harris.py:72-133): 16x16 patch of
    (magnitude, angle) on edge-padded fields anchored at (y..y+15, x..x+15),
    9x9 sigma=4.5 blur of the magnitude patch, global 8-bin histogram ->
    main orientation ``(argmax+0.5)*45``, angle-shifted (not rotated) 4x4
    cells x 8 bins = 128-d, normalize -> clip 0.2 -> renormalize.

The per-pixel Python loops become one batched device program: NMS via a
3x3 max reduce-window, top-k via ``lax.top_k`` (tie order matches), and the
descriptor histograms as one-hot einsums over a vmapped (K,16,16) patch
gather — MXU-friendly fixed shapes throughout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import HarrisConfig
from vfx_image_stitching_tpu.ops.color import bgr_to_gray_f32
from vfx_image_stitching_tpu.ops.gaussian import gaussian_blur
from vfx_image_stitching_tpu.ops.gradients import reference_gradients, calc_orientation

# Python float on purpose: lax.reduce_window special-cases `init == -inf`
# to pick the max-reduce monoid, which fails on a traced/concrete jnp array.
_NEG_INF = float("-inf")


def harris_corners(
    img_bgr: jnp.ndarray, cfg: HarrisConfig = HarrisConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-``max_points`` Harris corners of one (H, W, 3) uint8 image.

    Returns ``(yy, xx, response, valid, (ix, iy))`` with shape (max_points,)
    arrays ordered by response descending (row-major on ties).
    """
    h, w = img_bgr.shape[:2]
    gray = bgr_to_gray_f32(img_bgr)
    ix, iy = reference_gradients(gray)
    ix2 = gaussian_blur(ix * ix, cfg.gauss_sigma, cfg.block_size)
    iy2 = gaussian_blur(iy * iy, cfg.gauss_sigma, cfg.block_size)
    ixy = gaussian_blur(ix * iy, cfg.gauss_sigma, cfg.block_size)

    det = ix2 * iy2 - ixy * ixy
    tr = ix2 + iy2
    r = det - cfg.k * (tr * tr)

    threshold = jnp.max(r) * cfg.thresh_ratio
    # strict 3x3 local-max: R[i,j] == max of its 3x3 patch
    rmax = jax.lax.reduce_window(
        r, _NEG_INF, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    interior = jnp.zeros((h, w), dtype=bool).at[1 : h - 1, 1 : w - 1].set(True)
    cand = (r > threshold) & (r == rmax) & interior

    scores = jnp.where(cand, r, _NEG_INF).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores, cfg.max_points)
    valid = top_scores > _NEG_INF
    yy = top_idx // w
    xx = top_idx % w
    return yy, xx, top_scores, valid, (ix, iy)


def _descriptor_patches(
    field: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray, pad: int, size: int
) -> jnp.ndarray:
    """Gather (K, size, size) patches anchored at rows/cols [p, p+size)."""
    from vfx_image_stitching_tpu.ops.gaussian import edge_pad_axis

    padded = edge_pad_axis(edge_pad_axis(field, pad, 0), pad, 1)

    def one(y, x):
        return jax.lax.dynamic_slice(padded, (y + pad, x + pad), (size, size))

    return jax.vmap(one)(yy, xx)


def _angle_bins(theta: jnp.ndarray, bins: int) -> jnp.ndarray:
    """``int(ang/360*bins) % bins`` for ang in [0, 360) (floor for ang>=0)."""
    idx = jnp.floor(theta * (bins / 360.0)).astype(jnp.int32)
    return jnp.mod(idx, bins)


def harris_descriptors(
    yy: jnp.ndarray,
    xx: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    cfg: HarrisConfig = HarrisConfig(),
) -> jnp.ndarray:
    """(K, 128) descriptors for keypoints at rows ``yy``, cols ``xx``."""
    m, theta = calc_orientation(ix, iy)
    return harris_descriptors_from_fields(yy, xx, m, theta, cfg)


def harris_descriptors_from_fields(
    yy: jnp.ndarray,
    xx: jnp.ndarray,
    m: jnp.ndarray,
    theta: jnp.ndarray,
    cfg: HarrisConfig = HarrisConfig(),
) -> jnp.ndarray:
    """Descriptors from precomputed magnitude/angle fields — the split the
    reference exposes as ``gen_descriptor(fpx, fpy, m, theta)``
    (image_stitching_harris.py:72-133)."""
    bins = cfg.desc_bins
    size = cfg.patch_size
    pad = size // 2
    patch_m = _descriptor_patches(m, yy, xx, pad, size)       # (K, 16, 16)
    patch_t = _descriptor_patches(theta, yy, xx, pad, size)   # (K, 16, 16)

    # 9x9 sigma=4.5 blur of the magnitude patch, reflect-101 inside the patch
    patch_m = gaussian_blur(patch_m, cfg.desc_blur_sigma, cfg.desc_blur_ksize)

    # global 8-bin orientation histogram over the whole patch -> main angle
    gbin = _angle_bins(jnp.mod(patch_t, 360.0), bins)
    onehot = jax.nn.one_hot(gbin, bins, dtype=jnp.float32)
    hist = jnp.einsum("kij,kijb->kb", patch_m, onehot)
    main_theta = (jnp.argmax(hist, axis=-1).astype(jnp.float32) + 0.5) * (360.0 / bins)

    shifted = jnp.mod(patch_t - main_theta[:, None, None] + 360.0, 360.0)

    # 4x4 cells x 8 bins; cell order (by, bx) row-major as the reference's
    # nested loops produce (image_stitching_harris.py:113-126)
    c = cfg.desc_cells
    cell = size // c
    k = patch_m.shape[0]
    pm = patch_m.reshape(k, c, cell, c, cell)
    cbin = _angle_bins(jnp.mod(shifted, 360.0), bins).reshape(k, c, cell, c, cell)
    conehot = jax.nn.one_hot(cbin, bins, dtype=jnp.float32)
    cell_hist = jnp.einsum("kyucv,kyucvb->kycb", pm, conehot)  # (K, by, bx, 8)
    desc = cell_hist.reshape(k, c * c * bins)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / (norm + 1e-7)
    desc = jnp.clip(desc, 0.0, cfg.desc_clip)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / (norm + 1e-7)


@functools.partial(jax.jit, static_argnames=("cfg",))
def harris_keypoints_and_descriptors(
    img_bgr: jnp.ndarray, cfg: HarrisConfig = HarrisConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full Harris backend for one image.

    Returns ``(xy, descs, valid)``: (K, 2) int32 keypoints as (x, y), (K,
    128) float32 descriptors, (K,) validity.  Order is response-descending
    with border keypoints masked invalid in place (their relative order —
    which drives match/RANSAC tie-breaks — matches the reference's
    compacted list).
    """
    h, w = img_bgr.shape[:2]
    yy, xx, _, valid, (ix, iy) = harris_corners(img_bgr, cfg)
    mrg = cfg.border_margin
    valid = valid & (yy >= mrg) & (yy < h - mrg) & (xx >= mrg) & (xx < w - mrg)
    descs = harris_descriptors(yy, xx, ix, iy, cfg)
    xy = jnp.stack([xx, yy], axis=-1).astype(jnp.int32)
    return xy, descs, valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def harris_batch(
    batch_bgr: jnp.ndarray, cfg: HarrisConfig = HarrisConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """vmapped backend over an (N, H, W, 3) batch."""
    return jax.vmap(lambda im: harris_keypoints_and_descriptors(im, cfg))(batch_bgr)
