"""Forward-rounded cylindrical projection.

The reference projects with a per-pixel Python loop (hot loop #3,
image_stitching_harris.py:290-309): for every source pixel,

    x' = round(f * atan((x-cx)/f)) + cx
    y' = round(f * (y-cy) / sqrt((x-cx)^2 + f^2)) + cy

scattering source -> dest, dropping out-of-bounds, leaving unmapped pixels
black, with *last-writer-wins in row-major source order* on collisions
(near the left/right edges several source columns compress onto one output
column).

TPU-native design: the mapping depends only on (h, w, focal), so the
*index map* (winning source pixel per output pixel, or -1) is precomputed
once per focal on the host in float64 — bit-identical to the reference's
Python-float math including banker's rounding — and the per-image work on
device is a single flat gather, batched over the whole dataset.  A pure
device-side variant would save ~ms of host work but risks f32 rounding
flips at .5 boundaries; parity wins.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def cylindrical_index_map(h: int, w: int, focal: float) -> np.ndarray:
    """(h*w,) int32: winning flat source index per output pixel, -1 if none."""
    f = float(focal)
    yy, xx = np.mgrid[0:h, 0:w]
    cx = w // 2
    cy = h // 2
    x_dist = (xx - cx).astype(np.float64)
    y_dist = (yy - cy).astype(np.float64)
    # np.round == Python round on float64 (banker's / half-to-even).
    x_mapped = np.round(f * np.arctan(x_dist / f)).astype(np.int64) + cx
    denom = np.sqrt(x_dist**2 + f * f)
    y_mapped = np.round(f * (y_dist / denom)).astype(np.int64) + cy
    valid = (x_mapped >= 0) & (x_mapped < w) & (y_mapped >= 0) & (y_mapped < h)

    dest = (y_mapped * w + x_mapped).ravel()
    src = np.arange(h * w, dtype=np.int64)
    ok = valid.ravel()
    winner = np.full(h * w, -1, dtype=np.int64)
    # Fancy assignment applies indices in order -> the last (row-major
    # largest) source index wins, matching the reference's loop order.
    winner[dest[ok]] = src[ok]
    return winner.astype(np.int32)


def cylindrical_project(img_bgr: jnp.ndarray, focal: float) -> jnp.ndarray:
    """Project one (H, W, 3) uint8 image; unmapped pixels are black."""
    h, w = img_bgr.shape[:2]
    winner = jnp.asarray(cylindrical_index_map(h, w, focal))
    return _gather_project(img_bgr, winner)


@jax.jit
def _gather_project(img_bgr: jnp.ndarray, winner: jnp.ndarray) -> jnp.ndarray:
    h, w = img_bgr.shape[:2]
    flat = img_bgr.reshape(h * w, -1)
    picked = flat[jnp.clip(winner, 0, h * w - 1)]
    out = jnp.where((winner >= 0)[:, None], picked, 0)
    return out.reshape(img_bgr.shape)


def cylindrical_project_host(img_bgr: np.ndarray, focal: float) -> np.ndarray:
    """Host (NumPy) projection, bit-identical to the device gather.

    Shares ``cylindrical_index_map`` with the device path, so a uint8
    gather gives the same bytes.  Used by the knife-edge escalation
    (models/sift/strict.py) to rebuild a cylindrical image from the
    already-decoded source instead of pulling it off the device — on
    high-RTT links the pull costs more than the gather.
    """
    h, w = img_bgr.shape[:2]
    winner = cylindrical_index_map(h, w, focal)
    flat = img_bgr.reshape(h * w, -1)
    picked = flat[np.clip(winner, 0, h * w - 1)]
    out = np.where((winner >= 0)[:, None], picked, 0).astype(img_bgr.dtype)
    return out.reshape(img_bgr.shape)


_HOST_PROJ_CACHE: dict = {}
_HOST_PROJ_CACHE_MAX = 64
_HOST_PROJ_LOCK = __import__("threading").Lock()


def cylindrical_project_host_cached(
    img_bgr: np.ndarray, focal: float
) -> np.ndarray:
    """Content-addressed :func:`cylindrical_project_host`.

    Repeated pipeline runs over the same dataset (warm benchmarks, the
    multi-pano loop) escalate the same pairs; caching by source-image
    content + focal skips the ~10 ms/image host gather on every rerun.

    Thread-safe: the host-compose path calls this from a projection
    thread pool concurrently with the escalation path, so cache reads/
    evictions are locked (an unsynchronized two-thread eviction of the
    same first key raises KeyError).  The projection itself runs outside
    the lock — a same-key race at worst computes the gather twice.
    """
    import hashlib

    hsh = hashlib.blake2b(digest_size=16)
    hsh.update(np.ascontiguousarray(img_bgr).tobytes())
    hsh.update(str(img_bgr.shape).encode())
    key = (hsh.digest(), float(focal))
    with _HOST_PROJ_LOCK:
        hit = _HOST_PROJ_CACHE.get(key)
    if hit is None:
        hit = cylindrical_project_host(img_bgr, focal)
        with _HOST_PROJ_LOCK:
            while len(_HOST_PROJ_CACHE) >= _HOST_PROJ_CACHE_MAX:
                _HOST_PROJ_CACHE.pop(next(iter(_HOST_PROJ_CACHE)))
            _HOST_PROJ_CACHE[key] = hit
    return hit


@functools.lru_cache(maxsize=64)
def _device_winner_stack(h: int, w: int, focals: Tuple[float, ...]):
    """Device-resident stacked index maps, cached per (shape, focals).

    The maps are ~14 MB for an 18-image dataset; re-uploading them every
    call would dominate the load phase on slow host-device links.
    """
    winners = np.stack([cylindrical_index_map(h, w, f) for f in focals])
    return jnp.asarray(winners)


def cylindrical_project_batch(
    batch_bgr: jnp.ndarray, focals: Tuple[float, ...]
) -> jnp.ndarray:
    """Project a (N, H, W, 3) uint8 batch with per-image focals on device."""
    n, h, w = batch_bgr.shape[:3]
    return _gather_project_batch(batch_bgr, _device_winner_stack(h, w, tuple(focals)))


@jax.jit
def _gather_project_batch(batch: jnp.ndarray, winners: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(_gather_project)(batch, winners)
