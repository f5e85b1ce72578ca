"""Keypoint struct-of-arrays and set-level operations.

Replaces the reference's lists of ``cv2.KeyPoint`` (sift_impl.py:299-358)
with fixed-capacity masked arrays; the packed-octave encoding is kept
bit-compatible so ``unpack_octave`` round-trips with the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    """Fixed-capacity masked keypoint set (all fields shape (K,))."""

    x: jnp.ndarray          # f32 pt[0]
    y: jnp.ndarray          # f32 pt[1]
    size: jnp.ndarray       # f32
    angle: jnp.ndarray      # f32 degrees
    response: jnp.ndarray   # f32
    octave: jnp.ndarray     # i32 packed: octave + layer<<8 + offset_byte<<16
    valid: jnp.ndarray      # bool
    # Newton-fit cells (octave-local ints) — let the strict host path
    # (models/sift/strict.py) re-derive the keypoint in reference-exact
    # arithmetic; not part of the cv2.KeyPoint surface.  (ix, iy) is the
    # final (post-move) position cell; (jx, jy, jl) is the last-COMPUTE
    # cell, which differs for the reference's accepted-non-converged
    # quirk (sift_impl.py:175-195) where the accept tests and sub-pixel
    # update come from the pre-move cell.
    ix: jnp.ndarray         # i32 final column of the Newton fit
    iy: jnp.ndarray         # i32 final row of the Newton fit
    jx: jnp.ndarray         # i32 last-compute column
    jy: jnp.ndarray         # i32 last-compute row
    jl: jnp.ndarray         # i32 last-compute layer

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)


def concatenate(sets: Tuple[Keypoints, ...]) -> Keypoints:
    return Keypoints(*[jnp.concatenate(f, axis=-1) for f in zip(*sets)])


def take(kps: Keypoints, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> Keypoints:
    out = Keypoints(*[f[idx] for f in kps])
    return out._replace(valid=out.valid & idx_valid)


def unpack_octave(octave_packed: jnp.ndarray):
    """(octave, layer, scale) from the packed int (sift_impl.py:349-358).

    Sign-extends the low byte; ``scale = 2^-octave``.
    """
    octave = octave_packed & 255
    layer = (octave_packed >> 8) & 255
    octave = jnp.where(octave >= 128, octave | ~jnp.int32(255), octave)
    scale = jnp.exp2(-octave.astype(jnp.float32))
    return octave, layer, scale


def convert_keypoints_to_input_image_size(kps: Keypoints) -> Keypoints:
    """Halve pt/size, decrement packed octave (sift_impl.py:333-343)."""
    new_octave = (kps.octave & ~jnp.int32(255)) | ((kps.octave - 1) & 255)
    return kps._replace(
        x=kps.x * 0.5, y=kps.y * 0.5, size=kps.size * 0.5, octave=new_octave
    )


def sort_and_dedup(
    kps: Keypoints, descriptors: jnp.ndarray, out_capacity: int
) -> Tuple[Keypoints, jnp.ndarray]:
    """Canonical sort + duplicate removal + compaction.

    Reference semantics (sift_impl.py:299-327): sort by (x asc, y asc,
    size desc, angle asc, response desc, class_id) — class_id is -1 for
    every keypoint, and Python's sort is stable, so the final tiebreak is
    the original emission order; then drop any keypoint whose (pt, size,
    angle) equals its predecessor's.  Invalid slots sort to the end; the
    first ``out_capacity`` rows survive compaction.
    """
    big = jnp.float32(3.0e38)
    x = jnp.where(kps.valid, kps.x, big)
    y = jnp.where(kps.valid, kps.y, big)
    order_idx = jnp.arange(kps.capacity, dtype=jnp.int32)
    # lexsort: last key is primary
    order = jnp.lexsort(
        (order_idx, -kps.response, kps.angle, -kps.size, y, x)
    )
    s = Keypoints(*[f[order] for f in kps])
    desc_s = descriptors[order]

    same_as_prev = (
        (s.x == jnp.roll(s.x, 1))
        & (s.y == jnp.roll(s.y, 1))
        & (s.size == jnp.roll(s.size, 1))
        & (s.angle == jnp.roll(s.angle, 1))
    )
    same_as_prev = same_as_prev.at[0].set(False)
    keep = s.valid & ~same_as_prev

    # stable compaction: surviving rows first, original sorted order kept
    comp_rank = jnp.where(keep, jnp.arange(s.capacity, dtype=jnp.int32),
                          jnp.iinfo(jnp.int32).max)
    comp_order = jnp.argsort(comp_rank)[:out_capacity]
    out = Keypoints(*[f[comp_order] for f in s])
    out = out._replace(valid=keep[comp_order])
    return out, desc_s[comp_order]


def remove_duplicate_keypoints(
    kps: Keypoints, descriptors: jnp.ndarray, out_capacity: int | None = None
) -> Tuple[Keypoints, jnp.ndarray]:
    """Reference-named wrapper over :func:`sort_and_dedup`."""
    return sort_and_dedup(kps, descriptors, out_capacity or kps.capacity)


def compact(kps: Keypoints, out_capacity: int) -> Keypoints:
    """Keep valid rows (original order) in the first ``out_capacity`` slots."""
    rank = jnp.where(kps.valid, jnp.arange(kps.capacity, dtype=jnp.int32),
                     jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(rank)[:out_capacity]
    out = Keypoints(*[f[order] for f in kps])
    return out._replace(valid=kps.valid[order])
