"""Reference-named per-stage API (sift_impl.py public surface parity).

The reference exposes 14 stage functions that its UI drives individually
(sift_visualizeUI.py:104-115).  The pyramid stages live in
:mod:`vfx_image_stitching_tpu.models.sift.pyramid` under the same names;
this module adds the keypoint-stage entry points operating on the pyramid
lists, returning fixed-capacity :class:`Keypoints` sets.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig
from vfx_image_stitching_tpu.models.sift.pyramid import (
    generate_dog_images,
    gradient_fields,
)
from vfx_image_stitching_tpu.models.sift.extrema import (
    extract_candidates,
    extrema_threshold,
)
from vfx_image_stitching_tpu.models.sift.localize import (
    localize_candidates,
    compact_localized,
)
from vfx_image_stitching_tpu.models.sift.orientation import assign_orientations
from vfx_image_stitching_tpu.models.sift.descriptor import (
    compute_descriptors_chunked,
)
from vfx_image_stitching_tpu.models.sift.keypoints import (
    Keypoints,
    concatenate,
    compact,
    convert_keypoints_to_input_image_size,
    unpack_octave,
)

# reference-spelled alias (sift_impl.py:100 generate_DoG_images)
generate_DoG_images = generate_dog_images


def find_scale_space_extrema(
    gaussian_images: List[jnp.ndarray],
    dog_images: List[jnp.ndarray],
    num_intervals: int = 3,
    sigma: float = 1.6,
    border: int = 5,
    cfg: SiftConfig | None = None,
) -> Keypoints:
    """Extrema -> localization -> orientation over every octave.

    Same stage grouping as sift_impl.py:117-140 (which also folds
    localization and orientation into this function); returns the
    concatenated un-deduplicated keypoint set at base-image scale.
    """
    cfg = cfg or SiftConfig(
        num_intervals=num_intervals, sigma=sigma, image_border_width=border
    )
    caps = cfg.capacities
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)
    per_oct = []
    for o, dog in enumerate(dog_images):
        h_o, w_o = dog.shape[-2:]
        cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
        layer, y, x, valid = extract_candidates(dog, border, thresh, cand_cap)
        loc = localize_candidates(dog, layer, y, x, valid, o, cfg)
        loc = compact_localized(loc, min(caps.scaled_localized(o), cand_cap))
        mag, ang = gradient_fields(gaussian_images[o])
        per_oct.append(assign_orientations(mag, ang, loc, o, cfg))
    return concatenate(tuple(per_oct))


def generate_descriptors(
    keypoints: Keypoints,
    gaussian_images: List[jnp.ndarray],
    cfg: SiftConfig | None = None,
) -> jnp.ndarray:
    """(K, 128) descriptors for *converted* keypoints against the pyramid.

    Mirrors sift_impl.py:361-526; keypoints may span octaves — each
    octave's members are computed against its own gradient fields and
    merged back in place.
    """
    cfg = cfg or SiftConfig()
    octv, _layer, _scale = unpack_octave(keypoints.octave)
    desc = jnp.zeros((keypoints.capacity, 128), jnp.float32)
    for o, stack in enumerate(gaussian_images):
        sel = (octv + 1) == o
        sub = keypoints._replace(valid=keypoints.valid & sel)
        mag, ang = gradient_fields(stack)
        d = compute_descriptors_chunked(mag, ang, sub, o, cfg)
        desc = jnp.where(sel[:, None], d, desc)
    return desc


def is_pixel_an_extremum(
    prev_patch: jnp.ndarray, curr_patch: jnp.ndarray, next_patch: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """Single 3x3x3 test (sift_impl.py:143-163 parity), vectorizable."""
    val = curr_patch[..., 1, 1]
    cube_max = jnp.maximum(
        jnp.maximum(prev_patch.max((-1, -2)), next_patch.max((-1, -2))),
        curr_patch.max((-1, -2)),
    )
    cube_min = jnp.minimum(
        jnp.minimum(prev_patch.min((-1, -2)), next_patch.min((-1, -2))),
        curr_patch.min((-1, -2)),
    )
    pos = (val > threshold) & (val == cube_max)
    neg = (val < -threshold) & (val == cube_min)
    return pos | neg
