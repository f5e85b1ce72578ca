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


def localize_extremum_via_quadratic_fit(
    x: int,
    y: int,
    layer: int,
    octave: int,
    num_intervals: int,
    dog_octave,
    sigma: float = 1.6,
    contrast_threshold: float = 0.04,
    border: int = 5,
    eigen_ratio: float = 10.0,
    max_iter: int = 5,
):
    """Per-point reference entry (sift_impl.py:169-211 signature parity).

    Delegates to the batched masked-Newton :func:`localize_candidates`
    with a single candidate.  Returns ``(KeyPointRecord, localized_layer)``
    or ``None`` when the candidate is rejected (out-of-bounds step,
    contrast, or edge response) — the reference's contract.
    """
    import numpy as np

    from vfx_image_stitching_tpu.models.sift.extract import KeyPointRecord

    cfg = SiftConfig(
        sigma=sigma,
        num_intervals=num_intervals,
        contrast_threshold=contrast_threshold,
        image_border_width=border,
        eigen_ratio=float(eigen_ratio),
        max_localize_iters=max_iter,
    )
    dog = jnp.asarray(dog_octave, jnp.float32)
    loc = localize_candidates(
        dog,
        jnp.asarray([layer], jnp.int32),
        jnp.asarray([y], jnp.int32),
        jnp.asarray([x], jnp.int32),
        jnp.asarray([True]),
        octave,
        cfg,
    )
    if not bool(np.asarray(loc.valid)[0]):
        return None
    kp = KeyPointRecord(
        pt=(float(loc.pt_x[0]), float(loc.pt_y[0])),
        size=float(loc.size[0]),
        angle=-1.0,
        response=float(loc.response[0]),
        octave=int(loc.octave_packed[0]),
    )
    return kp, int(loc.layer[0])


def compute_keypoints_with_orientations(
    keypoint,
    octave: int,
    gauss_img: jnp.ndarray,
    radius_factor: float = 3.0,
    num_bins: int = 36,
    peak_ratio: float = 0.8,
    scale_factor: float = 1.5,
):
    """Per-point orientation assignment (sift_impl.py:246-293 parity).

    ``keypoint`` carries cv2.KeyPoint-compatible fields (``pt``, ``size``,
    ``response``, ``octave``); ``gauss_img`` is the single (H, W) Gaussian
    image the keypoint was localized in.  Returns the (possibly several)
    oriented :class:`~...extract.KeyPointRecord`\\ s, peak bins ascending.
    """
    import numpy as np

    from vfx_image_stitching_tpu.models.sift.extract import KeyPointRecord
    from vfx_image_stitching_tpu.models.sift.localize import Localized

    cfg = SiftConfig(
        radius_factor=radius_factor,
        num_bins=num_bins,
        peak_ratio=peak_ratio,
        scale_factor=scale_factor,
    )
    one_i32 = jnp.zeros((1,), jnp.int32)
    loc = Localized(
        x=one_i32,
        y=one_i32,
        layer=one_i32,  # index into the 1-layer stack below
        pt_x=jnp.asarray([keypoint.pt[0]], jnp.float32),
        pt_y=jnp.asarray([keypoint.pt[1]], jnp.float32),
        size=jnp.asarray([keypoint.size], jnp.float32),
        response=jnp.asarray([keypoint.response], jnp.float32),
        octave_packed=jnp.asarray([keypoint.octave], jnp.int32),
        valid=jnp.asarray([True]),
        jx=one_i32, jy=one_i32, jl=one_i32,
    )
    mag, ang = gradient_fields(jnp.asarray(gauss_img, jnp.float32)[None])
    kps = assign_orientations(mag, ang, loc, octave, cfg)
    xs = np.asarray(kps.x)
    ys = np.asarray(kps.y)
    sizes = np.asarray(kps.size)
    angles = np.asarray(kps.angle)
    resp = np.asarray(kps.response)
    octs = np.asarray(kps.octave)
    return [
        KeyPointRecord(
            pt=(float(xs[i]), float(ys[i])),
            size=float(sizes[i]),
            angle=float(angles[i]),
            response=float(resp[i]),
            octave=int(octs[i]),
        )
        for i in np.nonzero(np.asarray(kps.valid))[0]
    ]


def compare_keypoints(kp1, kp2) -> float:
    """6-key keypoint comparator (sift_impl.py:299-311 semantics).

    Orders by x, y, size (desc), angle, response (desc), class_id (desc);
    the device-side analogue is the lexsort key in
    :func:`~vfx_image_stitching_tpu.models.sift.keypoints.sort_and_dedup`.
    """
    if kp1.pt[0] != kp2.pt[0]:
        return kp1.pt[0] - kp2.pt[0]
    if kp1.pt[1] != kp2.pt[1]:
        return kp1.pt[1] - kp2.pt[1]
    if kp1.size != kp2.size:
        return kp2.size - kp1.size
    if kp1.angle != kp2.angle:
        return kp1.angle - kp2.angle
    if kp1.response != kp2.response:
        return kp2.response - kp1.response
    return getattr(kp2, "class_id", -1) - getattr(kp1, "class_id", -1)


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
