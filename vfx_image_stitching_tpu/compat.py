"""Reference-named compatibility API (drop-in function surface).

Every public function of ``image_stitching_harris.py`` /
``image_stitching_sift.py`` under its original name and signature, backed
by the TPU pipeline, with NumPy in / NumPy out.  A reference user can
import these 1:1:

    from vfx_image_stitching_tpu.compat import (
        read_pano_data, cylindrical_projection, pad_image,
        compute_shift_harris, compute_shift_sift, simple_match, ransac,
        blend_two_images, rectangle_crop,
        compute_keypoints_and_descriptors_harris,
    )

(The SIFT module surface lives in ``vfx_image_stitching_tpu.models.sift``
under the ``sift_impl`` names.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from vfx_image_stitching_tpu.io import read_pano_data  # noqa: F401  (re-export)
from vfx_image_stitching_tpu.compose.crop import rectangle_crop  # noqa: F401
from vfx_image_stitching_tpu.geometry.cylindrical import (
    cylindrical_project,
)
from vfx_image_stitching_tpu.compose.blend import _blend_pair
from vfx_image_stitching_tpu.geometry.canvas import place_on_canvas
from vfx_image_stitching_tpu.estimate.ransac import translation_ransac
from vfx_image_stitching_tpu.match.nn import match_descriptors
from vfx_image_stitching_tpu.models.harris import (
    harris_keypoints_and_descriptors,
)
from vfx_image_stitching_tpu.ops.gradients import (
    conv2d_edge,
    calc_orientation as _calc_orientation_device,
)


def conv2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Edge-padded 2-D convolution, float64 accumulate
    (image_stitching_harris.py:49-61)."""
    return np.asarray(
        conv2d_edge(jnp.asarray(np.asarray(img)), np.asarray(kernel)),
        np.float64,
    )


def calc_orientation(Ix: np.ndarray, Iy: np.ndarray):
    """Gradient magnitude + angle in [0, 360)
    (image_stitching_harris.py:63-70)."""
    m, theta = _calc_orientation_device(jnp.asarray(Ix), jnp.asarray(Iy))
    return np.asarray(m), np.asarray(theta)


def HarrisCorner(
    img_bgr: np.ndarray,
    max_points: int = 200,
    k: float = 0.05,
    block_size: int = 21,
    gauss_sigma: float = 2.0,
    thresh_ratio: float = 0.02,
):
    """Reference-signature Harris detector (image_stitching_harris.py:135-185).

    Returns ``(corner_candidates, Ix, Iy)`` with candidates as a
    response-descending list of ``(y, x, R)`` tuples, exactly as the
    reference's Python-loop implementation produces them.
    """
    from vfx_image_stitching_tpu.config import HarrisConfig
    from vfx_image_stitching_tpu.models.harris import harris_corners

    cfg = HarrisConfig(
        max_points=int(max_points), k=float(k), block_size=int(block_size),
        gauss_sigma=float(gauss_sigma), thresh_ratio=float(thresh_ratio),
    )
    yy, xx, resp, valid, (ix, iy) = harris_corners(jnp.asarray(img_bgr), cfg)
    yy, xx, resp, valid = map(np.asarray, (yy, xx, resp, valid))
    cands = [
        (int(y), int(x), float(r))
        for y, x, r, v in zip(yy, xx, resp, valid) if v
    ]
    return cands, np.asarray(ix, np.float64), np.asarray(iy, np.float64)


def gen_descriptor(
    fpx: int, fpy: int, m: np.ndarray, theta: np.ndarray
) -> np.ndarray:
    """128-d descriptor for one keypoint at row ``fpx``, col ``fpy`` over
    precomputed magnitude/angle fields (image_stitching_harris.py:72-133)."""
    from vfx_image_stitching_tpu.models.harris import (
        harris_descriptors_from_fields,
    )

    desc = harris_descriptors_from_fields(
        jnp.asarray([int(fpx)], jnp.int32),
        jnp.asarray([int(fpy)], jnp.int32),
        jnp.asarray(m, jnp.float32),
        jnp.asarray(theta, jnp.float32),
    )
    return np.asarray(desc[0], np.float32)


def cylindrical_projection(img_bgr: np.ndarray, focal_len: float) -> np.ndarray:
    """Forward-rounded cylindrical projection (image_stitching_harris.py:290)."""
    return np.asarray(cylindrical_project(jnp.asarray(img_bgr), float(focal_len)))


def pad_image(img_bgr: np.ndarray, move_x: float, move_y: float) -> np.ndarray:
    """Translate-by-zero-pad (image_stitching_harris.py:311-325)."""
    mx = int(np.round(move_x))
    my = int(np.round(move_y))
    top, bottom = (my, 0) if my >= 0 else (0, -my)
    left, right = (mx, 0) if mx >= 0 else (0, -mx)
    return np.pad(np.asarray(img_bgr), ((top, bottom), (left, right), (0, 0)),
                  "constant")


def compute_keypoints_and_descriptors_harris(
    img_bgr: np.ndarray, max_points: int = 200
) -> Tuple[List[Tuple[int, int]], np.ndarray]:
    """Harris keypoints + 128-d descriptors (image_stitching_harris.py:187)."""
    from vfx_image_stitching_tpu.config import HarrisConfig

    xy, desc, valid = map(
        np.asarray,
        harris_keypoints_and_descriptors(
            jnp.asarray(img_bgr), HarrisConfig(max_points=max_points)
        ),
    )
    v = valid.astype(bool)
    kps = [tuple(int(c) for c in p) for p in xy[v]]
    return kps, desc[v].astype(np.float32)


def simple_match(
    kps_a: Sequence, desc_a: np.ndarray, kps_b: Sequence, desc_b: np.ndarray,
    desc_thresh: float = 1.0,
) -> List[tuple]:
    """First-min NN matching under an absolute squared-L2 threshold
    (image_stitching_harris.py:219-240)."""
    desc_a = np.asarray(desc_a, np.float32)
    desc_b = np.asarray(desc_b, np.float32)
    if len(desc_a) == 0 or len(desc_b) == 0:
        return []
    best, matched = map(
        np.asarray,
        match_descriptors(
            jnp.asarray(desc_a), jnp.ones(len(desc_a), bool),
            jnp.asarray(desc_b), jnp.ones(len(desc_b), bool),
            float(desc_thresh),
        ),
    )
    return [
        (tuple(kps_a[i]) if not hasattr(kps_a[i], "pt") else kps_a[i].pt,
         tuple(kps_b[best[i]]) if not hasattr(kps_b[best[i]], "pt")
         else kps_b[best[i]].pt)
        for i in range(len(desc_a)) if matched[i]
    ]


def ransac(matches: Sequence[tuple], dist_sq_thresh: float = 3):
    """Exhaustive translation voting (image_stitching_harris.py:242-271)."""
    if len(matches) == 0:
        return (0, 0), None
    moves = np.array(
        [[a[0] - b[0], a[1] - b[1]] for a, b in matches], np.float32
    )
    idx, _votes, any_valid = map(
        np.asarray,
        translation_ransac(
            jnp.asarray(moves), jnp.ones(len(matches), bool),
            float(dist_sq_thresh),
        ),
    )
    i = int(idx)
    return (moves[i][0].item(), moves[i][1].item()), matches[i]


def _compute_shift(imgs, feature_fn, ransac_thr, desc_thresh):
    kps_a, desc_a = feature_fn(imgs[0])
    kps_b, desc_b = feature_fn(imgs[1])
    matches = simple_match(kps_a, desc_a, kps_b, desc_b, desc_thresh)
    return ransac(matches, dist_sq_thresh=ransac_thr)


def compute_shift_harris(
    img_a: np.ndarray, img_b: np.ndarray,
    ransac_thr: float = 3, desc_thresh: float = 1.0,
):
    """(best_move, best_pair) via Harris (image_stitching_harris.py:273)."""
    return _compute_shift(
        (img_a, img_b), compute_keypoints_and_descriptors_harris,
        ransac_thr, desc_thresh,
    )


def compute_shift_sift(
    img_a: np.ndarray, img_b: np.ndarray,
    ransac_thr: float = 3, desc_thresh: float = 25000,
):
    """(best_move, best_pair) via SIFT (image_stitching_sift.py:52-83)."""
    from vfx_image_stitching_tpu.models.sift import (
        compute_keypoints_and_descriptors,
    )

    def feats(img):
        records, desc = compute_keypoints_and_descriptors(img)
        return [r.pt for r in records], desc

    return _compute_shift((img_a, img_b), feats, ransac_thr, desc_thresh)


def blend_two_images(
    shift_vec: Tuple[float, float],
    ref_match: Optional[tuple],
    img_a: np.ndarray,
    img_b: np.ndarray,
) -> np.ndarray:
    """Counter-alpha column blend of two images
    (image_stitching_harris.py:327-376), device-backed.

    Unlike the pipeline's planned compositor this accepts arbitrary
    (possibly different-shaped) inputs, exactly like the reference
    function.
    """
    dx, dy = shift_vec
    if dx < 0:
        dx, dy = -dx, -dy
        ref_match = (ref_match[1], ref_match[0])
        img_a, img_b = img_b, img_a

    pad_a_x = img_b.shape[1] - img_a.shape[1] + ref_match[0][0] - ref_match[1][0]
    pad_b_x = ref_match[0][0] - ref_match[1][0]
    overlap_range = ref_match[1][0] - ref_match[0][0] + img_a.shape[1]

    amx, amy = int(np.round(-pad_a_x)), int(np.round(-dy))
    bmx, bmy = int(np.round(pad_b_x)), int(np.round(dy))
    hh = max(img_a.shape[0] + abs(amy), img_b.shape[0] + abs(bmy))
    ww = max(img_a.shape[1] + abs(amx), img_b.shape[1] + abs(bmx))

    canvas_a = place_on_canvas(
        jnp.asarray(img_a, jnp.uint8), hh, ww, max(amy, 0), max(amx, 0)
    )
    canvas_b = place_on_canvas(
        jnp.asarray(img_b, jnp.uint8), hh, ww, max(bmy, 0), max(bmx, 0)
    )
    out = _blend_pair(canvas_a, canvas_b, jnp.float32(overlap_range))
    return np.asarray(out)
