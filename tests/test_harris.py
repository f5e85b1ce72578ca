"""Harris backend parity vs the reference implementation run as oracle."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from vfx_image_stitching_tpu.models.harris import (
    harris_corners,
    harris_keypoints_and_descriptors,
    harris_batch,
)
from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    from tests.conftest import load_reference_module

    return load_reference_module("image_stitching_harris")


@pytest.fixture(scope="module")
def small_img(ref_mod):
    import cv2

    path = os.path.join(REFERENCE_DIR, "out", "out00.jpg")
    img = cv2.imread(path)
    # small crop keeps the reference's Python NMS/descriptor loops fast
    return np.ascontiguousarray(img[100:220, 80:240])


@requires_reference
@requires_cv2
def test_corners_match_reference(ref_mod, small_img):
    cands, ix, iy = ref_mod.HarrisCorner(small_img, max_points=200)
    yy, xx, resp, valid, (oix, oiy) = harris_corners(jnp.asarray(small_img))
    yy, xx, valid = map(np.asarray, (yy, xx, valid))
    ours = list(zip(yy[valid].tolist(), xx[valid].tolist()))
    theirs = [(int(y), int(x)) for (y, x, _r) in cands]
    assert ours == theirs
    np.testing.assert_allclose(np.asarray(oix), ix, atol=1e-3)


@requires_reference
@requires_cv2
def test_keypoints_and_descriptors_match_reference(ref_mod, small_img):
    kps, descs = ref_mod.compute_keypoints_and_descriptors_harris(small_img)
    xy, d, valid = map(
        np.asarray, harris_keypoints_and_descriptors(jnp.asarray(small_img))
    )
    ours_kps = [tuple(p) for p in xy[valid].tolist()]
    assert ours_kps == [tuple(map(int, k)) for k in kps]
    assert np.abs(d[valid] - descs).max() < 1e-5


@requires_reference
@requires_cv2
def test_full_pair_shift_matches_reference(ref_mod):
    import cv2

    a = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out00.jpg"))
    b = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out01.jpg"))
    a, b = a[::2, ::2].copy(), b[::2, ::2].copy()  # downscale for speed

    kps_a, desc_a = ref_mod.compute_keypoints_and_descriptors_harris(a)
    kps_b, desc_b = ref_mod.compute_keypoints_and_descriptors_harris(b)
    matches = ref_mod.simple_match(kps_a, desc_a, kps_b, desc_b, 1.0)
    ref_move, ref_pair = ref_mod.ransac(matches, 3)

    from vfx_image_stitching_tpu.pipeline.stitch import _pair_shift

    xy_a, d_a, v_a = harris_keypoints_and_descriptors(jnp.asarray(a))
    xy_b, d_b, v_b = harris_keypoints_and_descriptors(jnp.asarray(b))
    shift, pa, pb, anym, count = map(
        np.asarray,
        _pair_shift(xy_a, d_a, v_a, xy_b, d_b, v_b,
                    desc_thresh=1.0, ransac_thresh=3.0)[:5],
    )
    assert int(count) == len(matches)
    assert tuple(shift) == tuple(map(float, ref_move))
    assert (tuple(pa), tuple(pb)) == (
        tuple(map(float, ref_pair[0])),
        tuple(map(float, ref_pair[1])),
    )


def test_batch_matches_single():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (3, 64, 80, 3), dtype=np.uint8)
    bxy, bd, bv = map(np.asarray, harris_batch(jnp.asarray(batch)))
    for i in range(3):
        xy, d, v = map(
            np.asarray, harris_keypoints_and_descriptors(jnp.asarray(batch[i]))
        )
        np.testing.assert_array_equal(bv[i], v)
        np.testing.assert_array_equal(bxy[i][v], xy[v])
        np.testing.assert_allclose(bd[i][v], d[v], atol=1e-5)


def test_descriptors_unit_norm_and_clipped():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    xy, d, v = map(np.asarray, harris_keypoints_and_descriptors(jnp.asarray(img)))
    d = d[v]
    norms = np.linalg.norm(d, axis=1)
    assert np.all(np.abs(norms[norms > 0.5] - 1.0) < 1e-3)
    assert d.min() >= 0.0
    # clipped at 0.2 before the final renormalization, so no entry can
    # exceed 0.2 / 0.2 = 1, and typical entries stay well below
    assert d.max() <= 1.0 + 1e-5
