"""Reference-named compat API vs oracles."""

import numpy as np
import pytest

from tests import oracles
from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR


def test_pad_image_matches_oracle():
    from vfx_image_stitching_tpu.compat import pad_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    for mx, my in [(3, 2), (-4, 1), (0, -5), (2.6, -1.5)]:
        np.testing.assert_array_equal(
            pad_image(img, mx, my), oracles.pad_image(img, mx, my)
        )


def test_blend_two_images_matches_oracle():
    from vfx_image_stitching_tpu.compat import blend_two_images

    rng = np.random.default_rng(1)
    a = rng.integers(10, 256, (20, 32, 3), dtype=np.uint8)
    b = rng.integers(10, 256, (24, 30, 3), dtype=np.uint8)  # different shapes
    pair = ((20, 5), (4, 6))
    for shift in [(16, 2.0), (-16, -2.0)]:
        ours = blend_two_images(shift, pair, a, b)
        oracle = oracles.blend_two_images(shift, pair, a, b)
        assert ours.shape == oracle.shape
        d = ours.astype(int) - oracle.astype(int)
        assert np.abs(d).max() <= 1


def test_simple_match_and_ransac_roundtrip():
    from vfx_image_stitching_tpu.compat import simple_match, ransac

    rng = np.random.default_rng(2)
    desc = rng.random((30, 128)).astype(np.float32)
    kps_a = [(i, i + 1) for i in range(30)]
    kps_b = [(i + 7, i + 4) for i in range(30)]
    matches = simple_match(kps_a, desc, kps_b, desc + 0.001, desc_thresh=0.5)
    oracle = oracles.nn_match(kps_a, desc, kps_b, desc + 0.001, 0.5)
    assert matches == oracle
    move, pair = ransac(matches, 3)
    omove, opair = oracles.vote_ransac(matches, 3)
    assert (move, pair) == (omove, opair)
    assert ransac([], 3) == ((0, 0), None)


@requires_reference
@requires_cv2
def test_compute_shift_harris_matches_reference_values():
    import cv2

    from vfx_image_stitching_tpu.compat import (
        cylindrical_projection,
        compute_shift_harris,
    )
    from vfx_image_stitching_tpu.io import read_pano_data, resolve_image_path
    import os

    folder = os.path.join(REFERENCE_DIR, "out")
    paths, focals = read_pano_data(os.path.join(folder, "pano.txt"))
    imgs = [cv2.imread(resolve_image_path(p, folder)) for p in paths]
    cyls = [cylindrical_projection(im, f) for im, f in zip(imgs, focals)]
    move, pair = compute_shift_harris(cyls[0], cyls[1])
    assert (round(move[0]), round(move[1])) == (-97, 4)
    assert tuple(map(float, pair[0])) == (152.0, 55.0)
