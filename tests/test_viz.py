"""Headless visualization renderers (reference UI panel parity)."""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR


@requires_reference
@requires_cv2
def test_render_sift_report_panels(tmp_path):
    import cv2

    from vfx_image_stitching_tpu.viz import render_sift_report

    img = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out00.jpg"))
    crop = np.ascontiguousarray(img[150:278, 100:268])
    path = str(tmp_path / "crop.png")
    cv2.imwrite(path, crop)

    written = render_sift_report(path, str(tmp_path / "panels"))
    names = {os.path.basename(p) for p in written}
    assert {
        "1_base_image.png", "2_gaussian_pyramid.png", "3_dog_pyramid.png",
        "4_keypoints.png", "5_descriptor.png",
    } <= names
    for p in written:
        assert os.path.getsize(p) > 1000
