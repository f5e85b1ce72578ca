#!/usr/bin/env python
"""Reference-compatible entry point + module surface: Harris stitching.

Drop-in for the original script of the same name: both the interactive
entry (``python image_stitching_harris.py``) and every module-level
function the reference defines at import scope
(image_stitching_harris.py:10-420) are available under their original
names, backed by the TPU-native pipeline (NumPy in / NumPy out).
"""

from vfx_image_stitching_tpu.compat import (  # noqa: F401  (re-exports)
    read_pano_data,
    conv2d,
    calc_orientation,
    gen_descriptor,
    HarrisCorner,
    compute_keypoints_and_descriptors_harris,
    simple_match,
    ransac,
    compute_shift_harris,
    cylindrical_projection,
    pad_image,
    blend_two_images,
    rectangle_crop,
)
from vfx_image_stitching_tpu.pipeline.cli import run_interactive


def run_panorama() -> None:
    """Interactive Harris pipeline (image_stitching_harris.py:425-548)."""
    run_interactive("harris")


if __name__ == "__main__":
    run_panorama()
