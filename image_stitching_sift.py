#!/usr/bin/env python
"""Reference-compatible entry point + module surface: SIFT stitching.

Drop-in for the original script of the same name (stdin prompts for
folder / pano.txt / crop margin, output written as ``panoroma_sift.jpg``
into the input folder): both the interactive entry and every
module-level function the reference defines at import scope
(image_stitching_sift.py:12-247) are available under their original
names, backed by the TPU-native pipeline (NumPy in / NumPy out).
"""

from vfx_image_stitching_tpu.compat import (  # noqa: F401  (re-exports)
    read_pano_data,
    compute_shift_sift,
    ransac,
    cylindrical_projection,
    pad_image,
    blend_two_images,
    rectangle_crop,
)
from vfx_image_stitching_tpu.pipeline.cli import run_interactive


def run_panorama() -> None:
    """Interactive SIFT pipeline (image_stitching_sift.py:254-389)."""
    run_interactive("sift")


if __name__ == "__main__":
    run_panorama()
