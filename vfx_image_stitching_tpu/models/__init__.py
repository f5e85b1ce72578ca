"""Feature backends (the framework's "models"): Harris and SIFT.

Both backends emit the same interface the reference established implicitly
(SURVEY.md section 1): keypoint positions plus L2-comparable 128-d float32
descriptors, here as fixed-capacity masked arrays.
"""

from vfx_image_stitching_tpu.models.harris import (
    harris_corners,
    harris_keypoints_and_descriptors,
)

__all__ = [
    "harris_corners",
    "harris_keypoints_and_descriptors",
]
