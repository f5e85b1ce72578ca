#!/usr/bin/env python
"""Reference-compatible module shim: ``import sift_impl`` at the repo root.

The reference ships its SIFT implementation as a root-level module
(``sift_impl.py``) whose orchestrator and 14 public sub-stage functions
are imported directly by user code and by the visualizer
(sift_visualizeUI.py:104-115).  This shim re-exports the TPU-native
equivalents (vfx_image_stitching_tpu/models/sift/, reference-named
wrappers in models/sift/stages.py) under the same module name so a
reference user's ``import sift_impl`` / ``from sift_impl import
generate_base_image`` keeps working unchanged.
"""

from vfx_image_stitching_tpu.models.sift import (  # noqa: F401
    compare_keypoints,
    compute_keypoints_and_descriptors,
    compute_keypoints_with_orientations,
    compute_number_of_octaves,
    convert_keypoints_to_input_image_size,
    find_scale_space_extrema,
    generate_base_image,
    generate_descriptors,
    generate_DoG_images,
    generate_gaussian_images,
    generate_gaussian_kernels,
    is_pixel_an_extremum,
    localize_extremum_via_quadratic_fit,
    remove_duplicate_keypoints,
    unpack_octave,
)

__all__ = [
    "compare_keypoints",
    "compute_keypoints_and_descriptors",
    "compute_keypoints_with_orientations",
    "compute_number_of_octaves",
    "convert_keypoints_to_input_image_size",
    "find_scale_space_extrema",
    "generate_base_image",
    "generate_descriptors",
    "generate_DoG_images",
    "generate_gaussian_images",
    "generate_gaussian_kernels",
    "is_pixel_an_extremum",
    "localize_extremum_via_quadratic_fit",
    "remove_duplicate_keypoints",
    "unpack_octave",
]
