"""From-scratch SIFT backend, TPU-native.

Re-designs the reference ``sift_impl.py`` (526 LoC of per-pixel Python
loops — the dominant cost of the reference at ~95% of its runtime) as a
fixed-shape batched device program:

  * Gaussian/DoG pyramids as per-octave (…, 6, H_o, W_o) stacks built from
    separable cv2-parity blurs (sift_impl.py:45-111);
  * scale-space extrema as a 3x3x3 reduce-window comparison + fixed-
    capacity row-major candidate extraction (sift_impl.py:117-163);
  * subpixel localization as a batched masked 5-iteration Newton loop
    (sift_impl.py:169-211), including the reference's quirk that a
    non-converged candidate is still accepted with its last state;
  * orientation histograms and the 128-d trilinear descriptor as one-hot
    GEMMs over gathered sample windows — MXU work instead of scatter loops
    (sift_impl.py:246-293, :361-526).

The per-stage API mirrors sift_impl's public surface (the reference UI
calls each stage separately, sift_visualizeUI.py:104-115).
"""

from vfx_image_stitching_tpu.models.sift.pyramid import (
    generate_base_image,
    compute_number_of_octaves,
    generate_gaussian_kernels,
    generate_gaussian_images,
    generate_dog_images,
)
from vfx_image_stitching_tpu.models.sift.keypoints import (
    Keypoints,
    unpack_octave,
    convert_keypoints_to_input_image_size,
    remove_duplicate_keypoints,
)
from vfx_image_stitching_tpu.models.sift.extract import (
    sift_batch_with_stats,
    compute_keypoints_and_descriptors,
    sift_extract,
    sift_batch,
)
from vfx_image_stitching_tpu.models.sift.stages import (
    generate_DoG_images,
    find_scale_space_extrema,
    generate_descriptors,
    is_pixel_an_extremum,
    localize_extremum_via_quadratic_fit,
    compute_keypoints_with_orientations,
    compare_keypoints,
)

__all__ = [
    "generate_base_image",
    "compute_number_of_octaves",
    "generate_gaussian_kernels",
    "generate_gaussian_images",
    "generate_dog_images",
    "Keypoints",
    "unpack_octave",
    "convert_keypoints_to_input_image_size",
    "remove_duplicate_keypoints",
    "compute_keypoints_and_descriptors",
    "sift_extract",
    "sift_batch",
    "generate_DoG_images",
    "find_scale_space_extrema",
    "generate_descriptors",
    "is_pixel_an_extremum",
    "localize_extremum_via_quadratic_fit",
    "compute_keypoints_with_orientations",
    "compare_keypoints",
    "sift_batch_with_stats",
]
