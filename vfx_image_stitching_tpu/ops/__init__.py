"""Core dense image ops (jnp/lax), each matched to its cv2/NumPy oracle."""

from vfx_image_stitching_tpu.ops.color import bgr_to_gray_u8, bgr_to_gray_f32
from vfx_image_stitching_tpu.ops.gaussian import (
    cv2_auto_ksize,
    gaussian_kernel1d,
    gaussian_blur,
)
from vfx_image_stitching_tpu.ops.gradients import (
    conv2d_edge,
    reference_gradients,
    calc_orientation,
)
from vfx_image_stitching_tpu.ops.resize import (
    upsample2x_linear,
    downsample2x_nearest,
)

__all__ = [
    "bgr_to_gray_u8",
    "bgr_to_gray_f32",
    "cv2_auto_ksize",
    "gaussian_kernel1d",
    "gaussian_blur",
    "conv2d_edge",
    "reference_gradients",
    "calc_orientation",
    "upsample2x_linear",
    "downsample2x_nearest",
]
