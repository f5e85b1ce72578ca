"""End-to-end stitching pipelines and CLI."""

from vfx_image_stitching_tpu.pipeline.stitch import (
    StitchResult,
    compute_pairwise_shifts,
    stitch_panorama,
)

__all__ = ["StitchResult", "compute_pairwise_shifts", "stitch_panorama"]
