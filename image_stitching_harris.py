#!/usr/bin/env python
"""Reference-compatible entry point: interactive Harris panorama stitching.

Same interaction contract as the original script of the same name,
backed by the TPU-native pipeline.
"""

from vfx_image_stitching_tpu.pipeline.cli import run_interactive

if __name__ == "__main__":
    run_interactive("harris")
