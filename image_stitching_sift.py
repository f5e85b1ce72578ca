#!/usr/bin/env python
"""Reference-compatible entry point: interactive SIFT panorama stitching.

Same interaction contract as the original script of the same name
(stdin prompts for folder / pano.txt / crop margin, output written as
``panoroma_sift.jpg`` into the input folder), backed by the TPU-native
pipeline.
"""

from vfx_image_stitching_tpu.pipeline.cli import run_interactive

if __name__ == "__main__":
    run_interactive("sift")
