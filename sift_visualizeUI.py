#!/usr/bin/env python
"""Reference-compatible entry point: SIFT stage visualizer window.

Same launch contract as the original script of the same name
(sift_visualizeUI.py:313-318: a PyQt5 window showing the six stage tabs
for ``out/out00.jpg``, matching against ``out/out01.jpg``), backed by
the TPU-native stage pipeline.  Without PyQt5 (or a display) it falls
back to the headless renderer and writes the six panels as PNGs.
"""

import os
import sys

DEFAULT_IMAGE = os.environ.get(
    "VFX_VIZ_IMAGE",
    os.path.join(
        os.environ.get("VFX_REFERENCE_DIR", "/root/reference"),
        "out", "out00.jpg",
    ),
)
DEFAULT_MATCH = os.environ.get(
    "VFX_VIZ_MATCH", os.path.join(os.path.dirname(DEFAULT_IMAGE), "out01.jpg")
)

# Module-level helper surface of the reference script
# (sift_visualizeUI.py:21-86, :91) under the original names.
from vfx_image_stitching_tpu.viz.sift_visualizer import (  # noqa: E402,F401
    cvimg_to_qpixmap,
    draw_feature_points_return_disp,
    SIFTVisualizer,
)


def main() -> None:
    image = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_IMAGE
    match = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_MATCH
    from vfx_image_stitching_tpu.viz.sift_visualizer import (
        SIFTVisualizer,
        render_sift_report,
    )

    if SIFTVisualizer is not None and os.environ.get("DISPLAY"):
        from PyQt5.QtWidgets import QApplication

        app = QApplication(sys.argv)
        window = SIFTVisualizer(image, sigma=1.6, assumed_blur=0.5,
                                match_path=match)
        window.show()
        sys.exit(app.exec_())
    out_dir = os.environ.get("VFX_VIZ_OUT", "sift_viz_panels")
    panels = render_sift_report(image, out_dir, match)
    print("PyQt5/display unavailable; wrote headless panels:")
    for p in panels:
        print(" ", p)


if __name__ == "__main__":
    main()
