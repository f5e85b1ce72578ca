#!/usr/bin/env python
"""Reference-compatible entry point: Harris corner + matching demo window.

Same launch contract as the original script of the same name
(harris_visualizeUI.py:328-336: a PyQt5 window with Load A / Load B
dialogs and a "Harris Detection + Matching" button), backed by the
TPU-native Harris stack.  Without PyQt5 (or a display) it renders the
side-by-side corner/match figure headlessly for two images given on the
command line.
"""

import os
import sys

# Module-level surface of the reference script under the original names:
# its own copies of the Harris stack (harris_visualizeUI.py:15-168) map to
# the shared backend, and the Qt/draw helpers (:174-221) to the viz module.
from vfx_image_stitching_tpu.compat import (  # noqa: F401  (re-exports)
    conv2d,
    HarrisCorner,
    calc_orientation,
    gen_descriptor,
    compute_keypoints_and_descriptors_harris,
    simple_match,
)
from vfx_image_stitching_tpu.viz.harris_demo import (  # noqa: F401
    convertCV2Qt,
    draw_harris_corners_on_image,
    draw_matches_side_by_side,
    HarrisDemoWindow,
)


def main() -> None:
    from vfx_image_stitching_tpu.viz.harris_demo import (
        HarrisDemoWindow,
        render_harris_demo,
    )

    if HarrisDemoWindow is not None and os.environ.get("DISPLAY"):
        from PyQt5.QtWidgets import QApplication

        app = QApplication(sys.argv)
        window = HarrisDemoWindow()
        window.show()
        sys.exit(app.exec_())
    if len(sys.argv) >= 3:
        out = os.environ.get("VFX_VIZ_OUT", "harris_demo.png")
        render_harris_demo(sys.argv[1], sys.argv[2], out)
        print("PyQt5/display unavailable; wrote", out)
    else:
        ref = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
        a = os.path.join(ref, "out", "out00.jpg")
        b = os.path.join(ref, "out", "out01.jpg")
        if os.path.exists(a) and os.path.exists(b):
            out = os.environ.get("VFX_VIZ_OUT", "harris_demo.png")
            render_harris_demo(a, b, out)
            print("PyQt5/display unavailable; wrote", out)
        else:
            print("usage: harris_visualizeUI.py <imageA> <imageB>")


if __name__ == "__main__":
    main()
