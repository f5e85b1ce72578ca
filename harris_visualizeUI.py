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
