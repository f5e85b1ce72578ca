#!/usr/bin/env python
"""Chip-level check: stitch_many output is byte-identical per dataset to
stitch_panorama run standalone (the pipelined staging/prefetch path must
not change a single pixel).  Run on the TPU host; writes a one-line JSON
verdict.  Reference semantics: image_stitching_sift.py end-to-end.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS
from vfx_image_stitching_tpu.pipeline.multi import stitch_many
from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
DATASETS = ["wind", "out", "parrington", "grail"]


def main() -> int:
    folders = [os.path.join(DATA, d) for d in DATASETS]
    singles = {}
    for ds, folder in zip(DATASETS, folders):
        res = stitch_panorama(folder, backend="sift",
                              crop_margin=DEFAULT_CROP_MARGINS[ds],
                              save_path=None)
        singles[ds] = res
    t0 = time.time()
    multi = stitch_many(folders, backend="sift")
    wall = time.time() - t0
    report = {"wall_s": round(wall, 4), "datasets": {}}
    ok = True
    for ds in DATASETS:
        s, m = singles[ds], multi[ds]
        same_pano = (s.panorama.shape == m.panorama.shape
                     and np.array_equal(np.asarray(s.panorama),
                                        np.asarray(m.panorama)))
        same_shifts = np.allclose(np.asarray(s.shifts, np.float64),
                                  np.asarray(m.shifts, np.float64))
        report["datasets"][ds] = {
            "pano_equal": bool(same_pano),
            "shifts_equal": bool(same_shifts),
            "shape": list(s.panorama.shape),
        }
        ok = ok and same_pano and same_shifts
    report["ok"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
