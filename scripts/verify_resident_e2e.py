#!/usr/bin/env python
"""Chip-level check: the VMEM-resident localize kernel must not change a
single output pixel or shift on any dataset.

The kernel's scalar-core solve wobbles ux/uy/us by <=1 ulp vs the XLA
plain path (docs/PROBE_LOCALIZE_RESIDENT_r04.json) — integer fields and
valid masks are bit-identical, but a 1-ulp pt_x could in principle flip
a downstream rint at a knife edge.  This script settles it empirically
the way the repo settles every parity claim: run the FULL pipeline on
all four datasets with the knob off and on and byte-compare the final
mosaics (plus exact shift equality).  Writes docs/RESIDENT_E2E_r04.json.

Reference semantics: image_stitching_sift.py end-to-end.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS
from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
DATASETS = ["wind", "out", "parrington", "grail"]
OUT = os.environ.get(
    "VFX_RESIDENT_E2E_OUT",
    os.path.join(REPO, "docs", "RESIDENT_E2E_r05.json"),
)


def run_all(resident: bool):
    os.environ["VFX_LOCALIZE_RESIDENT"] = "1" if resident else "0"
    results = {}
    for ds in DATASETS:
        t0 = time.time()
        res = stitch_panorama(
            os.path.join(DATA, ds), backend="sift",
            crop_margin=DEFAULT_CROP_MARGINS[ds], save_path=None,
        )
        results[ds] = (res, round(time.time() - t0, 3))
    return results


def main() -> int:
    base = run_all(False)
    resident = run_all(True)
    report = {"datasets": {}, "recorded": time.strftime("%Y-%m-%d %H:%M")}
    ok = True
    for ds in DATASETS:
        b, tb = base[ds]
        r, tr = resident[ds]
        same_pano = (b.panorama.shape == r.panorama.shape
                     and np.array_equal(np.asarray(b.panorama),
                                        np.asarray(r.panorama)))
        same_shifts = np.array_equal(
            np.asarray(b.shifts, np.float64),
            np.asarray(r.shifts, np.float64))
        diff_px = 0
        if not same_pano and b.panorama.shape == r.panorama.shape:
            diff_px = int((np.asarray(b.panorama)
                           != np.asarray(r.panorama)).sum())
        report["datasets"][ds] = {
            "pano_equal": bool(same_pano),
            "shifts_equal": bool(same_shifts),
            "diff_px": diff_px,
            "shape": list(b.panorama.shape),
            "wall_plain_s": tb, "wall_resident_s": tr,
        }
        ok = ok and same_pano and same_shifts
        print(ds, report["datasets"][ds], flush=True)
    report["ok"] = ok
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ok": ok, "out": OUT}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
