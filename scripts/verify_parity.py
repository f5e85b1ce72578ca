#!/usr/bin/env python
"""Full parity report: every dataset x backend vs oracle shifts + goldens.

Run on a TPU host (CPU works too, slower).  Compares:
  * pairwise shifts / winning pairs against the reference-oracle fixtures
    (tests/data/oracle_sift_shifts.json, recorded from running the
    reference implementation in this environment);
  * final panoramas against the author's Result/*.jpg goldens via
    alignment-tolerant RMSE.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS
from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama
from vfx_image_stitching_tpu.utils.metrics import aligned_rmse

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
GOLDEN_NAME = {"out": "out", "wind": "wind", "parrington": "prtn", "grail": "grail"}

# Documented deviations (PARITY.md "Known deviations") where the author's
# golden JPEG is not reproducible even by the reference code in this
# environment (demonstrated by scripts/out_golden_evidence.py).  The
# round-1 parrington vote-tie entry is gone: the knife-edge strict
# escalation now reproduces the author's seam (RMSE ~2.4).
KNOWN_DEVIATIONS = {
    ("harris", "out"): "author-era OpenCV shifted content bounds by 4 px",
    ("sift", "out"): "author-era OpenCV shifted content bounds by 4 px",
}


def main() -> int:
    with open(os.path.join(REPO, "tests/data/oracle_sift_shifts.json")) as f:
        oracle = json.load(f)

    import cv2

    failures = 0
    for backend in ["harris", "sift"]:
        for ds in ["wind", "out", "parrington", "grail"]:
            folder = os.path.join(DATA, ds)
            margin = DEFAULT_CROP_MARGINS[ds]
            # first run pays XLA compiles (minutes on the remote-compile
            # TPU harness) — record it separately and report the WARM
            # second run as time_s so these numbers sit next to the
            # BENCH_r* medians without a units mismatch
            cold = stitch_panorama(folder, backend=backend,
                                   crop_margin=margin, save_path=None)
            res = stitch_panorama(folder, backend=backend, crop_margin=margin,
                                  save_path=None)
            report = {"backend": backend, "dataset": ds,
                      "time_s": round(res.timings["total"], 3),
                      "cold_compile_s": round(cold.timings["total"], 3),
                      "pano": list(res.panorama.shape)}

            if backend == "sift" and ds in oracle:
                exp = oracle[ds]["shifts"]
                match = sum(
                    1 for (a, b) in zip(res.shifts, exp)
                    if abs(a[0] - b[0]) < 0.5 and abs(a[1] - b[1]) < 0.5
                )
                report["shifts_match"] = f"{match}/{len(exp)}"
                if match < len(exp) - 1:
                    failures += 1

            g = cv2.imread(
                os.path.join(DATA, "Result",
                             f"{backend}_{GOLDEN_NAME[ds]}_result.jpg")
            )
            if g is not None:
                rmse, off = aligned_rmse(res.panorama, g)
                report["golden_rmse"] = round(rmse, 3)
                report["golden_offset"] = list(off)
                known = KNOWN_DEVIATIONS.get((backend, ds))
                if rmse > 10.0:
                    if known:
                        report["known_deviation"] = known
                        if rmse > 25.0:
                            failures += 1
                    else:
                        failures += 1
            print(json.dumps(report), flush=True)
    print(f"failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
