#!/usr/bin/env python
"""Evidence for PARITY.md deviation 5: the author's `out` golden differs
from what the reference code *itself* produces in this environment.

Copies the out dataset to /tmp (the reference writes its result into the
input folder — never write into /root/reference), rewrites pano.txt with
local basenames (the shipped file carries the author's absolute Windows
paths, which the reference's ``folder + path`` join cannot resolve on
Linux), runs the unmodified reference interactively via stdin, then
compares:

  (a) reference-today output vs the author's golden  — expected:
      (511, 497) vs (511, 493), aligned RMSE ~14.76 at offset (0, 3);
  (b) our framework output vs reference-today        — expected:
      RMSE ~1.98 (JPEG noise), offset (0, 0).

Reference driver: /root/reference/image_stitching_harris.py:425-548.
"""
import os
import shutil
import subprocess
import sys

import numpy as np  # noqa: F401  (cv2 needs numpy loaded first on some builds)
import cv2

REFERENCE = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
DS = "/tmp/out_evidence_ds"


def main() -> None:
    if os.path.isdir(DS):
        shutil.rmtree(DS)
    shutil.copytree(os.path.join(REFERENCE, "out"), DS)
    pano = os.path.join(DS, "pano.txt")
    txt = open(pano).read()
    lines = []
    for line in txt.splitlines():
        if ".jpg" in line or ".png" in line:
            line = line.replace("\\", "/").rsplit("/", 1)[-1]
        lines.append(line)
    open(pano, "w").write("\n".join(lines) + "\n")

    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "image_stitching_harris.py")],
        input=f"{DS}\n{pano}\n30\n",
        capture_output=True, text=True, timeout=1800, cwd=REFERENCE,
    )
    out_path = os.path.join(DS, "panoroma_harris.jpg")
    if proc.returncode or not os.path.exists(out_path):
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        sys.exit(1)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama
    from vfx_image_stitching_tpu.utils.metrics import aligned_rmse

    ref_today = cv2.imread(out_path)
    golden = cv2.imread(
        os.path.join(REFERENCE, "Result", "harris_out_result.jpg")
    )
    print(f"reference-today: {ref_today.shape} | author golden: {golden.shape}")
    r1, o1 = aligned_rmse(ref_today, golden)
    print(f"(a) reference-today vs author golden: RMSE={r1:.3f} offset={o1}")

    ours = stitch_panorama(
        os.path.join(REFERENCE, "out"), backend="harris",
        crop_margin=30, save_path=None,
    ).panorama
    r2, o2 = aligned_rmse(ours, ref_today)
    print(f"(b) ours vs reference-today:          RMSE={r2:.3f} offset={o2}")


if __name__ == "__main__":
    main()
