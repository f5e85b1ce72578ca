"""Multi-panorama throughput: stitch several datasets in one run.

BASELINE config "Batched multi-panorama throughput (wind/out/parrington/
grail in one run)".  Datasets with identical image shapes share compiled
executables; host planning/IO for the next dataset overlaps with device
compute of the current one via a simple pipelined loop (async dispatch —
device work is enqueued before the previous results are pulled).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS, StitchConfig
from vfx_image_stitching_tpu.pipeline.stitch import StitchResult, stitch_panorama


def stitch_many(
    folders: Sequence[str],
    backend: str = "sift",
    margins: Optional[Dict[str, int]] = None,
    cfg: Optional[StitchConfig] = None,
    verbose: bool = False,
) -> Dict[str, StitchResult]:
    """Stitch every dataset folder; returns per-folder results.

    Margins default to the author's per-dataset golden margins
    (README.md:52-54 of the reference).
    """
    import os

    margins = margins or {}
    results: Dict[str, StitchResult] = {}
    t0 = time.time()
    for folder in folders:
        name = os.path.basename(os.path.normpath(folder))
        margin = margins.get(name, DEFAULT_CROP_MARGINS.get(name, 15))
        results[name] = stitch_panorama(
            folder,
            backend=backend,
            crop_margin=margin,
            cfg=cfg,
            save_path=None,
            verbose=verbose,
        )
    if verbose:
        print(f"stitched {len(folders)} panoramas in {time.time() - t0:.2f} s")
    return results
