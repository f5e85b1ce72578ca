"""Multi-panorama throughput: stitch several datasets in one run.

BASELINE config "Batched multi-panorama throughput (wind/out/parrington/
grail in one run)".  Unlike a sequential loop of ``stitch_panorama``
calls (which synchronizes per phase), this pipeline keeps the device
queue full across datasets:

  1. every dataset's JPEG decode runs in parallel threads, each image
     ``device_put`` as soon as it decodes (uploads hide behind decodes);
  2. cylindrical projection, feature extraction and the pair step are
     *dispatched* for every dataset before any result is pulled — JAX
     dispatch is asynchronous, so dataset B's features run on device
     while the host finalizes dataset A; same-shape datasets
     (parrington/grail: both 18x384x512) share compiled executables;
  3. per dataset, in order: pull the pair results (the only sync),
     escalate knife edges, plan the canvas on host, dispatch compose;
  4. mosaics are pulled once, cropped, and returned.

For multi-chip scale-out the same shift stage runs under the 2-D
(pano, images) mesh (parallel/mesh.py: sharded_multi_pano_shifts);
this module is the single-chip throughput path.

Benchmarked by scripts/bench_multi.py (pipelined vs sequential).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS, StitchConfig
from vfx_image_stitching_tpu.pipeline.stitch import (
    StitchResult,
    _resolve_cfg,
    dispatch_pair_step,
    extract_features,
    finalize_pairwise_shifts,
)


def stitch_many(
    folders: Sequence[str],
    backend: str = "sift",
    margins: Optional[Dict[str, int]] = None,
    cfg: Optional[StitchConfig] = None,
    verbose: bool = False,
) -> Dict[str, StitchResult]:
    """Stitch every dataset folder in one pipelined run.

    Margins default to the author's per-dataset golden margins
    (README.md:52-54 of the reference).  Returns per-folder results in
    input order.
    """
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.compose import (
        compose_mosaic,
        plan_compose,
        rectangle_crop,
    )
    from vfx_image_stitching_tpu.estimate import correct_drift
    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.io import load_dataset_device

    cfg = _resolve_cfg(backend, cfg)
    margins = margins or {}
    t0 = time.time()

    names = [os.path.basename(os.path.normpath(f)) for f in folders]

    # phase 1: decode + upload every dataset concurrently
    with cf.ThreadPoolExecutor(max_workers=max(1, len(folders))) as pool:
        loads = [
            pool.submit(load_dataset_device, f, with_host=True)
            for f in folders
        ]
        loaded = [f.result() for f in loads]

    # phase 2: dispatch projection + features + pair step for all datasets
    staged = []
    for (batch, valid, focals, shape, host_imgs) in loaded:
        cyl = cylindrical_project_batch(batch, tuple(focals))
        feats = extract_features(cyl, cfg)
        xy, descs, valid_kp, meta, stats = feats
        pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
        staged.append((cyl, valid, shape, feats, pair_out, host_imgs, focals))

    # phase 3+4: finalize each dataset in order (first pull syncs that
    # dataset only; later datasets keep computing behind it)
    results: Dict[str, StitchResult] = {}
    for name, (cyl, valid, (h, w, _c), feats, pair_out, host_imgs, focals) in (
        zip(names, staged)
    ):
        td0 = time.time()
        xy, descs, valid_kp, meta, stats = feats
        shifts, pairs, counts = finalize_pairwise_shifts(
            cyl, xy, valid_kp, meta, stats, pair_out, list(valid), cfg,
            host_images=host_imgs, focals=focals,
        )
        n = cyl.shape[0]
        corrected = correct_drift(shifts, n_images=n)
        plan = plan_compose(h, w, n, list(valid), corrected, pairs)
        mosaic_d = compose_mosaic(cyl, plan)
        from vfx_image_stitching_tpu.compose.crop import _content_bounds

        bounds, mosaic = jax.device_get((
            _content_bounds(mosaic_d, jnp.uint8(cfg.black_threshold)),
            mosaic_d,
        ))
        margin = margins.get(name, DEFAULT_CROP_MARGINS.get(name, 15))
        panorama = rectangle_crop(
            mosaic, cfg.black_threshold, margin, bounds=bounds
        )
        td1 = time.time()
        results[name] = StitchResult(
            panorama=panorama,
            mosaic=mosaic,
            shifts=shifts,
            corrected_shifts=corrected,
            pairs=pairs,
            timings={"finalize_compose": td1 - td0, "total": td1 - t0},
        )
        if verbose:
            print(f"{name}: {panorama.shape} in {td1 - td0:.2f} s "
                  f"(cumulative {td1 - t0:.2f} s)")

    if verbose:
        print(f"stitched {len(folders)} panoramas in {time.time() - t0:.2f} s")
    return results
