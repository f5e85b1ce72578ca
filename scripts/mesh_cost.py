#!/usr/bin/env python
"""Measure the vmapped multi-pano worst-case-capacity penalty (VERDICT
r2 item 7).

``_multi_pano_full_step`` vmaps the per-pano step, which rewrites the
extractor's chunk-skip ``lax.cond``s into selects — both branches
execute, so every pano pays worst-case capacity work
(parallel/mesh.py:129-136 documents this; nothing measured it).  This
script times, on the virtual 8-device CPU mesh with the dryrun-grade
small SIFT config:

  a) the single-pano full step, per pano (sequential loop over P panos);
  b) the vmapped multi-pano step over the same (P, N, H, W, 3) batch on
     the 2-D (pano, images) mesh.

and reports per-pano times + the penalty ratio.  CPU-mesh numbers are a
proxy for the *structural* select-vs-cond cost, not chip performance —
but that structural cost is exactly what the vmap rewrite introduces.
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as ge


def main() -> None:
    ge._force_cpu_mesh(8)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.parallel.mesh import (
        _full_shift_step,
        make_mesh_2d,
        sharded_multi_pano_full,
    )

    cfg = ge._small_sift_config()
    rng = np.random.default_rng(0)
    p, n = 2, 4
    batch = jnp.asarray(
        rng.integers(0, 256, (p, n, 96, 72, 3), dtype=np.uint8)
    )
    mesh2 = make_mesh_2d(8)

    def run_single():
        outs = [_full_shift_step(batch[i], cfg) for i in range(p)]
        jax.block_until_ready(outs)
        return outs

    def run_multi():
        out = sharded_multi_pano_full(batch, mesh2, cfg)
        jax.block_until_ready(out)
        return out

    run_single()  # compile
    run_multi()   # compile

    reps = 7
    singles, multis = [], []
    for _ in range(reps):
        t0 = time.time()
        run_single()
        singles.append(time.time() - t0)
        t0 = time.time()
        run_multi()
        multis.append(time.time() - t0)

    single_med = statistics.median(singles)
    multi_med = statistics.median(multis)
    out = {
        "config": f"P={p} panos x N={n} imgs, 96x72, small-caps SIFT, "
                  "8-dev CPU mesh (2x4 pano,images)",
        "single_pano_step_total_s": round(single_med, 4),
        "single_per_pano_s": round(single_med / p, 4),
        "vmapped_multi_pano_total_s": round(multi_med, 4),
        "vmapped_per_pano_s": round(multi_med / p, 4),
        "penalty_ratio_vmapped_vs_single": round(multi_med / single_med, 2),
        "note": "CPU-mesh proxy for the cond->select rewrite cost; the "
                "2-D mesh also shards panos so wall-clock can be lower "
                "even with the penalty",
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
