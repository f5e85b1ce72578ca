#!/usr/bin/env python
"""Measure the vmapped multi-pano worst-case-capacity penalty (VERDICT
r2 item 7).

``_multi_pano_full_step`` vmaps the per-pano step.  Historically the
extractor skipped all-filler capacity chunks with per-chunk
``lax.cond``s, which vmap rewrites into selects (both branches
execute) — measured 7.2x per pano here.  The live-bounded
``fori_loop`` restructure (models/sift/chunking.py) survives vmap as
a while with batch-max trip count; under the final r3 code the
captured penalty is **1.96x** (docs/MESH_COST_r03.json — was 4.0x
mid-restructure, 7.2x with cond-based skipping); the residual
penalty is the per-octave gradient-fields cond + extrema work.  This
script times, on the virtual 8-device CPU mesh with the dryrun-grade
small SIFT config:

  a) the single-pano full step, per pano (sequential loop over P panos);
  b) the vmapped multi-pano step over the same (P, N, H, W, 3) batch on
     the 2-D (pano, images) mesh.

Each mode runs in its OWN subprocess: on the virtual CPU mesh,
alternating executions of the unsharded and NamedSharding-committed
executables in one process trips an XLA "supplied 1 buffers but
expected 2" error (reproduced both orders; JAX backend quirk).

CPU-mesh numbers are a proxy for the *structural* select-vs-cond cost,
not chip performance — but that structural cost is exactly what the
vmap rewrite introduces.
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

P_PANOS, N_IMGS, H, W = 2, 4, 96, 72
REPS = 7


def measure(mode: str) -> float:
    import __graft_entry__ as ge

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
    host = rng.integers(0, 256, (P_PANOS, N_IMGS, H, W, 3), dtype=np.uint8)

    if mode == "single":
        ins = [jnp.asarray(host[i]) for i in range(P_PANOS)]

        def run():
            outs = [_full_shift_step(b, cfg) for b in ins]
            jax.block_until_ready(outs)
    else:
        mesh2 = make_mesh_2d(8)
        batch = jnp.asarray(host)
        step_mode = "shard_map" if mode == "shardmap" else "vmap"

        def run():
            out = sharded_multi_pano_full(batch, mesh2, cfg, mode=step_mode)
            jax.block_until_ready(out)

    run()  # compile
    times = []
    for _ in range(REPS):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return statistics.median(times)


def main() -> None:
    mode = os.environ.get("VFX_MESH_COST_MODE")
    if mode:
        print(json.dumps({"mode": mode, "median_s": measure(mode)}))
        return

    results = {}
    for mode in ("single", "multi", "shardmap"):
        env = dict(os.environ, VFX_MESH_COST_MODE=mode)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[mode] = json.loads(line)["median_s"]

    single_med, multi_med = results["single"], results["multi"]
    smap_med = results["shardmap"]
    print(json.dumps({
        "config": f"P={P_PANOS} panos x N={N_IMGS} imgs, {H}x{W}, "
                  "small-caps SIFT, 8-dev CPU mesh (2x4 pano,images)",
        "single_pano_step_total_s": round(single_med, 4),
        "single_per_pano_s": round(single_med / P_PANOS, 4),
        "vmapped_multi_pano_total_s": round(multi_med, 4),
        "vmapped_per_pano_s": round(multi_med / P_PANOS, 4),
        "penalty_ratio_vmapped_vs_single": round(multi_med / single_med, 2),
        "shardmap_multi_pano_total_s": round(smap_med, 4),
        "shardmap_per_pano_s": round(smap_med / P_PANOS, 4),
        "penalty_ratio_shardmap_vs_single": round(smap_med / single_med, 2),
        "note": "CPU-mesh proxy for the cond->select rewrite cost; the "
                "2-D mesh also shards panos so wall-clock can be lower "
                "even with the penalty; shardmap is the default "
                "sharded_multi_pano_full mode (manual pano axis, auto "
                "images axis, conds stay conds)",
    }, indent=1))


if __name__ == "__main__":
    main()
