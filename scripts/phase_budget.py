#!/usr/bin/env python
"""Warm end-to-end phase budget for the headline parrington SIFT stitch.

VERDICT r2 weak-item 1: ~0.9 s of the warm wall-clock sits OUTSIDE the
extractor and no artifact breaks it down.  This script runs one untimed
warmup (compile) + N warm runs and records the per-phase host-clock
medians (StitchResult.timings incl. the fine-grained detail phases) to
``docs/PHASE_BUDGET_r03.json``.

Phases (host clock; the first device sync absorbs all pending device
work, so ``bundle_pull_s`` = wait-for-(upload+extract+pair) + the
tunneled transfer of the shift bundle):

  load_project     JPEG decode + upload dispatch + projection dispatch
  bundle_pull_s    first sync: extract+pair device compute + the single
                   byte-packed result/escalation bundle pull
  esc_parse_s      host-side parse of the escalation regions
  escalate_s       host strict re-decisions (pure host; the inputs
                   already rode the bundle)
  plan_dispatch_s  drift + canvas plan + compose dispatch (host)
  mosaic_pull_s    bounds+mosaic device_get (compose wait + ~6 MB pull)
  crop             host crop slice
  total            end-to-end wall clock

Optionally set VFX_PROFILE_DIR to also capture an xplane trace of one
warm run (device-busy evidence, VERDICT item 6).
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("VFX_USE_PALLAS", "1")

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
OUT = os.environ.get(
    "VFX_PHASE_OUT", os.path.join(REPO, "docs", "PHASE_BUDGET_r03.json")
)


DATASET = os.environ.get("VFX_PHASE_DATASET", "parrington")
MARGINS = {"out": 30, "parrington": 15, "grail": 17, "wind": 24}


def main() -> None:
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = os.path.join(DATA, DATASET)
    margin = MARGINS.get(DATASET, 15)
    n_runs = int(os.environ.get("VFX_PHASE_RUNS", "5"))

    t0 = time.time()
    stitch_panorama(folder, backend="sift", crop_margin=margin)  # warmup
    warmup_s = time.time() - t0

    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        res = stitch_panorama(folder, backend="sift", crop_margin=margin)
        wall = time.time() - t0
        rec = dict(res.timings)
        rec["wall_s"] = wall
        runs.append(rec)

    profile_dir = os.environ.get("VFX_PROFILE_DIR")
    if profile_dir:
        from vfx_image_stitching_tpu.config import StitchConfig

        cfg = StitchConfig(backend="sift", profile_dir=profile_dir)
        stitch_panorama(folder, backend="sift", crop_margin=margin, cfg=cfg)

    keys = sorted({k for r in runs for k in r})
    median = {
        k: round(statistics.median([r[k] for r in runs if k in r]), 4)
        for k in keys
    }
    out = {
        "dataset": DATASET,
        "backend": "sift",
        "n_runs": n_runs,
        "warmup_compile_s": round(warmup_s, 2),
        "median": median,
        "runs": [{k: round(v, 4) for k, v in r.items()} for r in runs],
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": "host-clock phases; bundle_pull_s absorbs all pending "
                "device work (upload+extract+pair) plus the tunneled "
                "bundle transfer",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"phase_budget": median, "out": OUT}))


if __name__ == "__main__":
    main()
