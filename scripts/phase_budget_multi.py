#!/usr/bin/env python
"""Per-dataset, per-phase warm budget for the all-4 pipelined run.

VERDICT r3 weak-item 3: ``all4_pipelined_s`` was one opaque number
(1.25 s driver / 1.39-1.61 session) with no breakdown.  This script
runs one untimed warmup (compiles all three dataset shapes) + N warm
``stitch_many`` runs over wind/out/parrington/grail and records, per
dataset and per run:

  load_done_s       when this dataset's decode+upload landed (rel. t0)
  dispatch_s        how long its async dispatch chain took to issue
  finalize_start_s  when its finalize (first sync) began
  bundle_pull_s     its first device sync (wait + bundle transfer)
  escalate_s        host strict re-decisions
  mosaic_pull_s     host compose fold (VFX_HOST_COMPOSE) or mosaic pull
  spec_patch        reused-prefix band count (-1 = full refold)
  finalize_compose  the dataset's whole finalize tail
  total             cumulative wall when this dataset finished

Writes docs/PHASE_BUDGET_MULTI_r04.json.
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
    "VFX_PHASE_OUT", os.path.join(REPO, "docs", "PHASE_BUDGET_MULTI_r04.json")
)
DATASETS = os.environ.get(
    "VFX_PHASE_DATASETS", "wind,out,parrington,grail"
).split(",")


def main() -> None:
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many

    folders = [os.path.join(DATA, d) for d in DATASETS]
    n_runs = int(os.environ.get("VFX_PHASE_RUNS", "5"))

    t0 = time.time()
    stitch_many(folders, backend="sift")  # warmup: compiles all shapes
    warmup_s = time.time() - t0

    runs = []
    for r in range(n_runs):
        t0 = time.time()
        results = stitch_many(folders, backend="sift")
        wall = time.time() - t0
        rec = {"wall_s": wall}
        for name, res in results.items():
            for k, v in res.timings.items():
                if isinstance(v, (int, float)):
                    rec[f"{name}.{k}"] = round(float(v), 4)
        runs.append(rec)
        print(f"[run {r}] wall={wall:.3f} " + " ".join(
            f"{n}={results[n].timings['finalize_compose']:.3f}"
            for n in results), flush=True)

    keys = sorted({k for r in runs for k in r})
    median = {
        k: round(statistics.median([r[k] for r in runs if k in r]), 4)
        for k in keys
    }
    out = {
        "datasets": DATASETS,
        "n_runs": n_runs,
        "warmup_compile_s": round(warmup_s, 2),
        "median": median,
        "runs": runs,
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": "per-dataset phases of one pipelined stitch_many run; "
                "finalize runs in input order, so a dataset's "
                "bundle_pull_s includes waiting for its own device work "
                "behind earlier datasets' syncs",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wall_s": median.get("wall_s"), "out": OUT}))


if __name__ == "__main__":
    main()
