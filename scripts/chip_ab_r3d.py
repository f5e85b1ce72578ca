#!/usr/bin/env python
"""Round-3d on-chip A/B: extractor batching mode under the r3 shape.

Round 2 refuted vmap-18 (3.4 s vs 2.25) and grouped vmap (1.16/1.32 vs
0.96) — but that predates the live-bounded chunk loops
(models/sift/chunking.py), the Pallas window gather, and the fused
descriptor build, all of which change what vmap must rewrite
(cond->select is gone from the chunk loops; the remaining vmap cost is
the per-octave gradient-fields cond and batch-max trip counts).  The
extractor is now 0.39 s of the 0.45 s device busy time
(docs/UTILIZATION_r03c.json), so re-measuring is the cheapest shot at
the sub-0.5 s extractor stretch goal (VERDICT r2 item 8).

Configs (all on the r3c winner defaults: host compose + gray-first +
Pallas gather + desc_chunk 64):

  map6    lax.map within each of 3 load groups of 6   (current default)
  vmap6   vmap within each load group of 6
  map18   one lax.map over all 18 (VFX_LOAD_GROUP=18)
  vmap18  one vmap over all 18

Every run oracle-checks the parrington shifts.  Interleaved rounds;
writes docs/CHIP_AB_R3D.json.
"""

import dataclasses
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
    "VFX_AB_OUT", os.path.join(REPO, "docs", "CHIP_AB_R3D.json")
)
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "5"))
_ENV_KEYS = ("VFX_SIFT_BATCH_MODE", "VFX_LOAD_GROUP")

CONFIGS = {
    "map6": {"VFX_SIFT_BATCH_MODE": "map", "VFX_LOAD_GROUP": "6"},
    "vmap6": {"VFX_SIFT_BATCH_MODE": "vmap", "VFX_LOAD_GROUP": "6"},
    "map18": {"VFX_SIFT_BATCH_MODE": "map", "VFX_LOAD_GROUP": "18"},
    "vmap18": {"VFX_SIFT_BATCH_MODE": "vmap", "VFX_LOAD_GROUP": "18"},
}


def main() -> None:
    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = os.path.join(DATA, "parrington")
    base_cfg = StitchConfig(backend="sift")
    cfg = dataclasses.replace(
        base_cfg,
        sift=dataclasses.replace(
            base_cfg.sift,
            capacities=dataclasses.replace(
                base_cfg.sift.capacities, desc_pallas_gather=True
            ),
        ),
    )

    with open(os.path.join(REPO, "tests", "data",
                           "oracle_sift_shifts.json")) as f:
        oracle = json.load(f)["parrington"]["shifts"]

    def run(env):
        for k in _ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.time()
        res = stitch_panorama(folder, backend="sift", crop_margin=15,
                              cfg=cfg)
        wall = time.time() - t0
        ok = all(
            abs(a - oa) < 1e-3 and abs(b - ob) < 1e-3
            for (a, b), (oa, ob) in zip(
                [[float(x), float(y)] for x, y in res.shifts], oracle)
        )
        rec = {k: v for k, v in res.timings.items()
               if isinstance(v, (int, float))}
        rec["wall_s"] = wall
        rec["shifts_ok"] = ok
        return rec

    compile_s = {}
    for name, env in CONFIGS.items():
        t0 = time.time()
        rec = run(env)
        compile_s[name] = round(time.time() - t0, 1)
        print(f"[compile] {name}: {compile_s[name]}s "
              f"shifts_ok={rec['shifts_ok']}", flush=True)

    rounds = {name: [] for name in CONFIGS}
    for r in range(N_ROUNDS):
        for name, env in CONFIGS.items():
            rec = run(env)
            rounds[name].append(rec)
            print(f"[round {r}] {name}: wall={rec['wall_s']:.3f} "
                  f"bundle={rec.get('bundle_pull_s', 0):.3f} "
                  f"ok={rec['shifts_ok']}", flush=True)

    summary = {}
    for name, recs in rounds.items():
        keys = sorted({k for rec in recs for k in rec if k != "shifts_ok"})
        summary[name] = {
            k: round(statistics.median(
                [rec[k] for rec in recs if k in rec]), 4)
            for k in keys
        }
        summary[name]["shifts_ok_all"] = all(r["shifts_ok"] for r in recs)
        summary[name]["compile_s"] = compile_s[name]

    with open(OUT, "w") as f:
        json.dump({
            "dataset": "parrington", "n_rounds": N_ROUNDS,
            "interleaved": True, "summary": summary, "runs": rounds,
        }, f, indent=1)
    print(json.dumps({n: {k: s[k] for k in ("wall_s", "bundle_pull_s")
                          if k in s}
                      for n, s in summary.items()}))


if __name__ == "__main__":
    main()
