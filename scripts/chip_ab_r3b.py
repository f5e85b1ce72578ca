#!/usr/bin/env python
"""Round-3b on-chip A/B batch: bundle compaction, strip pulls, Pallas gather.

Tunnel throughput oscillates ~1.5x between sessions (docs/DEVNOTES.md),
so every comparison here runs INTERLEAVED inside one process: each round
executes every config once, and medians are compared per config.

Configs:
  base     compact bundle (default), 1-strip mosaic pull, XLA window gather
  strips4  + VFX_MOSAIC_STRIPS=4 (concurrent row-strip pulls)
  legacy   VFX_ESC_COMPACT=0 (full-shape escalation block; r3a behavior)
  pgather  + desc_pallas_gather=True (Pallas block-fetch window gather)
  best     pgather + strips4 (if both help; measured regardless)

Writes docs/CHIP_AB_R3B.json and asserts parrington shifts match the
oracle for every config.
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
OUT = os.path.join(REPO, "docs", "CHIP_AB_R3B.json")
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "5"))


def main() -> None:
    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = os.path.join(DATA, "parrington")
    base_cfg = StitchConfig(backend="sift")
    pg_cfg = dataclasses.replace(
        base_cfg,
        sift=dataclasses.replace(
            base_cfg.sift,
            capacities=dataclasses.replace(
                base_cfg.sift.capacities, desc_pallas_gather=True
            ),
        ),
    )

    configs = {
        "base": dict(cfg=base_cfg, env={}),
        "strips4": dict(cfg=base_cfg, env={"VFX_MOSAIC_STRIPS": "4"}),
        "legacy": dict(cfg=base_cfg, env={"VFX_ESC_COMPACT": "0"}),
        "pgather": dict(cfg=pg_cfg, env={}),
        "best": dict(cfg=pg_cfg, env={"VFX_MOSAIC_STRIPS": "4"}),
    }

    with open(os.path.join("tests", "data", "oracle_sift_shifts.json")) as f:
        oracle = json.load(f)["parrington"]["shifts"]

    def run(spec):
        for k in ("VFX_MOSAIC_STRIPS", "VFX_ESC_COMPACT"):
            os.environ.pop(k, None)
        os.environ.update(spec["env"])
        t0 = time.time()
        res = stitch_panorama(folder, backend="sift", crop_margin=15,
                              cfg=spec["cfg"])
        wall = time.time() - t0
        shifts = [[float(a), float(b)] for a, b in res.shifts]
        ok = all(
            abs(a - oa) < 1e-3 and abs(b - ob) < 1e-3
            for (a, b), (oa, ob) in zip(shifts, oracle)
        )
        rec = dict(res.timings)
        rec["wall_s"] = wall
        rec["shifts_ok"] = ok
        return rec

    # compile pass (untimed-ish; records compile walls for the record)
    compile_s = {}
    for name, spec in configs.items():
        t0 = time.time()
        rec = run(spec)
        compile_s[name] = round(time.time() - t0, 1)
        print(f"[compile] {name}: {compile_s[name]}s shifts_ok={rec['shifts_ok']}",
              flush=True)

    rounds = {name: [] for name in configs}
    for r in range(N_ROUNDS):
        for name, spec in configs.items():
            rec = run(spec)
            rounds[name].append(rec)
            print(f"[round {r}] {name}: wall={rec['wall_s']:.3f} "
                  f"bundle={rec.get('bundle_pull_s', 0):.3f} "
                  f"mosaic={rec.get('mosaic_pull_s', 0):.3f} "
                  f"esc={rec.get('escalate_s', 0):.3f} "
                  f"ok={rec['shifts_ok']}", flush=True)

    summary = {}
    for name, recs in rounds.items():
        keys = sorted({k for rec in recs for k in rec if k != "shifts_ok"})
        summary[name] = {
            k: round(statistics.median([rec[k] for rec in recs if k in rec]), 4)
            for k in keys
        }
        summary[name]["shifts_ok_all"] = all(r["shifts_ok"] for r in recs)
        summary[name]["compile_s"] = compile_s[name]

    profile_dir = os.environ.get("VFX_PROFILE_DIR")
    if profile_dir:
        import jax

        spec = configs[os.environ.get("VFX_PROFILE_CONFIG", "best")]
        for k in ("VFX_MOSAIC_STRIPS", "VFX_ESC_COMPACT"):
            os.environ.pop(k, None)
        os.environ.update(spec["env"])
        with jax.profiler.trace(profile_dir):
            stitch_panorama(folder, backend="sift", crop_margin=15,
                            cfg=spec["cfg"])
        print(f"trace written to {profile_dir}", flush=True)

    out = {
        "dataset": "parrington", "n_rounds": N_ROUNDS,
        "interleaved": True, "summary": summary,
        "runs": rounds,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: {k: v for k, v in s.items()
                          if k in ("wall_s", "bundle_pull_s",
                                   "mosaic_pull_s", "shifts_ok_all")}
                      for n, s in summary.items()}, indent=1))


if __name__ == "__main__":
    main()
