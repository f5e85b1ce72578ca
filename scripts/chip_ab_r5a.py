#!/usr/bin/env python
"""Round-5a on-chip A/B: VMEM-resident scalar-Newton localize vs plain.

The round-4 roofline pinned localize at 3.98 ms/img of pure serial
dispatch/gather latency (docs/ROOFLINE_r04.json) and DEVNOTES concluded
only a formulation with fewer, wider serial steps can move it.  The
resident Pallas kernel (pallas_kernels.localize_newton_resident) keeps
the whole DoG octave in VMEM and runs the full Newton loop per candidate
on the scalar core — probed -49% on the fused extract prefix
(docs/PROBE_LOCALIZE_RESIDENT_r04.json).  This script settles whether
that prefix win survives in the END-TO-END pipeline, with the repo's
interleaved-rounds discipline (tunnel weather makes before/after medians
unusable — VERDICT r4 item 8).

Configs:
  resident : VFX_LOCALIZE_RESIDENT=1
  plain    : VFX_LOCALIZE_RESIDENT=0

Every run oracle-checks the parrington shifts.  Writes
docs/CHIP_AB_R5A.json.  Reference semantics: sift_impl.py:169-211.
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
    "VFX_AB_OUT", os.path.join(REPO, "docs", "CHIP_AB_R5A.json")
)
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "6"))
_ENV_KEYS = ("VFX_LOCALIZE_RESIDENT",)

CONFIGS = {
    "resident": {"VFX_LOCALIZE_RESIDENT": "1"},
    "plain": {"VFX_LOCALIZE_RESIDENT": "0"},
}


def main() -> None:
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = os.path.join(DATA, "parrington")

    with open(os.path.join(REPO, "tests", "data",
                           "oracle_sift_shifts.json")) as f:
        oracle = json.load(f)["parrington"]["shifts"]

    def run(env):
        for k in _ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.time()
        res = stitch_panorama(folder, backend="sift", crop_margin=15)
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
    print(json.dumps({
        n: {"wall_s": s["wall_s"], "ok": s["shifts_ok_all"]}
        for n, s in summary.items()
    }))


if __name__ == "__main__":
    main()
