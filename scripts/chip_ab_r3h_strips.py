#!/usr/bin/env python
"""Round-3h on-chip A/B: single vs 4-strip concurrent bundle pull.

The 4-strip concurrent pull won decisively for the ~6 MB mosaic
(docs/CHIP_AB_R3B.json) but was left gated OFF for the ~0.7 MB result
bundle pending an on-chip number.  If the bundle_pull phase is mostly
device-wait rather than transfer, strips should be neutral; if
transfer-bound, strips should shave tens of ms.

Every run oracle-checks the parrington shifts.  Interleaved rounds;
writes docs/CHIP_AB_R3H_STRIPS.json.
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
    "VFX_AB_OUT", os.path.join(REPO, "docs", "CHIP_AB_R3H_STRIPS.json")
)
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "5"))
_ENV_KEYS = ("VFX_BUNDLE_STRIPS",)

CONFIGS = {
    "strips1": {"VFX_BUNDLE_STRIPS": "1"},
    "strips4": {"VFX_BUNDLE_STRIPS": "4"},
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
                  f"load={rec.get('load_project', 0):.3f} "
                  f"feat={rec.get('features_ransac', 0):.3f} "
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
    print(json.dumps({n: {k: s[k] for k in ("wall_s", "load_project",
                                            "features_ransac")
                          if k in s}
                      for n, s in summary.items()}))


if __name__ == "__main__":
    main()
