#!/usr/bin/env python
"""Round-4a on-chip A/B: snapshot/patch speculative compose vs off.

Round 3 left speculative compose dead on parrington (its pair-13 knife
edge flips every run, so full speculation always missed and the
escalate -> fold -> bounds tail ran serial, ~0.07 s of the 0.49 s
wall).  Round 4 makes speculation resumable: the fold snapshots before
the first band a material pair can touch, and after a changed
escalation the final plan's matching prefix (up to the uniform frame
translation) is reused — only the suffix bands refold
(compose/host.py plan_patch_point / translate_prefix /
resume_compose_host).

Configs:
  patch : VFX_SPEC_COMPOSE=1 (new snapshot/patch path)
  off   : VFX_SPEC_COMPOSE=0 (serial escalate -> full fold)

Every run oracle-checks the parrington shifts and records
detail["spec_patch"] (the reused-prefix length; -1 = full refold).
Interleaved rounds; writes docs/CHIP_AB_R4A.json.
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
    "VFX_AB_OUT", os.path.join(REPO, "docs", "CHIP_AB_R4A.json")
)
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "6"))
_ENV_KEYS = ("VFX_SPEC_COMPOSE",)

CONFIGS = {
    "patch": {"VFX_SPEC_COMPOSE": "1"},
    "off": {"VFX_SPEC_COMPOSE": "0"},
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
              f"shifts_ok={rec['shifts_ok']} "
              f"spec_patch={rec.get('spec_patch')}", flush=True)

    rounds = {name: [] for name in CONFIGS}
    for r in range(N_ROUNDS):
        for name, env in CONFIGS.items():
            rec = run(env)
            rounds[name].append(rec)
            print(f"[round {r}] {name}: wall={rec['wall_s']:.3f} "
                  f"esc={rec.get('escalate_s', 0):.3f} "
                  f"fold={rec.get('mosaic_pull_s', 0):.3f} "
                  f"patch={rec.get('spec_patch')} "
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
    print(json.dumps({n: {k: s[k] for k in (
        "wall_s", "escalate_s", "mosaic_pull_s", "spec_patch")
        if k in s}
        for n, s in summary.items()}))


if __name__ == "__main__":
    main()
