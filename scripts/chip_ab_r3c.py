#!/usr/bin/env python
"""Round-3c on-chip A/B: host-compose latency path vs the device tail.

Interleaved in one process (tunnel throughput oscillates ~1.5x between
sessions, docs/DEVNOTES.md).  Configs, all on top of the r3b best
(pgather Pallas window gather + 4-strip mosaic pull where applicable):

  best      r3b winner (device compose + strip mosaic pull)
  bstrips4  + VFX_BUNDLE_STRIPS=4 (concurrent result-bundle pull;
            bundle is only ~0.7 MB so expected ~neutral — measured to
            close the question)
  hostc     + VFX_HOST_COMPOSE=1 (NumPy fold, no mosaic transfer)
  hostgray  + VFX_HOST_COMPOSE=1 VFX_GRAY_FIRST=1 (gray-only uploads)

Every run oracle-checks the parrington shifts; one extra run compares
the host-compose mosaic to the device mosaic (accepted +-1 f32/FMA
tolerance, tests/test_compose.py).  Writes docs/CHIP_AB_R3C.json.
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
    "VFX_AB_OUT", os.path.join(REPO, "docs", "CHIP_AB_R3C.json")
)
N_ROUNDS = int(os.environ.get("VFX_AB_ROUNDS", "5"))
_ENV_KEYS = ("VFX_MOSAIC_STRIPS", "VFX_BUNDLE_STRIPS",
             "VFX_HOST_COMPOSE", "VFX_GRAY_FIRST")


def main() -> None:
    import numpy as np

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

    # every config pins VFX_HOST_COMPOSE/VFX_GRAY_FIRST explicitly so the
    # comparison is reproducible regardless of the pipeline's defaults
    # (this A/B is what flipped them to host compose + gray-first)
    configs = {
        "best": dict(env={"VFX_MOSAIC_STRIPS": "4",
                          "VFX_HOST_COMPOSE": "0", "VFX_GRAY_FIRST": "0"}),
        "bstrips4": dict(env={"VFX_MOSAIC_STRIPS": "4",
                              "VFX_BUNDLE_STRIPS": "4",
                              "VFX_HOST_COMPOSE": "0",
                              "VFX_GRAY_FIRST": "0"}),
        "hostc": dict(env={"VFX_HOST_COMPOSE": "1",
                           "VFX_GRAY_FIRST": "0"}),
        "hostgray": dict(env={"VFX_HOST_COMPOSE": "1",
                              "VFX_GRAY_FIRST": "1"}),
    }

    with open(os.path.join(REPO, "tests", "data",
                           "oracle_sift_shifts.json")) as f:
        oracle = json.load(f)["parrington"]["shifts"]

    def run(spec, want_result=False):
        for k in _ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(spec["env"])
        t0 = time.time()
        res = stitch_panorama(folder, backend="sift", crop_margin=15,
                              cfg=pg_cfg)
        wall = time.time() - t0
        shifts = [[float(a), float(b)] for a, b in res.shifts]
        ok = all(
            abs(a - oa) < 1e-3 and abs(b - ob) < 1e-3
            for (a, b), (oa, ob) in zip(shifts, oracle)
        )
        rec = {k: v for k, v in res.timings.items()
               if isinstance(v, (int, float))}
        rec["wall_s"] = wall
        rec["shifts_ok"] = ok
        return (rec, res) if want_result else rec

    compile_s = {}
    mosaics = {}
    for name, spec in configs.items():
        t0 = time.time()
        rec, res = run(spec, want_result=True)
        compile_s[name] = round(time.time() - t0, 1)
        mosaics[name] = res.mosaic
        print(f"[compile] {name}: {compile_s[name]}s "
              f"shifts_ok={rec['shifts_ok']}", flush=True)

    # one-time host-vs-device mosaic parity on chip (accepted tolerance)
    parity = {}
    dev = np.asarray(mosaics["best"], np.int32)
    for name in ("hostc", "hostgray"):
        hst = np.asarray(mosaics[name], np.int32)
        same_shape = dev.shape == hst.shape
        if same_shape:
            d = np.abs(hst - dev)
            parity[name] = {
                "shape_equal": True,
                "max_abs": int(d.max()),
                "frac_diff": float(
                    np.count_nonzero(d.any(-1)) / d[..., 0].size
                ),
            }
        else:
            parity[name] = {"shape_equal": False,
                            "dev": dev.shape, "host": hst.shape}
        print(f"[parity] {name}: {parity[name]}", flush=True)

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
            k: round(statistics.median(
                [rec[k] for rec in recs if k in rec]), 4)
            for k in keys
        }
        summary[name]["shifts_ok_all"] = all(r["shifts_ok"] for r in recs)
        summary[name]["compile_s"] = compile_s[name]

    out = {
        "dataset": "parrington", "n_rounds": N_ROUNDS,
        "interleaved": True, "summary": summary,
        "mosaic_parity_vs_best": parity,
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
