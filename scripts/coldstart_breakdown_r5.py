#!/usr/bin/env python
"""Cold-start phase breakdown (VERDICT r4 item 7).

docs/COLDSTART_r04.json established that a second process's 28.1 s
first call has ZERO persistent-cache misses — so the time is trace/
lower + cache deserialization + sub-threshold compiles + first data
flow, but nothing says which.  This probe runs the same second-process
configuration under cProfile and buckets cumulative time by subsystem:

  trace_lower_s  — jax tracing + jaxpr->StableHLO lowering
                   (partial_eval / mlir / core interpreters)
  cache_load_s   — persistent compilation cache read + executable
                   deserialization
  backend_compile_s — XLA client compile calls (cache hits still pay
                   deserialize inside; misses would balloon this)
  host_decode_s  — cv2 JPEG decode + host projection
  device_io_s    — transfers + block_until_ready waits
  other_s        — everything else (dispatch glue, numpy, ...)

Writes docs/COLDSTART_r05.json with the phase table, the import time,
and the uninstrumented first-call wall from a second child (cProfile
adds overhead, so the table is shares-of-instrumented-wall applied to
the clean wall).
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get(
    "VFX_COLD_OUT", os.path.join(REPO, "docs", "COLDSTART_r05.json")
)
CACHE = os.environ.get("VFX_COLD_CACHE", "/tmp/jax_cache_coldstart_r5")

CHILD = r"""
import cProfile, io, json, os, pstats, sys, time
sys.path.insert(0, %(repo)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = %(cache)r
os.environ.setdefault("VFX_USE_PALLAS", "1")
PROFILE = %(profile)r

t_import0 = time.time()
from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama
t_import = time.time() - t_import0
folder = os.path.join(%(data)r, "parrington")

if PROFILE:
    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    res = stitch_panorama(folder, backend="sift", crop_margin=15)
    prof.disable()
    first = time.time() - t0

    buckets = {
        "trace_lower_s": (
            "interpreters/partial_eval", "interpreters/mlir",
            "jax/_src/core", "interpreters/pxla", "jax/_src/lax",
            "jax/_src/numpy", "pallas/",
        ),
        "cache_load_s": (
            "compilation_cache", "cache_key", "lru_cache.py",
            "serialization",
        ),
        "backend_compile_s": ("compiler.py", "backend_compile"),
        "host_decode_s": ("vfx_image_stitching_tpu/io", "cv2"),
        "device_io_s": (
            "block_until_ready", "device_put", "copy_to_host",
            "array.py",
        ),
    }
    stats = pstats.Stats(prof)
    # tottime (self time) per entry, bucketed by filename/function match
    totals = {k: 0.0 for k in buckets}
    other = 0.0
    grand = 0.0
    for (fn, line, name), (cc, nc, tt, ct, callers) in stats.stats.items():
        grand += tt
        key = fn.replace("\\", "/") + "::" + name
        for b, pats in buckets.items():
            if any(p in key for p in pats):
                totals[b] += tt
                break
        else:
            other += tt
    totals["other_s"] = other
    totals = {k: round(v, 2) for k, v in totals.items()}
    # top 25 self-time entries for the curious
    top = sorted(stats.stats.items(), key=lambda kv: -kv[1][2])[:25]
    top_list = [
        {"fn": f"{os.path.basename(fn)}:{line}:{name}",
         "tottime_s": round(tt, 2), "calls": nc}
        for (fn, line, name), (cc, nc, tt, ct, _) in top
    ]
    print("CHILD_RESULT " + json.dumps({
        "import_s": round(t_import, 2),
        "first_call_instrumented_s": round(first, 2),
        "profile_total_s": round(grand, 2),
        "buckets": totals,
        "top": top_list,
        "shape": list(res.panorama.shape),
    }))
else:
    t0 = time.time()
    res = stitch_panorama(folder, backend="sift", crop_margin=15)
    first = time.time() - t0
    t0 = time.time()
    stitch_panorama(folder, backend="sift", crop_margin=15)
    warm = time.time() - t0
    print("CHILD_RESULT " + json.dumps({
        "import_s": round(t_import, 2),
        "first_call_s": round(first, 2),
        "warm_s": round(warm, 3),
        "shape": list(res.panorama.shape),
    }))
"""


def run_child(data: str, profile: bool) -> dict:
    code = CHILD % {"repo": REPO, "cache": CACHE, "data": data,
                    "profile": profile}
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child failed rc={p.returncode}\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def main() -> None:
    data = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
    if os.environ.get("VFX_COLD_KEEP", "0") != "1" and os.path.isdir(CACHE):
        shutil.rmtree(CACHE)

    t0 = time.time()
    warmcache = run_child(data, profile=False)  # populates the cache
    print("p1 (cold, populates):", warmcache, flush=True)
    clean = run_child(data, profile=False)      # clean second-process wall
    print("p2 (clean):", clean, flush=True)
    prof = run_child(data, profile=True)        # instrumented breakdown
    print("p3 (profiled):", json.dumps(prof["buckets"]), flush=True)

    out = {
        "cache_dir": CACHE,
        "p1_cold": warmcache,
        "p2_clean": clean,
        "p3_profiled": prof,
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_probe_s": round(time.time() - t0, 1),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"p2_first_s": clean["first_call_s"],
                      "buckets": prof["buckets"], "out": OUT}))


if __name__ == "__main__":
    main()
