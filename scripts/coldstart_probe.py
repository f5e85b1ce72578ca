#!/usr/bin/env python
"""Cold-start measurement: second-process compile cost with the
persistent cache (VERDICT r3 item 7).

Runs the headline parrington SIFT stitch in TWO fresh subprocesses
against the same (initially empty) cache dir and records each process's
first-call wall clock (compile + run) plus a warm run.  Process 1 pays
the remote compiles and populates the cache; process 2 must get cache
hits for every executable.

Writes docs/COLDSTART_r04.json.
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get(
    "VFX_COLD_OUT", os.path.join(REPO, "docs", "COLDSTART_r04.json")
)
CACHE = os.environ.get("VFX_COLD_CACHE", "/tmp/jax_cache_coldstart")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ["JAX_COMPILATION_CACHE_DIR"] = %(cache)r
os.environ.setdefault("VFX_USE_PALLAS", "1")
t_import0 = time.time()
from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama
t_import = time.time() - t_import0
folder = os.path.join(%(data)r, "parrington")
t0 = time.time()
res = stitch_panorama(folder, backend="sift", crop_margin=15)
first = time.time() - t0
t0 = time.time()
res = stitch_panorama(folder, backend="sift", crop_margin=15)
warm = time.time() - t0
print("CHILD_RESULT " + json.dumps({
    "import_s": round(t_import, 2),
    "first_call_s": round(first, 2),
    "warm_s": round(warm, 3),
    "shape": list(res.panorama.shape),
}))
"""


def run_child(data: str) -> dict:
    code = CHILD % {"repo": REPO, "cache": CACHE, "data": data}
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    wall = time.time() - t0
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            rec = json.loads(line[len("CHILD_RESULT "):])
            rec["process_wall_s"] = round(wall, 2)
            return rec
    raise RuntimeError(
        f"child failed rc={p.returncode}\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def main() -> None:
    data = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
    fresh = os.environ.get("VFX_COLD_KEEP", "0") != "1"
    if fresh and os.path.isdir(CACHE):
        shutil.rmtree(CACHE)

    rec1 = run_child(data)
    print("process 1 (cold, populates cache):", rec1, flush=True)
    n_entries = len(os.listdir(CACHE)) if os.path.isdir(CACHE) else 0
    cache_mb = (
        sum(
            os.path.getsize(os.path.join(CACHE, f))
            for f in os.listdir(CACHE)
        ) / 1e6 if os.path.isdir(CACHE) else 0.0
    )
    rec2 = run_child(data)
    print("process 2 (cache hits):", rec2, flush=True)

    out = {
        "cache_dir": CACHE,
        "cache_entries_after_p1": n_entries,
        "cache_mb": round(cache_mb, 1),
        "process1": rec1,
        "process2": rec2,
        "speedup_first_call": round(
            rec1["first_call_s"] / max(rec2["first_call_s"], 1e-9), 1
        ),
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": "root cause of rounds 1-3's 'remote compiles are not "
                "cached': sitecustomize imports jax before user code, "
                "so JAX_COMPILATION_CACHE_DIR set in scripts never "
                "reached jax config.  utils/cache.py now sets it via "
                "jax.config.update on package import.",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "p1_first_s": rec1["first_call_s"], "p2_first_s": rec2["first_call_s"],
        "out": OUT,
    }))


if __name__ == "__main__":
    main()
