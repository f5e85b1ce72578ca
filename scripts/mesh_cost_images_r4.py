#!/usr/bin/env python
"""1-D images-mesh cost at REALISTIC shape (VERDICT r3 item 6).

Round 3 root-caused the 2-D mesh penalty to images-axis GSPMD at tiny
96x72 shards but never measured the 1-D images mesh — the only layout
that accelerates ONE panorama — at the real 18 x 384x512 shape.  This
script times the pipeline-grade ``_full_shift_step`` (full default SIFT
config, real parrington images) two ways on a virtual 6-device CPU mesh
(18 images / 6 devices = 3 per shard, no padding):

  single : whole batch on one device
  images : batch sharded over the 1-D images mesh

Every-device-on-one-core caveat: the host has few cores, so the sharded
wall time cannot show parallel SPEEDUP; what it shows is the WORK
INFLATION of sharding (halo collectives, per-shard dispatch, padding) —
total serialized work relative to the unsharded step.  On n real chips
the projected speedup is ~ n / inflation; inflation >= n means the
layout loses outright.  Each mode runs in its own subprocess (same XLA
buffer-commit quirk as scripts/mesh_cost.py).

Writes docs/MESH_COST_r04.json.
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEV = 6
REPS = int(os.environ.get("VFX_MESH_REPS", "3"))
OUT = os.environ.get(
    "VFX_MESH_OUT", os.path.join(REPO, "docs", "MESH_COST_r04.json")
)
DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")


def measure(mode: str) -> dict:
    import __graft_entry__ as ge

    ge._force_cpu_mesh(N_DEV)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.io import (
        load_bgr, read_pano_data, resolve_image_path,
    )
    from vfx_image_stitching_tpu.geometry.cylindrical import (
        cylindrical_project_host_cached,
    )
    from vfx_image_stitching_tpu.parallel.mesh import (
        _full_shift_step, make_mesh, shard_batch,
    )

    cfg = StitchConfig(backend="sift")
    folder = os.path.join(DATA, "parrington")
    paths, focals = read_pano_data(os.path.join(folder, "pano.txt"))
    host = np.stack([
        cylindrical_project_host_cached(
            load_bgr(resolve_image_path(p, folder)), float(f)
        )
        for p, f in zip(paths, focals)
    ])
    batch = jnp.asarray(host)
    if mode == "images":
        batch = shard_batch(batch, make_mesh(N_DEV))
    jax.block_until_ready(batch)

    def run():
        out = _full_shift_step(batch, cfg)
        jax.block_until_ready(out)

    t0 = time.time()
    run()  # compile
    compile_s = time.time() - t0
    times = []
    for _ in range(REPS):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return {
        "mode": mode,
        "median_s": round(statistics.median(times), 3),
        "times": [round(t, 3) for t in times],
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    mode = os.environ.get("VFX_MESH_IMG_MODE")
    if mode:
        print("RESULT " + json.dumps(measure(mode)))
        return

    results = {}
    for m in ("single", "images"):
        env = dict(os.environ, VFX_MESH_IMG_MODE=m)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=5400,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not lines:
            raise RuntimeError(
                f"mode {m} failed rc={p.returncode}\n{p.stdout[-2000:]}\n"
                f"{p.stderr[-3000:]}"
            )
        results[m] = json.loads(lines[-1][len("RESULT "):])
        print(results[m], flush=True)

    inflation = results["images"]["median_s"] / results["single"]["median_s"]
    out = {
        "config": f"18 x 384x512 real parrington (full SIFT caps), "
                  f"{N_DEV}-device virtual CPU mesh, 1-D images axis",
        "single": results["single"],
        "images_mesh": results["images"],
        "work_inflation_images_vs_single": round(inflation, 2),
        "projected_speedup_on_n_real_chips": round(N_DEV / inflation, 2),
        "host_cores": os.cpu_count(),
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": "virtual devices share host cores, so sharded wall time "
                "measures serialized total work (inflation), not "
                "speedup; projection assumes compute scales with 1/n "
                "and inflation is the sharding overhead factor",
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "inflation": out["work_inflation_images_vs_single"],
        "projected_speedup": out["projected_speedup_on_n_real_chips"],
        "out": OUT,
    }))


if __name__ == "__main__":
    main()
