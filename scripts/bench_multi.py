#!/usr/bin/env python
"""Batched multi-panorama throughput benchmark (BASELINE config 5).

Times stitching all four reference datasets (wind/out/parrington/grail)
in one run, pipelined (pipeline.multi.stitch_many) vs the naive
sequential loop of stitch_panorama calls, both warm (one untimed
warmup of each executable).  Prints one JSON line per mode.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("VFX_USE_PALLAS", "1")

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
DATASETS = ["wind", "out", "parrington", "grail"]
BACKEND = os.environ.get("VFX_BENCH_BACKEND", "sift")


def run_sequential(folders):
    from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    out = {}
    for f in folders:
        name = os.path.basename(os.path.normpath(f))
        out[name] = stitch_panorama(
            f, backend=BACKEND,
            crop_margin=DEFAULT_CROP_MARGINS.get(name, 15), save_path=None,
        )
    return out


def run_pipelined(folders):
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many

    return stitch_many(folders, backend=BACKEND)


def main() -> None:
    folders = [os.path.join(DATA, d) for d in DATASETS]
    # warmup BOTH paths: the sequential path's grouped loader compiles
    # group-shaped extract executables the pipelined (monolithic-batch)
    # path never uses, so a pipelined-only warmup would leave cold
    # compiles inside the timed sequential run
    run_pipelined(folders)
    run_sequential(folders)

    t0 = time.time()
    seq = run_sequential(folders)
    t_seq = time.time() - t0

    t0 = time.time()
    pipe = run_pipelined(folders)
    t_pipe = time.time() - t0

    same = all(
        (seq[k].panorama.shape == pipe[k].panorama.shape)
        and (seq[k].panorama == pipe[k].panorama).all()
        for k in seq
    )
    print(json.dumps({
        "metric": f"all-4-dataset {BACKEND} stitch (warm)",
        "sequential_s": round(t_seq, 3),
        "pipelined_s": round(t_pipe, 3),
        "speedup": round(t_seq / t_pipe, 3),
        "panoramas_equal": bool(same),
        "shapes": {k: list(v.panorama.shape) for k, v in pipe.items()},
    }))


if __name__ == "__main__":
    main()
