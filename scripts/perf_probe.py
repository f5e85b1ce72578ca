#!/usr/bin/env python
"""One-process TPU perf probe: phase breakdown + extractor device time.

Everything rides one process because remote compiles through the dev
tunnel are minutes and not locally cached (docs/DEVNOTES.md).  Prints
JSON lines so runs can be diffed.
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


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.io import load_dataset_device
    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.pipeline.stitch import (
        _resolve_cfg, dispatch_pair_step, extract_features, stitch_panorama,
    )

    folder = os.path.join(DATA, "parrington")
    cfg = _resolve_cfg("sift", None)

    # -- warm the executables once
    stitch_panorama(folder, backend="sift", crop_margin=15, save_path=None)

    # -- e2e warm, 3 reps
    for rep in range(3):
        t0 = time.time()
        res = stitch_panorama(
            folder, backend="sift", crop_margin=15, save_path=None
        )
        print(json.dumps({
            "probe": "e2e_warm", "rep": rep,
            "s": round(time.time() - t0, 4),
            "timings": {k: round(v, 4) for k, v in res.timings.items()},
        }))

    # -- phase dissection with explicit syncs (upload / extract / pair)
    batch, valid, focals, shape = load_dataset_device(folder)
    cyl = cylindrical_project_batch(batch, tuple(focals))
    jax.block_until_ready(cyl)
    cyl_host = np.asarray(cyl)

    for rep in range(3):
        # perturb input so the value cache can't serve the result
        perturbed = cyl_host.copy()
        perturbed[0, rep, rep, 0] ^= 1
        t0 = time.time()
        dev = jnp.asarray(perturbed)
        dev.block_until_ready()
        t1 = time.time()
        feats = extract_features(dev, cfg)
        xy, descs, valid_kp, meta, stats = feats
        # force extraction by pulling one scalar derived from descriptors
        float(jnp.sum(descs[:, 0, 0]))
        t2 = time.time()
        pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
        float(pair_out[0][0, 0])
        t3 = time.time()
        print(json.dumps({
            "probe": "stage_dissect", "rep": rep,
            "upload_s": round(t1 - t0, 4),
            "extract_s": round(t2 - t1, 4),
            "pair_s": round(t3 - t2, 4),
        }))

    # -- optional experiment: alternate descriptor chunk size
    alt_chunk = os.environ.get("VFX_PROBE_DESC_CHUNK")
    if alt_chunk:
        import dataclasses

        caps = dataclasses.replace(
            cfg.sift.capacities, desc_chunk=int(alt_chunk)
        )
        cfg2 = dataclasses.replace(
            cfg, sift=dataclasses.replace(cfg.sift, capacities=caps)
        )
        dev = jnp.asarray(cyl_host)
        dev.block_until_ready()
        for rep in range(3):
            perturbed = cyl_host.copy()
            perturbed[1, rep, rep, 0] ^= 1
            dev = jnp.asarray(perturbed)
            dev.block_until_ready()
            t0 = time.time()
            feats = extract_features(dev, cfg2)
            float(jnp.sum(feats[1][:, 0, 0]))
            print(json.dumps({
                "probe": f"extract_chunk{alt_chunk}", "rep": rep,
                "extract_s": round(time.time() - t0, 4),
            }))


if __name__ == "__main__":
    main()
