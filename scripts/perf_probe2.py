#!/usr/bin/env python
"""Probe 2: where does finalize_pairwise_shifts spend its time on chip?"""

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

    from vfx_image_stitching_tpu.io import load_dataset_device
    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.pipeline.stitch import (
        _resolve_cfg, dispatch_pair_step, extract_features,
        finalize_pairwise_shifts,
    )

    folder = os.path.join(DATA, "parrington")
    cfg = _resolve_cfg("sift", None)

    for rep in range(3):
        t0 = time.time()
        batch, valid, focals, shape = load_dataset_device(folder)
        cyl = cylindrical_project_batch(batch, tuple(focals))
        feats = extract_features(cyl, cfg)
        xy, descs, valid_kp, meta, stats = feats
        pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
        t1 = time.time()
        # force the device work (everything up to the pair outputs)
        float(pair_out[0][0, 0])
        t2 = time.time()
        shifts, pairs, counts = finalize_pairwise_shifts(
            cyl, xy, valid_kp, meta, stats, pair_out, list(valid), cfg
        )
        t3 = time.time()
        print(json.dumps({
            "probe": "finalize_dissect", "rep": rep,
            "dispatch_s": round(t1 - t0, 4),
            "device_force_s": round(t2 - t1, 4),
            "finalize_s": round(t3 - t2, 4),
        }))

    # sub-dissect the finalize internals on the last rep's arrays
    from vfx_image_stitching_tpu.models.sift.strict import escalate_pair

    # NOTE: escalate_pair consumes the BOOLEAN cand_inm mask (not the
    # f32 candidate distances) since the bundle byte-packing change
    (shifts_d, pa_d, pb_d, any_d, counts_d,
     bestb_d, candidx_d, canddist_d, candinm_d, matched_d, bflip_d,
     bswap_d, material_d, nmaterial_d, maxinm_d) = pair_out
    n1 = int(shifts_d.shape[0])
    t0 = time.time()
    parts = [
        shifts_d.reshape(-1), pa_d.reshape(-1), pb_d.reshape(-1),
        any_d.astype(jnp.float32), counts_d.astype(jnp.float32),
        nmaterial_d.astype(jnp.float32),
    ]
    for key in sorted(stats):
        parts.append(stats[key].reshape(-1).astype(jnp.float32))
    bundle = np.asarray(jnp.concatenate(parts))
    t1 = time.time()
    nmaterial = np.asarray(nmaterial_d)
    esc_pairs = np.nonzero(nmaterial > 0)[0]
    t2 = time.time()
    print(json.dumps({
        "probe": "finalize_sub", "bundle_pull_s": round(t1 - t0, 4),
        "nmat_pull_s": round(t2 - t1, 4),
        "escalated_pairs": esc_pairs.tolist(),
        "n_material": nmaterial.tolist(),
    }))
    for i in esc_pairs:
        i = int(i)
        t0 = time.time()
        meta_a = {k: np.asarray(v[i]) for k, v in meta.items()}
        meta_b = {k: np.asarray(v[i + 1]) for k, v in meta.items()}
        ca = np.asarray(cyl[i]); cb = np.asarray(cyl[i + 1])
        xa = np.asarray(xy[i]); xb = np.asarray(xy[i + 1])
        va = np.asarray(valid_kp[i])
        bb = np.asarray(bestb_d[i]); mm = np.asarray(matched_d[i])
        ci = np.asarray(candidx_d[i]); cm = np.asarray(candinm_d[i])
        bf = np.asarray(bflip_d[i]); bs = np.asarray(bswap_d[i])
        mt = np.asarray(material_d[i])
        t1 = time.time()
        esc = escalate_pair(
            ca, cb, xa, meta_a, xb, meta_b, va, bb, ci, cm, mm, bf, bs, mt,
            cfg=cfg.sift, desc_thresh=25000.0, ransac_thresh=3.0,
        )
        t2 = time.time()
        print(json.dumps({
            "probe": "escalate", "pair": i,
            "pulls_s": round(t1 - t0, 4),
            "host_s": round(t2 - t1, 4),
            "confirmed_device": esc is None,
        }))
        # second call: caches warm
        t0 = time.time()
        escalate_pair(
            ca, cb, xa, meta_a, xb, meta_b, va, bb, ci, cm, mm, bf, bs, mt,
            cfg=cfg.sift, desc_thresh=25000.0, ransac_thresh=3.0,
        )
        print(json.dumps({
            "probe": "escalate_warm", "pair": i,
            "host_s": round(time.time() - t0, 4),
        }))


if __name__ == "__main__":
    main()
