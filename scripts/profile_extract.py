#!/usr/bin/env python
"""Per-stage device-time breakdown of the SIFT extractor on one image.

The warm headline's device budget is dominated by the extractor
(0.39 s of 0.45 s busy, docs/UTILIZATION_r03c.json), but the whole
lax.map batch compiles to one while loop, so the xplane can't rank the
*stages*.  This script times each stage as its OWN jitted executable on
a real parrington image (warm, R reps between syncs, per octave where
the stage is per-octave), producing a ranked table.

Caveat: separate jits lose cross-stage fusion, so the stage sum
overstates the fused total — treat as a ranking + upper bound, not an
identity.  Writes docs/EXTRACT_PROFILE_r3.json.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("VFX_USE_PALLAS", "1")

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
OUT = os.environ.get(
    "VFX_PROFILE_OUT", os.path.join(REPO, "docs", "EXTRACT_PROFILE_r3.json")
)
REPS = int(os.environ.get("VFX_PROFILE_REPS", "10"))


def _drain(out):
    """Force a real device sync: pull one element to host.

    On this harness's axon backend ``block_until_ready`` acks dispatch
    without waiting for compute (a 4096 matmul 'finishes' in 35 us =
    3951 TFLOP/s, impossible on a v5e) — only a device->host pull
    drains the in-order queue.
    """
    import numpy as _np

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            _np.asarray(jax.device_get(leaf.ravel()[:1]))
            return


def timeit(fn, *args):
    out = fn(*args)  # compile + warm
    _drain(out)
    # RTT floor: sync with no new work queued
    t0 = time.time()
    _drain(out)
    rtt = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _drain(out)
    dt = max((time.time() - t0 - rtt), 0.0) / REPS
    return dt, out


if __name__ == "__main__":
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.io import (
        read_pano_data, resolve_image_path, load_bgr,
    )
    from vfx_image_stitching_tpu.ops.color import bgr_to_gray_f32
    from vfx_image_stitching_tpu.geometry.cylindrical import (
        cylindrical_project_batch,
    )
    from vfx_image_stitching_tpu.models.sift import extract as ex
    from vfx_image_stitching_tpu.models.sift.pyramid import (
        generate_base_image, compute_number_of_octaves,
        generate_gaussian_kernels, generate_gaussian_images,
        generate_dog_images, gradient_fields,
    )
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked, compact_localized,
    )
    from vfx_image_stitching_tpu.models.sift.orientation import (
        assign_orientations_chunked,
    )
    from vfx_image_stitching_tpu.models.sift.descriptor import (
        compute_descriptors_bucketed,
    )
    from vfx_image_stitching_tpu.models.sift.keypoints import (
        compact, concatenate, convert_keypoints_to_input_image_size,
        sort_and_dedup,
    )

    base_cfg = StitchConfig(backend="sift")
    # Mirror the chip defaults exactly (stitch._resolve_cfg under
    # VFX_USE_PALLAS=1): Pallas orientation/descriptor kernels AND the
    # Pallas window gather.
    cfg = dataclasses.replace(
        base_cfg.sift,
        use_pallas=True,
        capacities=dataclasses.replace(
            base_cfg.sift.capacities, desc_pallas_gather=True
        ),
    )
    caps = cfg.capacities

    folder = os.path.join(DATA, "parrington")
    paths, focals = read_pano_data(os.path.join(folder, "pano.txt"))
    path0 = resolve_image_path(paths[0], folder)
    img = load_bgr(path0)
    focal = focals[0]

    cyl = cylindrical_project_batch(
        jnp.asarray(img[None].astype(np.uint8)), (focal,)
    )[0]
    gray = jax.jit(bgr_to_gray_f32)(cyl)
    jax.block_until_ready(gray)

    rows = []

    def add(name, secs, extra=None):
        rows.append({"stage": name, "s_per_rep": round(secs, 5),
                     **(extra or {})})
        print(f"{name:42s} {secs*1e3:8.2f} ms", flush=True)

    t, base = timeit(
        jax.jit(lambda g: generate_base_image(g, cfg.sigma, cfg.assumed_blur)),
        gray,
    )
    add("base_image (2x up + blur)", t)

    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)

    t, pyr = timeit(
        jax.jit(lambda b: generate_gaussian_images(b, num_octaves, kernels)),
        base,
    )
    add(f"gaussian_pyramid ({num_octaves} octaves)", t)

    t, dogs = timeit(jax.jit(generate_dog_images), pyr)
    add("dog_pyramid", t)

    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    per_oct = {}
    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
        loc_cap = min(caps.scaled_localized(o), cand_cap)
        o_cap = caps.scaled_oriented(o)

        t, (layer, y, x, cand_valid) = timeit(
            jax.jit(functools.partial(
                extract_candidates, border=cfg.image_border_width,
                threshold=thresh, capacity=cand_cap,
            )),
            dog,
        )
        per_oct.setdefault("extrema", []).append(t)

        t, loc = timeit(
            jax.jit(functools.partial(
                localize_candidates_chunked, octave=o, cfg=cfg,
            )),
            dog, layer, y, x, cand_valid,
        )
        per_oct.setdefault("localize", []).append(t)

        t, loc_c = timeit(
            jax.jit(functools.partial(compact_localized, out_capacity=loc_cap)), loc
        )
        per_oct.setdefault("compact_localized", []).append(t)

        grad_src = pyr[o][..., 1:cfg.num_intervals + 1, :, :]
        t, (mag, ang) = timeit(jax.jit(gradient_fields), grad_src)
        per_oct.setdefault("gradient_fields", []).append(t)

        t, kps = timeit(
            jax.jit(functools.partial(
                assign_orientations_chunked, octave=o, cfg=cfg,
                layer_base=1,
            )),
            mag, ang, loc_c,
        )
        per_oct.setdefault("orientation", []).append(t)

        t, kps_c = timeit(
            jax.jit(lambda k: convert_keypoints_to_input_image_size(
                compact(k, o_cap))),
            kps,
        )
        per_oct.setdefault("compact_convert", []).append(t)

        small_cap = min(caps._table(caps.desc_small_caps, o), o_cap)
        big_cap = min(caps._table(caps.desc_big_caps, o), o_cap)
        t, (desc, bc) = timeit(
            jax.jit(functools.partial(
                compute_descriptors_bucketed, octave=o, cfg=cfg,
                small_cap=small_cap, big_cap=big_cap, layer_base=1,
            )),
            mag, ang, kps_c,
        )
        per_oct.setdefault("descriptors", []).append(t)
        per_oct.setdefault("_kps", []).append((kps_c, desc))

    for name in ("extrema", "localize", "compact_localized",
                 "gradient_fields", "orientation", "compact_convert",
                 "descriptors"):
        ts = per_oct[name]
        add(f"{name} (sum {num_octaves} octaves)", sum(ts),
            {"per_octave_ms": [round(x * 1e3, 2) for x in ts]})

    kps_all = concatenate(tuple(k for k, _ in per_oct["_kps"]))
    desc_all = jnp.concatenate([d for _, d in per_oct["_kps"]], axis=0)
    t, _ = timeit(
        jax.jit(functools.partial(sort_and_dedup, out_capacity=caps.max_keypoints)),
        kps_all, desc_all,
    )
    add("sort_and_dedup", t)

    total = sum(r["s_per_rep"] for r in rows)
    print(f"{'TOTAL (separate-jit upper bound)':42s} {total*1e3:8.2f} ms")

    with open(OUT, "w") as f:
        json.dump({
            "image": path0, "reps": REPS,
            "note": "separate-jit per-stage times, one parrington image; "
                    "sum overstates the fused lax.map total (0.392 s / 18 "
                    "imgs = 21.8 ms/img, docs/UTILIZATION_r03c.json)",
            "stages": rows,
            "total_s": round(total, 5),
        }, f, indent=1)
    print(f"wrote {OUT}")
