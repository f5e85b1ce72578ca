#!/usr/bin/env python
"""Attribute the extractor's FUSED device time by prefix ablation.

scripts/profile_extract.py times each stage as its own jit, but the
separate-jit sum (57 ms/img) overstates the fused lax.map total
(21.8 ms/img, docs/UTILIZATION_r03c.json) by 2.6x — dispatch/RTT
overhead drowns the ranking.  This script instead jits the pipeline CUT
AFTER STAGE k (same per-octave loop, same lax.map over a 6-image
group, same chip defaults), so consecutive differences attribute device
time in the regime the headline actually runs.

Caveat: XLA fuses across stage boundaries, so a difference can shift a
little work between adjacent prefixes — treat deltas < ~1 ms/img as
noise.  Writes docs/EXTRACT_PROFILE_FUSED_r3.json.
"""

import dataclasses
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
    "VFX_PROFILE_OUT",
    os.path.join(REPO, "docs", "EXTRACT_PROFILE_FUSED_r3.json"),
)
REPS = int(os.environ.get("VFX_PROFILE_REPS", "10"))
GROUP = int(os.environ.get("VFX_PROFILE_GROUP", "6"))

STAGES = [
    "pyramid_dog",        # gray -> base -> gaussian pyramid -> DoG
    "extrema",            # + 26-neighbor candidate extraction
    "localize",           # + chunked Newton localization
    "compact_localized",  # + localized compaction
    "gradient_fields",    # + mag/ang fields (gated lax.cond)
    "orientation",        # + orientation histograms / peak expansion
    "compact_convert",    # + oriented compaction + input-size convert
    "descriptors",        # + bucketed one-hot GEMM descriptors
    "sort_dedup",         # + concat + global sort/dedup  (= full)
]


def _drain(out):
    """Force a real device sync: pull one element to host.

    ``block_until_ready`` acks dispatch without waiting for compute on
    this harness's tunneled backend (see scripts/profile_extract.py) —
    only a device->host pull drains the in-order queue.
    """
    import numpy as _np
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            _np.asarray(jax.device_get(leaf.ravel()[:1]))
            return


def timeit(fn, *args):
    t0 = time.time()
    out = fn(*args)  # compile + warm
    _drain(out)
    compile_s = time.time() - t0
    t0 = time.time()
    _drain(out)
    rtt = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _drain(out)
    dt = max((time.time() - t0 - rtt), 0.0) / REPS
    return dt, compile_s


def main() -> None:
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
    paths = paths[:GROUP]
    imgs = np.stack([
        load_bgr(resolve_image_path(p, folder)) for p in paths
    ]).astype(np.uint8)
    cyl = cylindrical_project_batch(jnp.asarray(imgs), tuple(focals[:GROUP]))
    grays = jax.jit(jax.vmap(bgr_to_gray_f32))(cyl)
    _drain(grays)

    # Shapes are static per dataset: plan octaves once from one image.
    probe_base_shape = (grays.shape[1] * 2, grays.shape[2] * 2)
    num_octaves = compute_number_of_octaves(probe_base_shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    def _reduce(*arrs):
        tot = jnp.float32(0)
        for a in arrs:
            tot = tot + jnp.sum(a.astype(jnp.float32))
        return tot

    def prefix_one(gray, upto: int):
        """Run the per-image pipeline through STAGES[upto]; reduce live
        outputs to one scalar so nothing is dead-code-eliminated."""
        base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
        pyramid = generate_gaussian_images(base, num_octaves, kernels)
        dogs = generate_dog_images(pyramid)
        if upto == 0:
            return _reduce(*dogs)

        acc = jnp.float32(0)
        per_kps, per_desc = [], []
        for o in range(num_octaves):
            dog = dogs[o]
            h_o, w_o = dog.shape[-2:]
            cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
            layer, y, x, cand_valid = extract_candidates(
                dog, cfg.image_border_width, thresh, cand_cap
            )
            if upto == 1:
                acc += _reduce(layer, y, x, cand_valid)
                continue
            loc = localize_candidates_chunked(
                dog, layer, y, x, cand_valid, o, cfg
            )
            if upto == 2:
                acc += _reduce(loc.x, loc.y, loc.valid)
                continue
            loc_cap = min(caps.scaled_localized(o), cand_cap)
            loc = compact_localized(loc, loc_cap)
            if upto == 3:
                acc += _reduce(loc.x, loc.y, loc.valid)
                continue
            grad_src = pyramid[o][..., 1:cfg.num_intervals + 1, :, :]
            mag, ang = jax.lax.cond(
                jnp.any(loc.valid),
                lambda s: gradient_fields(s),
                lambda s: (jnp.zeros_like(s), jnp.zeros_like(s)),
                grad_src,
            )
            if upto == 4:
                acc += _reduce(mag[..., ::8, ::8], ang[..., ::8, ::8],
                               loc.x, loc.valid)
                continue
            kps = assign_orientations_chunked(mag, ang, loc, o, cfg,
                                              layer_base=1)
            if upto == 5:
                acc += _reduce(kps.x, kps.angle, kps.valid)
                continue
            o_cap = caps.scaled_oriented(o)
            kps_c = compact(kps, o_cap)
            kps_c = convert_keypoints_to_input_image_size(kps_c)
            if upto == 6:
                acc += _reduce(kps_c.x, kps_c.angle, kps_c.valid)
                continue
            desc, _big = compute_descriptors_bucketed(
                mag, ang, kps_c, o, cfg,
                small_cap=min(caps._table(caps.desc_small_caps, o), o_cap),
                big_cap=min(caps._table(caps.desc_big_caps, o), o_cap),
                layer_base=1,
            )
            if upto == 7:
                acc += _reduce(desc, kps_c.x, kps_c.valid)
                continue
            per_kps.append(kps_c)
            per_desc.append(desc)
        if upto < 8:
            return acc
        kps = concatenate(tuple(per_kps))
        desc = jnp.concatenate(per_desc, axis=0)
        kps, desc = sort_and_dedup(kps, desc, caps.max_keypoints)
        return _reduce(desc, kps.x, kps.valid)

    rows = []
    prev = 0.0
    for k, name in enumerate(STAGES):
        fn = jax.jit(functools.partial(
            lambda g, upto: jnp.sum(
                jax.lax.map(lambda im: prefix_one(im, upto), g)
            ),
            upto=k,
        ))
        t, compile_s = timeit(fn, grays)
        per_img_ms = t / GROUP * 1e3
        delta_ms = per_img_ms - prev
        rows.append({
            "prefix": name, "cum_ms_per_img": round(per_img_ms, 2),
            "delta_ms_per_img": round(delta_ms, 2),
            "compile_s": round(compile_s, 1),
        })
        print(f"{name:18s} cum {per_img_ms:7.2f} ms/img   "
              f"delta {delta_ms:+7.2f}   (compile {compile_s:.0f}s)",
              flush=True)
        prev = per_img_ms

    with open(OUT, "w") as f:
        json.dump({
            "dataset": "parrington", "group": GROUP, "reps": REPS,
            "note": "fused-regime prefix ablation: each row jits the "
                    "pipeline through that stage inside one lax.map "
                    "group; delta = that stage's fused cost.  Deltas "
                    "< ~1 ms/img are fusion-shift noise.",
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
