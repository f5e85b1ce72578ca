#!/usr/bin/env python
"""Roofline accounting for the extractor's dominant stages (VERDICT r3
item 5): FLOPs and HBM bytes per stage vs v5e peaks, so "busy" can be
told apart from "done".

Method: the fused-regime prefix executables (same construction as
scripts/profile_extract_fused.py — the regime the headline runs) are
compiled for a chosen subset of prefixes; each compiled executable's
XLA ``cost_analysis()`` gives flops / bytes-accessed / transcendentals,
and same-session timing gives ms/img.  Consecutive differences
attribute both to the stage between the prefixes.  For each stage:

  achieved_flops   = d_flops / d_time
  achieved_bw      = d_bytes / d_time
  frac_of_mxu_roof = achieved_flops / MXU_F32 (all hot dots run
                     Precision.HIGHEST f32; bf16 peak also reported)
  frac_of_hbm_roof = achieved_bw / HBM_BW
  bound            = whichever fraction is larger (a stage far from
                     BOTH roofs is latency/serialization-bound: gathers,
                     small grids, sequential while loops)

Caveats recorded in the artifact: cost_analysis counts HLO-level bytes
post-fusion (an approximation), and the tunneled harness adds a fixed
sync overhead per measurement (subtracted via the RTT probe as in the
profile script).

Writes docs/ROOFLINE_r04.json.
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
    "VFX_ROOFLINE_OUT", os.path.join(REPO, "docs", "ROOFLINE_r04.json")
)
REPS = int(os.environ.get("VFX_PROFILE_REPS", "10"))
GROUP = int(os.environ.get("VFX_PROFILE_GROUP", "6"))

# TPU v5e (v5 lite) public peaks:
#   MXU: 197 TFLOP/s bf16; f32 dots at Precision.HIGHEST run multi-pass
#        bf16 emulation (~1/6 of bf16 peak is the practical f32 roof)
#   HBM: 16 GB @ 819 GB/s
PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 6.0
PEAK_HBM = 819e9

# prefix boundaries to compile (subset of profile_extract_fused.STAGES):
# each pays a remote compile, so only the boundaries that isolate the
# dominant stages are compiled
PREFIXES = [
    ("pyramid_dog", 0),
    ("extrema", 1),
    ("localize", 2),
    ("orientation", 5),
    ("compact_convert", 6),
    ("descriptors", 7),
    ("full", 8),
]


def _drain(out):
    import numpy as _np
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            _np.asarray(jax.device_get(leaf.ravel()[:1]))
            return


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
    prev = {"ms": 0.0, "flops": 0.0, "bytes": 0.0, "trans": 0.0}
    for name, k in PREFIXES:
        fn = functools.partial(
            lambda g, upto: jnp.sum(
                jax.lax.map(lambda im: prefix_one(im, upto), g)
            ),
            upto=k,
        )
        t0 = time.time()
        compiled = jax.jit(fn).lower(grays).compile()
        compile_s = time.time() - t0
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        trans = float(ca.get("transcendentals", 0.0))

        out = compiled(grays)
        _drain(out)
        t0 = time.time()
        _drain(out)
        rtt = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            out = compiled(grays)
        _drain(out)
        dt = max((time.time() - t0 - rtt), 0.0) / REPS
        ms_img = dt / GROUP * 1e3

        d_ms = ms_img - prev["ms"]
        d_flops = (flops - prev["flops"]) / GROUP
        d_bytes = (byts - prev["bytes"]) / GROUP
        d_trans = (trans - prev["trans"]) / GROUP
        d_t = max(d_ms, 1e-3) * 1e-3
        ach_fl = d_flops / d_t
        ach_bw = d_bytes / d_t
        frac_mxu = ach_fl / PEAK_F32
        frac_hbm = ach_bw / PEAK_HBM
        bound = (
            "compute" if frac_mxu > frac_hbm else "memory"
        ) if max(frac_mxu, frac_hbm) > 0.33 else "latency/serialization"
        rows.append({
            "prefix": name, "cum_ms_per_img": round(ms_img, 2),
            "delta_ms_per_img": round(d_ms, 2),
            "delta_gflops_per_img": round(d_flops / 1e9, 3),
            "delta_mbytes_per_img": round(d_bytes / 1e6, 2),
            "delta_mtrans_per_img": round(d_trans / 1e6, 2),
            "achieved_tflops": round(ach_fl / 1e12, 3),
            "achieved_gbs": round(ach_bw / 1e9, 1),
            "frac_f32_mxu_roof": round(frac_mxu, 3),
            "frac_hbm_roof": round(frac_hbm, 3),
            "bound": bound,
            "compile_s": round(compile_s, 1),
        })
        print(f"{name:16s} d_ms {d_ms:6.2f}  d_GF {d_flops/1e9:7.3f}  "
              f"d_MB {d_bytes/1e6:8.2f}  -> {ach_bw/1e9:6.1f} GB/s "
              f"({frac_hbm*100:4.1f}% HBM), {ach_fl/1e12:6.3f} TF/s "
              f"({frac_mxu*100:4.1f}% f32-MXU)  [{bound}]", flush=True)
        prev = {"ms": ms_img, "flops": flops, "bytes": byts, "trans": trans}

    with open(OUT, "w") as f:
        json.dump({
            "dataset": "parrington", "group": GROUP, "reps": REPS,
            "peaks": {"bf16_flops": PEAK_BF16, "f32_flops": PEAK_F32,
                      "hbm_bytes_per_s": PEAK_HBM},
            "note": "fused-regime prefix deltas; flops/bytes from XLA "
                    "cost_analysis (HLO-level, post-fusion approximation)"
                    "; f32 roof = bf16/6 (Precision.HIGHEST multi-pass). "
                    "A stage far from both roofs is bound by gather "
                    "serialization / small-grid latency, not by FLOPs "
                    "or HBM.",
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
