#!/usr/bin/env python
"""Round-5 probe: small-bucket Pallas descriptor tiles vs the GEMM path.

VERDICT r4 item 5: the 89-wide-window refutation of the tile-fetch
descriptor kernel (descriptor.py docstring; 360 KB/keypoint 2x2 tile
fetch) never A/B'd the SMALL bucket that compute_descriptors_bucketed
isolates — median half-width ~27, so a 56-row tile pair (2x56x128
samples, 36% of the default 88-row tiles) serves those windows.  The
round-4 scratch-dot probe (docs/PROBE_DESC_SCRATCH_DOT_r3.json) killed
an MXU formulation at the same shapes at ~7.3 us/kp ~= the GEMM share,
and pinned the cost to per-grid-step overhead; this probe closes the
remaining variant: descriptor_histograms(tile_r=56) — the production
masked-reduction kernel — on REAL pipeline inputs (parrington octave-0
small bucket) vs the small-bucket GEMM it would replace.

Writes docs/PROBE_DESC_SMALL_PALLAS_r05.json.
Reference semantics: sift_impl.py:361-526.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPU = len(sys.argv) > 1 and sys.argv[1] == "cpu"
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

import jax.numpy as jnp
import numpy as np

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
OUT = os.path.join(REPO, "docs", "PROBE_DESC_SMALL_PALLAS_r05.json")


def build_small_bucket_inputs():
    """Octave-0 small-bucket keypoints + gradient stacks, real image."""
    import cv2

    from vfx_image_stitching_tpu.config import SiftConfig
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
    from vfx_image_stitching_tpu.models.sift.keypoints import (
        convert_keypoints_to_input_image_size,
    )
    from vfx_image_stitching_tpu.ops.color import bgr_to_gray_f32
    from vfx_image_stitching_tpu.models.sift.descriptor import (
        _window_params,
    )

    cfg = SiftConfig()
    img = cv2.imread(os.path.join(DATA, "parrington", "prtn00.jpg"))
    gray = bgr_to_gray_f32(jnp.asarray(img))
    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(
        base, compute_number_of_octaves(base.shape), kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    o = 0
    dog = dogs[o]
    caps = cfg.capacities
    cand_cap = min(caps.scaled_candidates(o), 3 * dog.shape[-2] * dog.shape[-1])
    layer, y, x, cand_valid = extract_candidates(
        dog, cfg.image_border_width, thresh, cand_cap)
    loc = localize_candidates_chunked(dog, layer, y, x, cand_valid, o, cfg)
    loc = compact_localized(loc, min(caps.scaled_localized(o), cand_cap))
    grad_src = pyramid[o][..., 1:cfg.num_intervals + 1, :, :]
    mag, ang = gradient_fields(grad_src)
    kps = assign_orientations_chunked(
        mag, ang, loc, o, cfg, min(caps.scaled_oriented(o), 4096))
    kps = convert_keypoints_to_input_image_size(kps)

    rows_dim, cols_dim = mag.shape[-2:]
    (_l, _px, _py, _a, _c, _s, _hw, half_w) = _window_params(
        kps, cfg, rows_dim, cols_dim)
    is_small = kps.valid & (half_w <= caps.desc_small_half)
    # compact the small bucket to the front at the audited small cap
    small_cap = caps.desc_small_caps[o]
    big_int = jnp.iinfo(jnp.int32).max
    arange = jnp.arange(kps.capacity, dtype=jnp.int32)
    idx_small = jnp.argsort(
        jnp.where(is_small, arange, big_int))[:small_cap]
    from vfx_image_stitching_tpu.models.sift.keypoints import Keypoints

    sub = Keypoints(*[f[idx_small] for f in kps])
    sub = sub._replace(valid=is_small[idx_small])
    n_small = int(jnp.sum(is_small))
    return mag, ang, sub, cfg, n_small


def main() -> None:
    from vfx_image_stitching_tpu.models.sift.descriptor import (
        _finalize, _window_params, compute_descriptors_chunked,
    )
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        descriptor_histograms,
    )

    mag, ang, kps, cfg, n_small = build_small_bucket_inputs()
    caps = cfg.capacities
    print(f"small-bucket live keypoints: {n_small} / cap {kps.capacity}",
          flush=True)
    rows_dim, cols_dim = mag.shape[-2:]
    half_cap = caps.desc_small_half

    @jax.jit
    def gemm_path(mag, ang, kps):
        return compute_descriptors_chunked(
            mag, ang, kps, 0, cfg, half_cap=half_cap, layer_base=1)

    @jax.jit
    def pallas_path(mag, ang, kps):
        (layer, px, py, angle, cos_a, sin_a, hist_w, half_w) = (
            _window_params(kps, cfg, rows_dim, cols_dim))
        # layer_base=1: stacks carry layers 1..3 only
        vec = descriptor_histograms(
            mag, ang, layer - 1, py, px,
            jnp.minimum(half_w, half_cap), cos_a, sin_a, hist_w, angle,
            kps.valid.astype(jnp.int32), half_cap,
            rows_dim, cols_dim, tile_r=56,
        )
        return jnp.where(kps.valid[:, None], _finalize(vec, cfg), 0.0)

    report = {"n_small_live": n_small, "small_cap": int(kps.capacity),
              "half_cap": int(half_cap), "tile_r": 56}

    t0 = time.time()
    d_gemm = jax.block_until_ready(gemm_path(mag, ang, kps))
    report["compile_gemm_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    d_pal = jax.block_until_ready(pallas_path(mag, ang, kps))
    report["compile_pallas_s"] = round(time.time() - t0, 1)

    dg = np.asarray(d_gemm)
    dp = np.asarray(d_pal)
    valid = np.asarray(kps.valid)
    diff = np.abs(dg[valid] - dp[valid])
    report["max_abs_diff_valid"] = float(diff.max(initial=0.0))
    report["rows_equal_pct"] = float(
        100.0 * (dg[valid] == dp[valid]).all(axis=-1).mean()
    ) if valid.any() else 100.0
    print("parity:", report["max_abs_diff_valid"],
          report["rows_equal_pct"], flush=True)

    if CPU:
        report["mode"] = "cpu-interpret parity only"
    else:
        # batched timing: N dispatches per sync; perturb angle to defeat
        # the backend value cache (same method as the scratch-dot probe)
        def timeit(fn, reps=20, trials=3):
            best = float("inf")
            for t in range(trials):
                outs = []
                t0 = time.time()
                for r in range(reps):
                    kk = kps._replace(
                        angle=kps.angle + jnp.float32(1e-5 * (r + t)))
                    outs.append(fn(mag, ang, kk))
                jax.block_until_ready(outs)
                best = min(best, (time.time() - t0) / reps)
            return best

        g = timeit(gemm_path)
        p = timeit(pallas_path)
        report["gemm_ms_per_call"] = round(g * 1e3, 3)
        report["pallas_ms_per_call"] = round(p * 1e3, 3)
        report["gemm_us_per_live_kp"] = round(g * 1e6 / max(n_small, 1), 2)
        report["pallas_us_per_live_kp"] = round(p * 1e6 / max(n_small, 1), 2)
        report["pallas_over_gemm"] = round(p / g, 3)

    report["recorded"] = time.strftime("%Y-%m-%d %H:%M")
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
