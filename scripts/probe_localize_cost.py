#!/usr/bin/env python
"""Decompose the fused localize cost: step overhead vs iterations vs floor.

The fused-prefix attribution (docs/EXTRACT_PROFILE_FUSED_r3.json) puts
localize at 5.13 ms/img — the largest extractor slice — and two prior
A/Bs constrain the cause: the split-mover rewrite (4x fewer ACTIVE lanes
in iterations 2-5) was neutral (docs/CHIP_AB_R3E.json) and the slice
gather was 5x worse, so the cost is NOT lane count or gather form.  The
remaining suspects are (a) per-chunk-loop step overhead — the per-octave
chunked Newton loops dispatch ~50+ tiny (<=512-lane) fused steps per
image — and (b) the per-iteration serial floor (gather + solve at full
width).

This probe times the fused localize PREFIX (same lax.map 6-image group
as the headline) under a chunk x iters grid:

  * c512_i5  — current default (should reproduce ~5.4 cum ms/img)
  * c4096_i5 — one chunk per octave: same lanes+iters, ~5x fewer steps
  * c512_i1 / c4096_i1 — single Newton iteration: attribution only
    (NOT parity), isolates the per-iteration cost at each step count
  * extrema  — the pre-localize prefix (the baseline to subtract)

If c4096_i5 << c512_i5, the cost is step overhead and a cross-octave
fused localize (one loop over all octaves' candidates) is the round-4
lead; if the i5/i1 ratio stays ~5x at c4096, it is the serial gather+
solve chain and the lead is dead.

Writes docs/PROBE_LOCALIZE_COST_r3.json.  Reference semantics under
study: sift_impl.py:169-211 (localize_extremum_via_quadratic_fit).
"""

import dataclasses
import functools
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("VFX_USE_PALLAS", "1")

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
OUT = os.environ.get(
    "VFX_PROBE_OUT",
    os.path.join(REPO, "docs", "PROBE_LOCALIZE_COST_r3.json"),
)
REPS = int(os.environ.get("VFX_PROBE_REPS", "8"))
GROUP = int(os.environ.get("VFX_PROBE_GROUP", "6"))
N_ROUNDS = int(os.environ.get("VFX_PROBE_ROUNDS", "4"))


def _drain(out):
    import numpy as _np
    import jax

    _np.asarray(jax.device_get(out.ravel()[:1]))


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
        generate_dog_images,
    )
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked,
    )

    base_cfg = StitchConfig(backend="sift").sift
    caps = base_cfg.capacities

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
    kernels = generate_gaussian_kernels(base_cfg.sigma, base_cfg.num_intervals)
    thresh = extrema_threshold(
        base_cfg.contrast_threshold, base_cfg.num_intervals
    )

    def _reduce(*arrs):
        tot = jnp.float32(0)
        for a in arrs:
            tot = tot + jnp.sum(a.astype(jnp.float32))
        return tot

    def prefix_one(gray, chunk: int, iters: int, do_localize: bool):
        cfg = dataclasses.replace(base_cfg, max_localize_iters=iters)
        base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
        pyramid = generate_gaussian_images(base, num_octaves, kernels)
        dogs = generate_dog_images(pyramid)
        acc = jnp.float32(0)
        for o in range(num_octaves):
            dog = dogs[o]
            h_o, w_o = dog.shape[-2:]
            cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
            layer, y, x, cand_valid = extract_candidates(
                dog, cfg.image_border_width, thresh, cand_cap
            )
            if not do_localize:
                acc += _reduce(layer, y, x, cand_valid)
                continue
            loc = localize_candidates_chunked(
                dog, layer, y, x, cand_valid, o, cfg, chunk=chunk
            )
            acc += _reduce(loc.x, loc.y, loc.pt_x, loc.valid)
        return acc

    VARIANTS = {
        "extrema": dict(chunk=512, iters=5, do_localize=False),
        "c512_i5": dict(chunk=512, iters=5, do_localize=True),
        "c4096_i5": dict(chunk=4096, iters=5, do_localize=True),
        "c512_i1": dict(chunk=512, iters=1, do_localize=True),
        "c4096_i1": dict(chunk=4096, iters=1, do_localize=True),
    }

    fns, compile_s, checksum = {}, {}, {}
    for name, kw in VARIANTS.items():
        fn = jax.jit(functools.partial(
            lambda g, **kw2: jnp.sum(
                jax.lax.map(lambda im: prefix_one(im, **kw2), g)
            ),
            **kw,
        ))
        t0 = time.time()
        out = fn(grays)
        _drain(out)
        compile_s[name] = round(time.time() - t0, 1)
        checksum[name] = float(out)
        fns[name] = fn
        print(f"[compile] {name}: {compile_s[name]}s sum={checksum[name]:.1f}",
              flush=True)

    rounds = {name: [] for name in VARIANTS}
    for r in range(N_ROUNDS):
        for name, fn in fns.items():
            out = fn(grays)
            _drain(out)          # warm queue + measure RTT baseline
            t0 = time.time()
            for _ in range(REPS):
                out = fn(grays)
            _drain(out)
            dt = (time.time() - t0) / REPS / GROUP * 1e3
            rounds[name].append(dt)
            print(f"[round {r}] {name}: {dt:.3f} ms/img", flush=True)

    summary = {
        name: round(statistics.median(v), 3) for name, v in rounds.items()
    }
    # derived attribution (medians)
    ex = summary["extrema"]
    derived = {
        "loc_cum_c512_i5": round(summary["c512_i5"] - ex, 3),
        "loc_cum_c4096_i5": round(summary["c4096_i5"] - ex, 3),
        "step_overhead_c512_vs_c4096_i5": round(
            summary["c512_i5"] - summary["c4096_i5"], 3),
        "per_iter_c4096": round(
            (summary["c4096_i5"] - summary["c4096_i1"]) / 4.0, 3),
        "per_iter_c512": round(
            (summary["c512_i5"] - summary["c512_i1"]) / 4.0, 3),
        "floor_c4096_i1_minus_extrema": round(
            summary["c4096_i1"] - ex, 3),
    }
    with open(OUT, "w") as f:
        json.dump({
            "dataset": "parrington", "group": GROUP, "reps": REPS,
            "n_rounds": N_ROUNDS, "interleaved": True,
            "median_ms_per_img": summary, "derived": derived,
            "compile_s": compile_s, "checksums": checksum,
            "rounds": rounds,
            "note": "iters=1 variants are attribution-only (not parity); "
                    "checksums differ between i1 and i5 by design, and "
                    "between chunk sizes only in filler rows (pt_x of "
                    "cand_valid=False rows) — c512_i5 vs c4096_i5 equality "
                    "of valid rows is pinned separately by tests.",
        }, f, indent=1)
    print(json.dumps({"median_ms_per_img": summary, "derived": derived}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
