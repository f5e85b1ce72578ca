#!/usr/bin/env python
"""A/B the slim-state early-exit Newton localize against the plain path.

docs/ROOFLINE_r04.json puts localize at 3.98 ms/img, far from both the
MXU and HBM roofs — bound by its serial per-iteration chain.  The slim
variant (localize.localize_candidates_chunked_slim) attacks exactly the
two serial components the round-3 probes left standing:

  * state width: 12 lanes carried per iteration instead of 22 (the 13
    recomputable result lanes drop to 3 stored update lanes; the
    gradient/Hessian/center lanes are re-derived once post-loop);
  * iteration count: a while_loop stops a chunk as soon as its last
    real row converges/rejects (75% settle at iteration 1 — DEVNOTES
    fused-attribution entry) instead of always running 5 iterations.

Times the fused extract PREFIX through localize (same lax.map 6-image
group as the headline executable) for {extrema-only, plain, slim},
interleaved rounds.  Writes docs/PROBE_LOCALIZE_SLIM_r04.json.

Reference semantics under study: sift_impl.py:169-211
(localize_extremum_via_quadratic_fit).
"""

import functools
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
OUT = os.environ.get(
    "VFX_PROBE_OUT",
    os.path.join(REPO, "docs", "PROBE_LOCALIZE_SLIM_r04.json"),
)
REPS = int(os.environ.get("VFX_PROBE_REPS", "8"))
GROUP = int(os.environ.get("VFX_PROBE_GROUP", "6"))
N_ROUNDS = int(os.environ.get("VFX_PROBE_ROUNDS", "5"))


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
        localize_candidates_chunked, localize_candidates_chunked_slim,
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

    def prefix_one(gray, mode: str):
        base = generate_base_image(gray, base_cfg.sigma, base_cfg.assumed_blur)
        pyramid = generate_gaussian_images(base, num_octaves, kernels)
        dogs = generate_dog_images(pyramid)
        acc = jnp.float32(0)
        for o in range(num_octaves):
            dog = dogs[o]
            h_o, w_o = dog.shape[-2:]
            cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
            layer, y, x, cand_valid = extract_candidates(
                dog, base_cfg.image_border_width, thresh, cand_cap
            )
            if mode == "extrema":
                acc += _reduce(layer, y, x, cand_valid)
                continue
            loc_fn = (
                localize_candidates_chunked_slim
                if mode == "slim" else localize_candidates_chunked
            )
            loc = loc_fn(dog, layer, y, x, cand_valid, o, base_cfg)
            # reduce over EVERY output field so neither variant can
            # dead-code a lane the other pays for
            acc += _reduce(
                loc.x, loc.y, loc.layer, loc.pt_x, loc.pt_y, loc.size,
                loc.response, loc.octave_packed, loc.valid,
                loc.jx, loc.jy, loc.jl,
            )
        return acc

    fns, compile_s, checksum = {}, {}, {}
    for name in ("extrema", "plain", "slim"):
        fn = jax.jit(functools.partial(
            lambda g, m: jnp.sum(
                jax.lax.map(lambda im: prefix_one(im, m), g)
            ),
            m=name if name != "plain" else "plain",
        ))
        t0 = time.time()
        out = fn(grays)
        _drain(out)
        compile_s[name] = round(time.time() - t0, 1)
        checksum[name] = float(out)
        fns[name] = fn
        print(f"[compile] {name}: {compile_s[name]}s sum={checksum[name]:.1f}",
              flush=True)

    rounds = {name: [] for name in fns}
    for r in range(N_ROUNDS):
        for name, fn in fns.items():
            out = fn(grays)
            _drain(out)
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
    derived = {
        "loc_cum_plain": round(summary["plain"] - summary["extrema"], 3),
        "loc_cum_slim": round(summary["slim"] - summary["extrema"], 3),
        "slim_saving_ms_per_img": round(summary["plain"] - summary["slim"], 3),
    }
    out = dict(
        dataset="parrington", group=GROUP, reps=REPS, n_rounds=N_ROUNDS,
        compile_s=compile_s,
        checksum_note=(
            "plain vs slim checksums differ only via filler-row garbage "
            "and <=1-ulp response wobble; valid-row equality is pinned by "
            "tests/test_sift.py::test_localize_slim_matches_plain"
        ),
        checksums=checksum,
        summary_ms_per_img=summary,
        derived_ms_per_img=derived,
        rounds_ms_per_img={k: [round(v, 3) for v in vs]
                           for k, vs in rounds.items()},
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(derived), flush=True)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
