#!/usr/bin/env python
"""Probe: does tile-sorting keypoints cut the orientation kernel's DMA?

ROOFLINE_r04 attributes ~490 MB/img to the orientation prefix — the
per-keypoint 2x2x(40,128) tile fetches (163 KB/keypoint) of
``orientation_histograms_v2``, whose block index map is dynamic from
scalar prefetch.  Mosaic's grid pipeline skips an input copy when the
next step's block indices equal the current ones, so SORTING the
keypoints by (layer, tile_row, tile_col) should elide most re-fetches;
per-keypoint histograms are order-independent, so an inverse-permute
restores bit-identical outputs.

Three orderings of the same synthetic candidate set, one executable:
  natural : uniform-random positions (elision only by accident)
  sorted  : same rows sorted by (layer, r0, c0)
  const   : every keypoint in one tile neighborhood (elision upper bound)

Plus a 'cluster' set (gaussian blobs, closer to real corner clustering)
timed natural vs sorted.  Writes docs/PROBE_ORIENT_SORT_r04.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_r4")

REPS = int(os.environ.get("VFX_PROBE_REPS", "20"))
OUT = os.path.join(REPO, "docs", "PROBE_ORIENT_SORT_r04.json")


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.models.sift import pallas_kernels as pk

    rng = np.random.default_rng(0)
    # octave-0 parrington shape: 3 gradient layers of the 770x1026 base
    L, H, W = 3, 770, 1026
    half, nb = 17, 36
    mag = jnp.asarray(rng.random((L, H, W), np.float32))
    ang = jnp.asarray(rng.random((L, H, W), np.float32) * 360.0)

    def make_inputs(k, mode):
        if mode == "cluster":
            # ~24 corner-ish blobs, sigma 40 px
            centers = rng.uniform((40, 40), (H - 40, W - 40), (24, 2))
            pick = rng.integers(0, 24, k)
            pts = centers[pick] + rng.normal(0, 40.0, (k, 2))
            cy = np.clip(pts[:, 0], 1, H - 2).astype(np.int32)
            cx = np.clip(pts[:, 1], 1, W - 2).astype(np.int32)
        else:
            cy = rng.integers(1, H - 1, k).astype(np.int32)
            cx = rng.integers(1, W - 1, k).astype(np.int32)
        layer = rng.integers(0, L, k).astype(np.int32)
        radius = np.full(k, 12, np.int32)
        wf = np.full(k, -0.005, np.float32)
        valid = np.ones(k, np.int32)
        return layer, cy, cx, radius, wf, valid

    def tile_key(layer, cy, cx):
        sy = np.clip(cy - half, 0, H - 1)
        sx = np.clip(cx - half, 0, W - 1)
        r0 = sy // pk.TILE_R
        c0 = sx // pk.TILE_C
        return (layer * ((H // pk.TILE_R) + 2) + r0) * (
            (W // pk.TILE_C) + 2
        ) + c0

    def run(args):
        out = pk.orientation_histograms_v2(
            mag, ang, *[jnp.asarray(a) for a in args],
            half=half, img_h=H, img_w=W, num_bins=nb,
        )
        return out

    import functools

    @jax.jit
    def run_many(args, xs):
        """len(xs) kernel calls inside ONE dispatch: per-call probe
        timing over the tunnel is RTT-bound otherwise (~5 ms/call).
        xs is a runtime zeros array — each iteration's inputs are
        perturbed by a tracer value XLA cannot constant-fold, so the
        calls can't be CSE'd or hoisted."""
        layer, cy, cx, radius, wf, valid = [jnp.asarray(a) for a in args]

        def step(carry, z):
            out = pk.orientation_histograms_v2(
                mag, ang, layer + z, cy + z, cx + z, radius, wf, valid,
                half=half, img_h=H, img_w=W, num_bins=nb,
            )
            return carry + jnp.sum(out), None

        tot, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return tot

    ZEROS = jnp.zeros((REPS,), jnp.int32)
    ZEROS2 = jnp.zeros((2 * REPS,), jnp.int32)

    import statistics

    N_ROUNDS = int(os.environ.get("VFX_PROBE_ROUNDS", "5"))

    def time_once(args, xs=None, n=None):
        xs = ZEROS if xs is None else xs
        n = REPS if n is None else n
        t0 = time.time()
        out = run_many(args, xs)
        np.asarray(jax.device_get(out))
        return (time.time() - t0) / n

    results = {}
    for k in (512, 2048):
        for dist in ("uniform", "cluster"):
            base = make_inputs(k, dist)
            key = tile_key(base[0], base[1], base[2])
            order = np.argsort(key, kind="stable")
            srt = tuple(a[order] for a in base)
            cst = tuple(np.full_like(a, a[0]) for a in base[:3]) + base[3:]
            variants = {"natural": base, "sorted": srt, "const": cst}

            # warm + correctness
            o_nat = np.asarray(run(base))
            o_srt = np.asarray(run(srt))
            run(cst)
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            same = bool(np.array_equal(o_srt[inv], o_nat))
            np.asarray(jax.device_get(run_many(base, ZEROS)))   # compile
            np.asarray(jax.device_get(run_many(base, ZEROS2)))  # compile 2n

            # interleaved rounds: tunnel weather hits all variants alike
            times = {v: [] for v in variants}
            for _r in range(N_ROUNDS):
                for v, args in variants.items():
                    times[v].append(time_once(args))
            med = {v: statistics.median(ts) for v, ts in times.items()}
            # linearity check: if per-call time at 2n matches n, the
            # scan truly executes per-iteration kernels (nothing hoisted)
            t2n = time_once(base, ZEROS2, 2 * REPS)
            row = {
                "natural_2n_percall_ms": round(t2n * 1e3, 3),
                "natural_ms": round(med["natural"] * 1e3, 3),
                "sorted_ms": round(med["sorted"] * 1e3, 3),
                "const_tile_ms": round(med["const"] * 1e3, 3),
                "speedup_sorted": round(
                    med["natural"] / max(med["sorted"], 1e-9), 2
                ),
                "dma_share_upper": round(
                    1.0 - med["const"] / max(med["natural"], 1e-9), 3
                ),
                "unique_neighborhoods": int(len(np.unique(key))),
                "runs_after_sort": int(1 + (np.diff(key[order]) != 0).sum()),
                "unsort_bit_identical": same,
                "rounds_ms": {
                    v: [round(t * 1e3, 3) for t in ts]
                    for v, ts in times.items()
                },
            }
            results[f"k{k}_{dist}"] = row
            print(f"k={k} {dist}: nat {row['natural_ms']} srt "
                  f"{row['sorted_ms']} const {row['const_tile_ms']} "
                  f"(x{row['speedup_sorted']}, bit={same})", flush=True)

    with open(OUT, "w") as f:
        json.dump({
            "kernel": "orientation_histograms_v2",
            "shape": {"L": L, "H": H, "W": W, "half": half},
            "reps": REPS,
            "results": results,
            "note": "same executable, permuted inputs; const = every "
                    "step maps the same 2x2 tile neighborhood (DMA "
                    "elision upper bound)",
        }, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
