#!/usr/bin/env python
"""Feasibility ladder for a VMEM-resident scalar-Newton localize kernel.

docs/ROOFLINE_r04.json + docs/PROBE_LOCALIZE_COST_r3.json establish that
localization costs ~0.77 ms/img *per Newton iteration* — ~130 us per
chunk-step whose actual work (a (27, 512) gather + ~40 lane ops) is
microseconds.  Every XLA-level reformulation (wider chunks, split
movers, slim state) has been probed and killed, so the remaining lead
is structural: keep the whole DoG octave stack RESIDENT IN VMEM for one
Pallas kernel that runs the full Newton loop per candidate on the
scalar core with true early exit (75% of candidates settle at
iteration 1 — only a scalar branch can harvest that).

This script climbs the feasibility ladder one rung at a time so each
Mosaic unknown gets its own verdict:

  feas1: (5, 768, 1024) f32 input as ONE whole VMEM block — does a
         ~15.7 MB resident block compile/run on this chip at all?
         (the local guide says ~16 MB/core VMEM; v5e may have more)
  feas2: dynamic SCALAR loads from that VMEM ref (dog_ref[l, y, x]
         with runtime indices) — do they lower, and what do 27 of
         them per candidate cost?
  newton: the full per-candidate scalar Newton loop (27 loads +
         adjugate solve + early exit), correctness vs the XLA plain
         path (localize.localize_candidates_chunked) on real
         parrington octave-0 candidates, then per-candidate timing.

Usage: python scripts/probe_localize_resident_r4.py [feas1|feas2|newton]
Writes docs/PROBE_LOCALIZE_RESIDENT_r04.json (cumulative).

Reference semantics under study: sift_impl.py:169-211
(localize_extremum_via_quadratic_fit).
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "PROBE_LOCALIZE_RESIDENT_r04.json")


def _record(key, value):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[key] = value
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[record] {key}: {json.dumps(value)}", flush=True)


def feas1():
    """Whole (5, 768, 1024) f32 stack as one VMEM block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (5, 768, 1024)
    nbytes = 4 * shape[0] * shape[1] * shape[2]

    def kernel(dog_ref, out_ref):
        # touch all layers so the block can't be dead-coded
        acc = jnp.zeros((8, 128), jnp.float32)
        for l in range(shape[0]):
            acc = acc + dog_ref[l, :8, :128]
        out_ref[:, :] = acc

    @jax.jit
    def run(dog):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=nbytes + 8 * 1024 * 1024,
            ),
        )(dog)

    dog = jnp.arange(
        shape[0] * shape[1] * shape[2], dtype=jnp.float32
    ).reshape(shape) * 1e-4
    t0 = time.time()
    try:
        out = run(dog)
        out.block_until_ready()
        expect = float(jnp.sum(dog[:, :8, :128]))
        got = float(jnp.sum(out))
        ok = abs(expect - got) / max(abs(expect), 1) < 1e-5
        _record("feas1_whole_stack_vmem", dict(
            ok=bool(ok), compile_s=round(time.time() - t0, 1),
            block_mb=round(nbytes / 2**20, 1),
        ))
    except Exception as e:  # noqa: BLE001 — verdict probe
        _record("feas1_whole_stack_vmem", dict(
            ok=False, error=str(e)[:4000],
            compile_s=round(time.time() - t0, 1),
        ))
        raise SystemExit(1)


def feas2():
    """27 dynamic scalar loads per candidate from the resident block."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (5, 768, 1024)
    nbytes = 4 * shape[0] * shape[1] * shape[2]
    K = 2048
    CHUNK = 256

    W = shape[2]
    SLAB = 256 if W >= 256 else W

    def kernel(l_ref, y_ref, x_ref, dog_ref, out_ref):
        step = pl.program_id(0)

        def body(j, _):
            i = step * CHUNK + j
            l = l_ref[i]
            yy = y_ref[i]
            xx = x_ref[i]
            # aligned slab starts: lanes [xx-1, xx+1] inside [xa, xa+SLAB),
            # sublanes [yy-1, yy+1] inside [ya, ya+16)
            xa = jnp.minimum(((xx - 1) // 128) * 128, W - SLAB)
            xa = pl.multiple_of(xa, 128)
            ya = jnp.minimum(((yy - 1) // 8) * 8, shape[1] - 16)
            ya = pl.multiple_of(ya, 8)
            xoff = xx - 1 - xa                    # in [0, SLAB-2]
            yoff = yy - 1 - ya                    # in [0, 15]
            slabs = []
            for dl in (-1, 0, 1):
                s16 = dog_ref[l + dl, pl.ds(ya, 16), pl.ds(xa, SLAB)]
                s16 = pltpu.roll(s16, 16 - yoff, 0)
                s16 = pltpu.roll(s16, SLAB - xoff, 1)
                slabs.append(s16[:3, :3])
            win = jnp.concatenate(slabs, axis=0)  # (9, 3)
            s = jnp.float32(0.0)
            for r in range(9):
                for cc in range(3):
                    s = s + win[r, cc]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            row = jnp.where(lane == 0, s, 0.0)
            out_ref[pl.ds(j, 1), :] = row
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (CHUNK, 128), lambda s, *_: (s, 0), memory_space=pltpu.VMEM
        ),
    )

    @jax.jit
    def run(l, y, x, dog):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=nbytes + 8 * 1024 * 1024,
            ),
        )(l, y, x, dog)

    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(1, 4, K), jnp.int32)
    y = jnp.asarray(rng.integers(1, shape[1] - 1, K), jnp.int32)
    x = jnp.asarray(rng.integers(1, shape[2] - 1, K), jnp.int32)
    dog = (jnp.arange(shape[0] * shape[1] * shape[2], dtype=jnp.float32)
           .reshape(shape) * 1e-6)

    t0 = time.time()
    try:
        out = run(l, y, x, dog)
        out.block_until_ready()
        compile_s = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001 — verdict probe
        with open("/tmp/probe_err.txt", "w") as fh:
            fh.write(str(e))
        _record("feas2_scalar_loads", dict(
            ok=False, error=str(e)[:4000],
            compile_s=round(time.time() - t0, 1),
        ))
        raise SystemExit(1)

    # correctness vs host
    dn = np.asarray(dog)
    ln, yn, xn = np.asarray(l), np.asarray(y), np.asarray(x)
    expect = np.zeros(K, np.float32)
    for dl in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                expect += dn[ln + dl, yn + dy, xn + dx]
    got = np.asarray(out)[:, 0]
    max_err = float(np.abs(expect - got).max())

    reps = 20
    run(l, y, x, dog).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = run(l, y, x, dog)
    out.block_until_ready()
    us_per_cand = (time.time() - t0) / reps / K * 1e6
    _record("feas2_scalar_loads", dict(
        ok=max_err < 1e-4, max_err=max_err, compile_s=compile_s,
        us_per_candidate=round(us_per_cand, 3), k=K, chunk=CHUNK,
    ))


def _newton_resident_kernel(
    # scalar prefetch
    nlive_ref, l_ref, y_ref, x_ref, v_ref,
    # whole-stack VMEM input
    dog_ref,
    # outputs
    outf_ref, outi_ref,
    *, h: int, w: int, border: int, num_intervals: int,
    max_iters: int, chunk: int,
):
    """Per-candidate scalar Newton, mirroring localize._make_newton_body.

    Same compute->store->converge-check->move order as the XLA body
    (which itself mirrors sift_impl.py:175-195), expressed per candidate
    on the scalar core so settled candidates stop paying iterations.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)
    f0 = jnp.float32(0.0)
    slab = 256 if w >= 256 else w

    @pl.when(step < nlive_ref[0])
    def _process():
        def cand(j, carry):
            i = step * chunk + j
            ok = v_ref[i] != 0

            def run_newton():
                def cond(st):
                    (t, x, y, l, cx, cy, cl, ux, uy, us, gx, gy, gs,
                     dxx, dyy, dss, dxy, dxs, dys, center, conv, rej) = st
                    return (t < max_iters) & ~conv & ~rej

                def body(st):
                    (t, x, y, l, cx, cy, cl, _ux, _uy, _us, _gx, _gy, _gs,
                     _dxx, _dyy, _dss, _dxy, _dxs, _dys, _center,
                     conv, rej) = st

                    # aligned slab loads + dual-axis roll (feas2 pattern)
                    xa = jnp.minimum(((x - 1) // 128) * 128, w - slab)
                    xa = pl.multiple_of(xa, 128)
                    ya = jnp.minimum(((y - 1) // 8) * 8, h - 16)
                    ya = pl.multiple_of(ya, 8)
                    xoff = x - 1 - xa
                    yoff = y - 1 - ya
                    wins = []
                    for dl in (-1, 0, 1):
                        s16 = dog_ref[l + dl, pl.ds(ya, 16),
                                      pl.ds(xa, slab)]
                        s16 = pltpu.roll(s16, 16 - yoff, 0)
                        s16 = pltpu.roll(s16, slab - xoff, 1)
                        wins.append(s16[:3, :3])
                    win = jnp.concatenate(wins, axis=0)   # (9, 3)

                    def c(dl, dy, dx):
                        return win[(dl + 1) * 3 + (dy + 1), dx + 1] / 255.0

                    gx = 0.5 * (c(0, 0, 1) - c(0, 0, -1))
                    gy = 0.5 * (c(0, 1, 0) - c(0, -1, 0))
                    gs = 0.5 * (c(1, 0, 0) - c(-1, 0, 0))
                    v = c(0, 0, 0)
                    dxx = c(0, 0, 1) - 2 * v + c(0, 0, -1)
                    dyy = c(0, 1, 0) - 2 * v + c(0, -1, 0)
                    dss = c(1, 0, 0) - 2 * v + c(-1, 0, 0)
                    dxy = 0.25 * (c(0, 1, 1) - c(0, 1, -1)
                                  - c(0, -1, 1) + c(0, -1, -1))
                    dxs = 0.25 * (c(1, 0, 1) - c(1, 0, -1)
                                  - c(-1, 0, 1) + c(-1, 0, -1))
                    dys = 0.25 * (c(1, 1, 0) - c(1, -1, 0)
                                  - c(-1, 1, 0) + c(-1, -1, 0))
                    # _solve3, same cofactor chain
                    c00 = dyy * dss - dys * dys
                    c01 = dys * dxs - dxy * dss
                    c02 = dxy * dys - dyy * dxs
                    det = dxx * c00 + dxy * c01 + dxs * c02
                    c11 = dxx * dss - dxs * dxs
                    c12 = dxy * dxs - dxx * dys
                    c22 = dxx * dyy - dxy * dxy
                    det_ok = jnp.abs(det) > 1e-30
                    safe = jnp.where(det_ok, det, 1.0)
                    ux = jnp.where(det_ok, -(c00 * gx + c01 * gy + c02 * gs)
                                   / safe, f0)
                    uy = jnp.where(det_ok, -(c01 * gx + c11 * gy + c12 * gs)
                                   / safe, f0)
                    us = jnp.where(det_ok, -(c02 * gx + c12 * gy + c22 * gs)
                                   / safe, f0)

                    conv_now = (
                        (jnp.abs(ux) < 0.5) & (jnp.abs(uy) < 0.5)
                        & (jnp.abs(us) < 0.5)
                    )
                    nx = x + jnp.rint(ux).astype(jnp.int32)
                    ny = y + jnp.rint(uy).astype(jnp.int32)
                    nl = l + jnp.rint(us).astype(jnp.int32)
                    oob = (
                        (ny < border) | (ny >= h - border)
                        | (nx < border) | (nx >= w - border)
                        | (nl < 1) | (nl > num_intervals)
                    )
                    rej2 = ~conv_now & oob
                    x2 = jnp.where(conv_now, x, jnp.clip(nx, 1, w - 2))
                    y2 = jnp.where(conv_now, y, jnp.clip(ny, 1, h - 2))
                    l2 = jnp.where(conv_now, l,
                                   jnp.clip(nl, 1, num_intervals))
                    return (t + 1, x2, y2, l2, x, y, l, ux, uy, us,
                            gx, gy, gs, dxx, dyy, dss, dxy, dxs, dys, v,
                            conv_now, rej2)

                x0 = x_ref[i]
                y0 = y_ref[i]
                l0 = l_ref[i]
                i0 = jnp.int32(0)
                st0 = (i0, x0, y0, l0, x0, y0, l0,
                       f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0,
                       jnp.bool_(False), jnp.bool_(False))
                return jax.lax.while_loop(cond, body, st0)

            def zeros():
                i0 = jnp.int32(0)
                return (i0, i0, i0, i0, i0, i0, i0,
                        f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0, f0,
                        jnp.bool_(False), jnp.bool_(False))

            (t, x, y, l, cx, cy, cl, ux, uy, us, gx, gy, gs,
             dxx, dyy, dss, dxy, dxs, dys, center, conv, rej) = (
                jax.lax.cond(ok, run_newton, zeros)
            )

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            rowf = jnp.zeros((1, 128), jnp.float32)
            for slot, val in enumerate(
                (ux, uy, us, gx, gy, gs, center,
                 dxx, dyy, dss, dxy, dxs, dys)
            ):
                rowf = jnp.where(lane == slot, val, rowf)
            rowi = jnp.zeros((1, 128), jnp.int32)
            for slot, val in enumerate(
                (x, y, l, cx, cy, cl,
                 conv.astype(jnp.int32), rej.astype(jnp.int32))
            ):
                rowi = jnp.where(lane == slot, val, rowi)
            outf_ref[pl.ds(j, 1), :] = rowf
            outi_ref[pl.ds(j, 1), :] = rowi
            return carry

        jax.lax.fori_loop(0, chunk, cand, 0)

    @pl.when(step >= nlive_ref[0])
    def _skip():
        outf_ref[:, :] = jnp.zeros((chunk, 128), jnp.float32)
        outi_ref[:, :] = jnp.zeros((chunk, 128), jnp.int32)


def _localize_resident(dog, layer, y, x, cand_valid, octave, cfg,
                       chunk=256):
    """Wrapper: resident-kernel Newton + the stock XLA finalization."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vfx_image_stitching_tpu.models.sift.chunking import (
        live_chunk_bound,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        _finalize_localized,
    )

    k = layer.shape[0]
    if k <= chunk:
        chunk = k
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k
    n_chunks = k // chunk
    nl, h, w = dog.shape
    n_live = live_chunk_bound(cand_valid, chunk).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((chunk, 128), lambda s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 128), lambda s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _newton_resident_kernel,
        h=h, w=w, border=cfg.image_border_width,
        num_intervals=cfg.num_intervals,
        max_iters=cfg.max_localize_iters, chunk=chunk,
    )
    outf, outi = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((k, 128), jnp.float32),
            jax.ShapeDtypeStruct((k, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * nl * h * w + 16 * 1024 * 1024,
        ),
    )(
        n_live.reshape(1), layer.astype(jnp.int32), y.astype(jnp.int32),
        x.astype(jnp.int32), cand_valid.astype(jnp.int32),
        dog.astype(jnp.float32),
    )
    st = dict(
        x=outi[:, 0], y=outi[:, 1], l=outi[:, 2],
        cx=outi[:, 3], cy=outi[:, 4], cl=outi[:, 5],
        converged=outi[:, 6] != 0, rejected=outi[:, 7] != 0,
        ux=outf[:, 0], uy=outf[:, 1], us=outf[:, 2],
        gx=outf[:, 3], gy=outf[:, 4], gs=outf[:, 5],
        center=outf[:, 6],
        dxx=outf[:, 7], dyy=outf[:, 8], dss=outf[:, 9],
        dxy=outf[:, 10], dxs=outf[:, 11], dys=outf[:, 12],
    )
    return _finalize_localized(st, cand_valid, octave, cfg)


def newton():
    """Correctness vs the plain XLA path on real data, then timing."""
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

    cfg = StitchConfig(backend="sift").sift
    caps = cfg.capacities
    data = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
    folder = os.path.join(data, "parrington")
    paths, focals = read_pano_data(os.path.join(folder, "pano.txt"))
    img = load_bgr(resolve_image_path(paths[0], folder))
    cyl = cylindrical_project_batch(
        jnp.asarray(img[None]), (float(focals[0]),)
    )
    gray = jax.jit(bgr_to_gray_f32)(cyl[0])

    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(base, num_octaves, kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    results = {}
    total_rows = 0
    total_mismatch = 0
    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        if h_o < 16 or w_o < 128:
            # kernel's slab scheme needs 16 sublanes / 128 lanes; the
            # production wrapper would gate these octaves to the XLA
            # path (they carry ~no candidates at these sizes)
            continue
        cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
        layer, yy, xx, cv = extract_candidates(
            dog, cfg.image_border_width, thresh, cap
        )
        t0 = time.time()
        plain = jax.jit(
            functools.partial(localize_candidates_chunked,
                              octave=o, cfg=cfg)
        )(dog, layer, yy, xx, cv)
        jax.block_until_ready(plain)
        t_plain_compile = time.time() - t0
        t0 = time.time()
        try:
            res = jax.jit(
                functools.partial(_localize_resident, octave=o, cfg=cfg)
            )(dog, layer, yy, xx, cv)
            jax.block_until_ready(res)
        except Exception as e:  # noqa: BLE001 — verdict probe
            results[f"octave{o}"] = dict(ok=False, error=str(e)[:4000])
            print(f"[octave {o}] FAILED: {str(e)[:300]}", flush=True)
            continue
        t_res_compile = time.time() - t0

        vp = np.asarray(plain.valid)
        vr = np.asarray(res.valid)
        mask_eq = bool((vp == vr).all())
        rows = int(vp.sum())
        mism = {}
        for name in plain._fields:
            a = np.asarray(getattr(plain, name))[vp]
            b = np.asarray(getattr(res, name))[vp]
            if name in ("size", "response"):
                ulp = np.abs(a.view(np.int32).astype(np.int64)
                             - b.view(np.int32).astype(np.int64))
                bad = int((ulp > 4).sum())
                if bad:
                    mism[name] = dict(over_4ulp=bad,
                                      max_ulp=int(ulp.max()))
            else:
                bad = int((a != b).sum())
                if bad:
                    mism[name] = bad
        total_rows += rows
        total_mismatch += sum(
            v if isinstance(v, int) else v["over_4ulp"]
            for v in mism.values()
        )
        results[f"octave{o}"] = dict(
            ok=mask_eq and not mism, valid_mask_equal=mask_eq,
            rows=rows, mismatches=mism,
            compile_plain_s=round(t_plain_compile, 1),
            compile_resident_s=round(t_res_compile, 1),
        )
        print(f"[octave {o}] rows={rows} mask_eq={mask_eq} "
              f"mism={mism}", flush=True)

    # timing on octave 0 (the dominant one)
    dog = dogs[0]
    h_o, w_o = dog.shape[-2:]
    cap = min(caps.scaled_candidates(0), 3 * h_o * w_o)
    layer, yy, xx, cv = extract_candidates(
        dog, cfg.image_border_width, thresh, cap
    )
    fn_plain = jax.jit(functools.partial(
        localize_candidates_chunked, octave=0, cfg=cfg))
    fn_res = jax.jit(functools.partial(
        _localize_resident, octave=0, cfg=cfg))
    timing = {}
    for name, fn in (("plain", fn_plain), ("resident", fn_res)):
        try:
            out = fn(dog, layer, yy, xx, cv)
            jax.block_until_ready(out)
        except Exception:  # noqa: BLE001 — reported above
            continue
        reps = 30
        t0 = time.time()
        for _ in range(reps):
            out = fn(dog, layer, yy, xx, cv)
        jax.block_until_ready(out)
        timing[name] = round((time.time() - t0) / reps * 1e3, 3)
        print(f"[time] {name}: {timing[name]} ms (octave 0, "
              f"cap={cap}, live={int(np.asarray(cv).sum())})", flush=True)

    _record("newton", dict(
        per_octave=results, total_valid_rows=total_rows,
        total_mismatches=total_mismatch, timing_ms_octave0=timing,
        live_octave0=int(np.asarray(cv).sum()), cap_octave0=int(cap),
    ))




def fused():
    """Fused-regime A/B: extract prefix through localize, 6-image group.

    Same harness as scripts/probe_localize_slim_r4.py (extrema / plain /
    resident interleaved rounds) so numbers are directly comparable to
    docs/PROBE_LOCALIZE_SLIM_r04.json.
    """
    import statistics

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
        localize_candidates_chunked, localize_candidates_resident,
    )

    base_cfg = StitchConfig(backend="sift").sift
    caps = base_cfg.capacities
    data = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")
    group = int(os.environ.get("VFX_PROBE_GROUP", "6"))
    reps = int(os.environ.get("VFX_PROBE_REPS", "8"))
    n_rounds = int(os.environ.get("VFX_PROBE_ROUNDS", "5"))

    folder = os.path.join(data, "parrington")
    paths, focals = read_pano_data(os.path.join(folder, "pano.txt"))
    paths = paths[:group]
    imgs = np.stack([
        load_bgr(resolve_image_path(p, folder)) for p in paths
    ]).astype(np.uint8)
    cyl = cylindrical_project_batch(jnp.asarray(imgs), tuple(focals[:group]))
    grays = jax.jit(jax.vmap(bgr_to_gray_f32))(cyl)
    jax.block_until_ready(grays)

    probe_base_shape = (grays.shape[1] * 2, grays.shape[2] * 2)
    num_octaves = compute_number_of_octaves(probe_base_shape)
    kernels = generate_gaussian_kernels(
        base_cfg.sigma, base_cfg.num_intervals)
    thresh = extrema_threshold(
        base_cfg.contrast_threshold, base_cfg.num_intervals)

    def _reduce(*arrs):
        tot = jnp.float32(0)
        for a in arrs:
            tot = tot + jnp.sum(a.astype(jnp.float32))
        return tot

    def prefix_one(gray, mode):
        base = generate_base_image(
            gray, base_cfg.sigma, base_cfg.assumed_blur)
        pyramid = generate_gaussian_images(base, num_octaves, kernels)
        dogs = generate_dog_images(pyramid)
        acc = jnp.float32(0)
        for o in range(num_octaves):
            dog = dogs[o]
            h_o, w_o = dog.shape[-2:]
            cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
            layer, y, x, cand_valid = extract_candidates(
                dog, base_cfg.image_border_width, thresh, cand_cap)
            if mode == "extrema":
                acc += _reduce(layer, y, x, cand_valid)
                continue
            loc_fn = (localize_candidates_resident if mode == "resident"
                      else localize_candidates_chunked)
            loc = loc_fn(dog, layer, y, x, cand_valid, o, base_cfg)
            acc += _reduce(
                loc.x, loc.y, loc.layer, loc.pt_x, loc.pt_y, loc.size,
                loc.response, loc.octave_packed, loc.valid,
                loc.jx, loc.jy, loc.jl,
            )
        return acc

    def _drain(out):
        # axon's block_until_ready returns before remote execution
        # finishes; a 1-element device_get is the real barrier (same
        # pattern as every other probe in scripts/)
        np.asarray(jax.device_get(out.ravel()[:1]))

    fns, compile_s = {}, {}
    for name in ("extrema", "plain", "resident"):
        fn = jax.jit(functools.partial(
            lambda g, m: jnp.sum(
                jax.lax.map(lambda im: prefix_one(im, m), g)), m=name))
        t0 = time.time()
        out = fn(grays)
        _drain(out)
        compile_s[name] = round(time.time() - t0, 1)
        fns[name] = fn
        print(f"[compile] {name}: {compile_s[name]}s", flush=True)

    rounds = {name: [] for name in fns}
    for r in range(n_rounds):
        for name, fn in fns.items():
            out = fn(grays)
            _drain(out)
            t0 = time.time()
            for _ in range(reps):
                out = fn(grays)
            _drain(out)
            dt = (time.time() - t0) / reps / group * 1e3
            rounds[name].append(round(dt, 3))
            print(f"[round {r}] {name}: {dt:.3f} ms/img", flush=True)

    summary = {n: round(statistics.median(v), 3) for n, v in rounds.items()}
    _record("fused_ab", dict(
        group=group, reps=reps, n_rounds=n_rounds, compile_s=compile_s,
        summary_ms_per_img=summary,
        derived=dict(
            loc_cum_plain=round(summary["plain"] - summary["extrema"], 3),
            loc_cum_resident=round(
                summary["resident"] - summary["extrema"], 3),
            resident_saving_ms_per_img=round(
                summary["plain"] - summary["resident"], 3),
        ),
        rounds_ms_per_img=rounds,
    ))


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "feas1"
    {"feas1": feas1, "feas2": feas2, "newton": newton, "fused": fused}[phase]()


if __name__ == "__main__":
    main()
