#!/usr/bin/env python
"""Probe: transpose-once MXU scratch-dot descriptor kernel (round-4 lead).

Measures the two unknowns in the DEVNOTES design sketch:
  (a) does an in-kernel (64, 64) transpose compile under Mosaic, and
  (b) what do 8 row-batched (16, 512) @ (512, 8) dots per keypoint cost
      on chip, end to end, vs the XLA one-hot GEMM's ~4.07 ms/img share.

The kernel computes the REAL trilinear descriptor histogram math
(sift_impl.py:459-509 semantics, same formulas as descriptor.py) for the
small bucket (half_cap = 28, 57-wide windows padded to 64): the 2x2 tile
neighborhood is rolled into place exactly like pair_window_gather, the
16 spatial-cell two-hot products are built row-wise on the lhs (mask on
lhs only — a zeroed lhs annihilates any rhs garbage), the orientation
two-hots are built from ONE transposed angle plane on the rhs, and 8
batched dots accumulate the (16, 8) histogram without any HBM one-hot
tensor.

Run CPU (interpret-mode correctness vs a plain-jnp oracle of the same
math):   python scripts/probe_desc_scratch_dot.py cpu
Run chip (compile + timing):
         python scripts/probe_desc_scratch_dot.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 56          # row tile: two tiles cover any 57-row window
TC = 128         # lane tile
SPAD = 64        # padded window extent (57 -> 64: tile-aligned blocks)
WW = 4           # spatial cells per axis
NB = 8           # orientation bins
HALF = 28        # small-bucket half_cap (config.desc_small_half)
S = 2 * HALF + 1


def _kernel(
    # scalar prefetch
    r0_ref, c0_ref, layer_ref, roff_ref, coff_ref, py_ref, px_ref,
    halfw_ref, cos_ref, sin_ref, hw_ref, ang_ref, valid_ref,
    # block-mapped 2x2 tiles
    m00, m01, m10, m11, a00, a01, a10, a11,
    out_ref,
    *, h: int, w: int, precision,
):
    i = pl.program_id(0)
    ro = roff_ref[i]
    co = coff_ref[i]
    sy = r0_ref[i] * TR + ro
    sx = c0_ref[i] * TC + co
    py = py_ref[i]
    px = px_ref[i]
    half_w = halfw_ref[i].astype(jnp.float32)
    cos_a = cos_ref[i]
    sin_a = sin_ref[i]
    hw = hw_ref[i]
    angle = ang_ref[i]
    ok = valid_ref[i] != 0

    def gather(t00, t01, t10, t11):
        top = jnp.concatenate([t00[0], t01[0]], axis=1)
        bot = jnp.concatenate([t10[0], t11[0]], axis=1)
        full = jnp.concatenate([top, bot], axis=0)          # (2TR, 2TC)
        full = pltpu.roll(full, 2 * TR - ro, 0)
        full = pltpu.roll(full, 2 * TC - co, 1)
        return full[:SPAD, :SPAD]

    magw = gather(m00, m01, m10, m11)
    angw = gather(a00, a01, a10, a11)

    rows = sy + jax.lax.broadcasted_iota(jnp.int32, (SPAD, SPAD), 0)
    cols = sx + jax.lax.broadcasted_iota(jnp.int32, (SPAD, SPAD), 1)
    ys = (rows - py).astype(jnp.float32)
    xs = (cols - px).astype(jnp.float32)
    in_win = (jnp.abs(ys) <= half_w) & (jnp.abs(xs) <= half_w)
    in_bounds = (rows > 0) & (rows < h - 1) & (cols > 0) & (cols < w - 1)
    r_rot = xs * sin_a + ys * cos_a
    c_rot = xs * cos_a - ys * sin_a
    r_bin = r_rot / hw + (0.5 * WW - 0.5)
    c_bin = c_rot / hw + (0.5 * WW - 0.5)
    in_bin = (r_bin > -1.0) & (r_bin < WW) & (c_bin > -1.0) & (c_bin < WW)
    mask = in_win & in_bounds & in_bin & ok
    weight_mul = -0.5 / ((0.5 * WW) ** 2)
    weight = jnp.exp(weight_mul * ((r_rot / hw) ** 2 + (c_rot / hw) ** 2))
    wm = jnp.where(mask, weight * magw, 0.0)
    r_bin = jnp.where(mask, r_bin, 0.0)
    c_bin = jnp.where(mask, c_bin, 0.0)
    r0b = jnp.floor(r_bin)
    c0b = jnp.floor(c_bin)
    rf = r_bin - r0b
    cf = c_bin - c0b
    c1 = wm * rf
    c0w = wm - c1
    ra = jnp.clip(r0b + 1.0, 0.0, WW + 1.0)      # lo spatial-row slot
    ca = jnp.clip(c0b + 1.0, 0.0, WW + 1.0)

    # ONE relayout: the orientation planes in transposed (col, row) layout
    angwT = angw.T
    obT = jnp.mod((angwT - angle) * (NB / 360.0), jnp.float32(NB))
    o0T = jnp.floor(obT)
    ofT = obT - o0T
    o1T = jnp.mod(o0T + 1.0, jnp.float32(NB))

    cell = jax.lax.broadcasted_iota(jnp.int32, (2 * NB, SPAD), 0)
    pa = (cell // WW + 1).astype(jnp.float32)    # inner rows 1..4
    pb = (cell % WW + 1).astype(jnp.float32)
    lane_o = jax.lax.broadcasted_iota(
        jnp.int32, (SPAD, NB), 1
    ).astype(jnp.float32)

    acc = jnp.zeros((2 * NB, NB), jnp.float32)
    for b in range(SPAD // 8):
        lhs_rows = []
        rhs_rows = []
        for r in range(b * 8, b * 8 + 8):
            rav = ra[r : r + 1, :]                # (1, SPAD) lanes
            rv = (
                jnp.where(pa == rav, c0w[r : r + 1, :], 0.0)
                + jnp.where(pa == rav + 1.0, c1[r : r + 1, :], 0.0)
            )
            cav = ca[r : r + 1, :]
            cv = (
                jnp.where(pb == cav, 1.0 - cf[r : r + 1, :], 0.0)
                + jnp.where(pb == cav + 1.0, cf[r : r + 1, :], 0.0)
            )
            lhs_rows.append(rv * cv)              # (16, SPAD)
            o0c = o0T[:, r : r + 1]               # (SPAD, 1) sublanes
            ofc = ofT[:, r : r + 1]
            o1c = o1T[:, r : r + 1]
            rhs_rows.append(
                jnp.where(lane_o == o0c, 1.0 - ofc, 0.0)
                + jnp.where(lane_o == o1c, ofc, 0.0)
            )                                     # (SPAD, NB)
        lhs = jnp.concatenate(lhs_rows, axis=1)   # (16, 8*SPAD)
        rhs = jnp.concatenate(rhs_rows, axis=0)   # (8*SPAD, NB)
        acc = acc + jnp.dot(
            lhs, rhs, preferred_element_type=jnp.float32,
            precision=precision,
        )
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("img_h", "img_w", "interpret", "highest")
)
def desc_scratch_dot(
    mag_stack, ang_stack, layer, py, px, half_w, cos_a, sin_a,
    hist_width, angle, valid, img_h, img_w,
    interpret=False, highest=False,
):
    """(K, 16, 8) descriptor histograms via the transpose-once kernel."""
    k = layer.shape[0]
    n_l, hs, ws = mag_stack.shape
    hp = max(hs, S)
    wp = max(ws, S)
    sy = jnp.clip(py - HALF, 0, hp - S).astype(jnp.int32)
    sx = jnp.clip(px - HALF, 0, wp - S).astype(jnp.int32)
    n_tr = hp // TR + 2
    n_tc = wp // TC + 2
    pads = [(0, 0), (0, n_tr * TR - hs), (0, n_tc * TC - ws)]
    mag_stack = jnp.pad(mag_stack, pads)
    ang_stack = jnp.pad(ang_stack, pads)
    r0 = sy // TR
    c0 = sx // TC
    roff = sy - r0 * TR
    coff = sx - c0 * TC

    def tile_spec(tdr, tdc):
        return pl.BlockSpec(
            (1, TR, TC),
            lambda i, r0_ref, c0_ref, layer_ref, *_: (
                layer_ref[i], r0_ref[i] + tdr, c0_ref[i] + tdc
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(k,),
        in_specs=[tile_spec(tdr, tdc) for tdr in (0, 1) for tdc in (0, 1)] * 2,
        out_specs=pl.BlockSpec(
            (1, 2 * NB, NB), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    precision = (
        jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _kernel, h=img_h, w=img_w, precision=precision
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, 2 * NB, NB), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        r0, c0, layer.astype(jnp.int32), roff, coff,
        py.astype(jnp.int32), px.astype(jnp.int32), half_w.astype(jnp.int32),
        cos_a.astype(jnp.float32), sin_a.astype(jnp.float32),
        hist_width.astype(jnp.float32), angle.astype(jnp.float32),
        valid.astype(jnp.int32),
        *([mag_stack.astype(jnp.float32)] * 4),
        *([ang_stack.astype(jnp.float32)] * 4),
    )


def oracle(mag, ang, layer, py, px, half_w, cos_a, sin_a, hw, angle, valid,
           img_h, img_w):
    """Plain-NumPy trilinear histograms, same formulas (f64 interm.)."""
    k = layer.shape[0]
    out = np.zeros((k, 2 * NB, NB), np.float64)
    hs, ws = mag.shape[-2:]
    for i in range(k):
        if not valid[i]:
            continue
        sy = int(np.clip(py[i] - HALF, 0, max(hs, S) - S))
        sx = int(np.clip(px[i] - HALF, 0, max(ws, S) - S))
        for rr in range(S):
            for cc in range(S):
                r_abs, c_abs = sy + rr, sx + cc
                if not (0 < r_abs < img_h - 1 and 0 < c_abs < img_w - 1):
                    continue
                ysv, xsv = r_abs - py[i], c_abs - px[i]
                if abs(ysv) > half_w[i] or abs(xsv) > half_w[i]:
                    continue
                rro = xsv * sin_a[i] + ysv * cos_a[i]
                cro = xsv * cos_a[i] - ysv * sin_a[i]
                rb = rro / hw[i] + 1.5
                cb = cro / hw[i] + 1.5
                if not (-1.0 < rb < WW and -1.0 < cb < WW):
                    continue
                if r_abs >= hs or c_abs >= ws:
                    continue
                wgt = np.exp(-0.125 * ((rro / hw[i]) ** 2 + (cro / hw[i]) ** 2))
                wmv = wgt * mag[layer[i], r_abs, c_abs]
                ob = np.mod((ang[layer[i], r_abs, c_abs] - angle[i])
                            * (NB / 360.0), NB)
                r0b, c0b, o0b = np.floor(rb), np.floor(cb), np.floor(ob)
                rfv, cfv, ofv = rb - r0b, cb - c0b, ob - o0b
                c1v = wmv * rfv
                rav = int(np.clip(r0b + 1, 0, WW + 1))
                cav = int(np.clip(c0b + 1, 0, WW + 1))
                for prow, wr in ((rav, wmv - c1v), (rav + 1, c1v)):
                    if not 1 <= prow <= WW:
                        continue
                    for pcol, wc in ((cav, 1.0 - cfv), (cav + 1, cfv)):
                        if not 1 <= pcol <= WW:
                            continue
                        cell = (prow - 1) * WW + (pcol - 1)
                        out[i, cell, int(o0b) % NB] += wr * wc * (1.0 - ofv)
                        out[i, cell, (int(o0b) + 1) % NB] += wr * wc * ofv
    return out


def make_inputs(rng, k, n_l, hs, ws):
    mag = rng.random((n_l, hs, ws), np.float32) * 100.0
    ang = rng.random((n_l, hs, ws), np.float32) * 360.0
    layer = rng.integers(0, n_l, k)
    py = rng.integers(5, hs - 5, k)
    px = rng.integers(5, ws - 5, k)
    half_w = rng.integers(19, HALF + 1, k)
    theta = rng.random(k) * 2 * np.pi
    hw = (half_w / (np.sqrt(2) * 2.5)).astype(np.float32)
    angle = (rng.random(k) * 360.0).astype(np.float32)
    valid = np.ones(k, np.int64)
    valid[-2:] = 0
    return (mag, ang, layer, py, px, half_w,
            np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32),
            hw, angle, valid)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    rng = np.random.default_rng(7)
    if mode == "cpu":
        k, n_l, hs, ws = 24, 3, 200, 256
        args = make_inputs(rng, k, n_l, hs, ws)
        got = np.asarray(
            desc_scratch_dot(*map(jnp.asarray, args), img_h=hs, img_w=ws,
                             interpret=True)
        )
        want = oracle(*args, img_h=hs, img_w=ws)
        scale = np.abs(want).max() or 1.0
        err = np.abs(got - want).max() / scale
        print(json.dumps({"mode": "cpu-interpret", "k": k,
                          "max_rel_err": float(err)}))
        assert err < 2e-3, err
        return

    k, n_l, hs, ws = 512, 3, 768, 1024
    args = [jnp.asarray(a) for a in make_inputs(rng, k, n_l, hs, ws)]
    results = {"mode": "chip", "k": k}
    for name, highest in (("default", False), ("highest", True)):
        t0 = time.time()
        out = desc_scratch_dot(*args, img_h=hs, img_w=ws, highest=highest)
        np.asarray(out[:1])
        results[f"compile_{name}_s"] = round(time.time() - t0, 1)
        # batched dispatch, one sync: amortizes the tunnel RTT so the
        # per-call figure approximates device time (each call's angle
        # input is perturbed so the backend value cache cannot serve it)
        reps = 20
        for trial in range(3):
            outs = []
            t0 = time.time()
            for rep in range(reps):
                a2 = list(args)
                a2[9] = a2[9] + np.float32(0.001 * (trial * reps + rep + 1))
                outs.append(
                    desc_scratch_dot(*a2, img_h=hs, img_w=ws, highest=highest)
                )
            np.asarray(outs[-1][:1, :1, :1])
            elapsed = time.time() - t0
            best = min(results.get(f"{name}_ms_per_call", 1e9),
                       elapsed / reps * 1e3)
            results[f"{name}_ms_per_call"] = round(best, 3)
        results[f"{name}_us_per_kp"] = round(
            results[f"{name}_ms_per_call"] / k * 1e3, 2
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
