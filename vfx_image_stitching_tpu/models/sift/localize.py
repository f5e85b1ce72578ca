"""Batched subpixel localization via masked Newton iterations.

Parity with ``localize_extremum_via_quadratic_fit`` (sift_impl.py:169-211)
including its quirks:
  * at most 5 iterations; convergence = all |update| < 0.5 *before* moving;
  * a candidate that exhausts the iterations without converging is still
    accepted, with (x, y, layer) from its *last move* but cube/grad/update
    from the last *compute* (the loop falls through at sift_impl.py:195);
  * moves are banker's-rounded; a move out of bounds rejects the point;
  * contrast then 2x2-Hessian edge tests on the stored state;
  * ``kp.octave`` packs octave + layer<<8 + round((offset+0.5)*255)<<16.

TPU layout: everything is a *transposed* structure-of-arrays — the cube
is (27, K), gradients/Hessian entries are separate (K,) lanes — because
arrays with tiny trailing dims like (K, 3, 3) pad the last dimension to
the 128-lane register width and waste ~40x of the VPU.  The cube gather
is one flat (27*K,) gather from the flattened DoG stack.

The reference solves with ``np.linalg.lstsq``; here a closed-form
adjugate solve (the Hessian is essentially never singular at an extremum;
a zero-determinant candidate gets update=0 and dies in the contrast test
— a measured-immaterial deviation).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig


class Localized(NamedTuple):
    x: jnp.ndarray          # i32 final column
    y: jnp.ndarray          # i32 final row
    layer: jnp.ndarray      # i32 final layer in [1, num_intervals]
    pt_x: jnp.ndarray       # f32 keypoint coords at base-image scale
    pt_y: jnp.ndarray
    size: jnp.ndarray       # f32
    response: jnp.ndarray   # f32
    octave_packed: jnp.ndarray  # i32
    valid: jnp.ndarray      # bool
    # last-COMPUTE cell of the Newton loop: where the final cube/grad/
    # Hessian were evaluated.  For a converged candidate this equals
    # (x, y, layer); for the reference's accepted-non-converged quirk
    # (sift_impl.py:175-195) the loop moves AFTER the final compute, so
    # the accept tests and sub-pixel update come from this cell while
    # the position comes from (x, y).  The strict host re-derivation
    # (models/sift/strict.py) needs both.
    jx: jnp.ndarray         # i32
    jy: jnp.ndarray         # i32
    jl: jnp.ndarray         # i32


def _cube_gather(dog_flat: jnp.ndarray, offsets: jnp.ndarray,
                 l: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray,
                 w: int, hw: int) -> jnp.ndarray:
    """(27, K) cube around (l, y, x) from the flattened (5*H*W,) DoG."""
    center = l * hw + y * w + x            # (K,)
    idx = center[None, :] + offsets[:, None]
    return dog_flat[idx]                    # (27, K)


def _cube_gather_slices(dog: jnp.ndarray, l: jnp.ndarray, y: jnp.ndarray,
                        x: jnp.ndarray) -> jnp.ndarray:
    """(27, K) cube via K (1,3,3)-slice gathers instead of 27K scalars.

    Same elements as :func:`_cube_gather` for interior indices (l in
    [1, 3], y in [1, h-2], x in [1, w-2]; filler rows differ — lax.gather
    clamps, flat indexing wraps — but they are cand_valid=False and
    masked downstream).  REFUTED on chip: 27.97 vs 5.45 ms/img on the
    fused localize prefix (5/5 interleaved rounds, docs/DEVNOTES.md) —
    TPU gather of many tiny multi-dim slices is ~5x slower than the
    flat scalar gather, not faster.  Kept for the record behind
    VFX_CUBE_SLICE_GATHER=1.
    """
    starts = jnp.stack([l - 1, y - 1, x - 1], axis=-1)       # (K, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    out = jax.lax.gather(dog, starts, dn, slice_sizes=(3, 3, 3))
    return out.reshape(out.shape[0], 27).T                   # (27, K)


def _derivatives(cube: jnp.ndarray):
    """Gradient (3 lanes) and Hessian (6 unique lanes) from a (27, K) cube.

    Cube index order is (dl, dy, dx) row-major: flat = (dl+1)*9 + (dy+1)*3
    + (dx+1).  Central differences per sift_impl.py:217-240.
    """
    def c(dl, dy, dx):
        return cube[(dl + 1) * 9 + (dy + 1) * 3 + (dx + 1)]

    gx = 0.5 * (c(0, 0, 1) - c(0, 0, -1))
    gy = 0.5 * (c(0, 1, 0) - c(0, -1, 0))
    gs = 0.5 * (c(1, 0, 0) - c(-1, 0, 0))
    v = c(0, 0, 0)
    dxx = c(0, 0, 1) - 2 * v + c(0, 0, -1)
    dyy = c(0, 1, 0) - 2 * v + c(0, -1, 0)
    dss = c(1, 0, 0) - 2 * v + c(-1, 0, 0)
    dxy = 0.25 * (c(0, 1, 1) - c(0, 1, -1) - c(0, -1, 1) + c(0, -1, -1))
    dxs = 0.25 * (c(1, 0, 1) - c(1, 0, -1) - c(-1, 0, 1) + c(-1, 0, -1))
    dys = 0.25 * (c(1, 1, 0) - c(1, -1, 0) - c(-1, 1, 0) + c(-1, -1, 0))
    return (gx, gy, gs), (dxx, dyy, dss, dxy, dxs, dys), v


def _solve3(h, g):
    """Closed-form symmetric 3x3 solve, all-lane arithmetic.

    H = [[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]]; returns
    ``-H^-1 g`` (the Newton update) and the determinant.
    """
    (dxx, dyy, dss, dxy, dxs, dys) = h
    (gx, gy, gs) = g
    c00 = dyy * dss - dys * dys
    c01 = dys * dxs - dxy * dss
    c02 = dxy * dys - dyy * dxs
    det = dxx * c00 + dxy * c01 + dxs * c02
    c11 = dxx * dss - dxs * dxs
    c12 = dxy * dxs - dxx * dys
    c22 = dxx * dyy - dxy * dxy
    ux = c00 * gx + c01 * gy + c02 * gs
    uy = c01 * gx + c11 * gy + c12 * gs
    us = c02 * gx + c12 * gy + c22 * gs
    ok = jnp.abs(det) > 1e-30
    safe = jnp.where(ok, det, 1.0)
    return (
        jnp.where(ok, -ux / safe, 0.0),
        jnp.where(ok, -uy / safe, 0.0),
        jnp.where(ok, -us / safe, 0.0),
    )


def _init_state(layer: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> dict:
    """Fresh Newton state (a dict of (K,) lanes) at integer candidates."""
    k = layer.shape[0]
    zeros = jnp.zeros((k,), jnp.float32)
    return dict(
        x=x, y=y, l=layer,
        cx=x, cy=y, cl=layer,
        ux=zeros, uy=zeros, us=zeros,
        gx=zeros, gy=zeros, gs=zeros,
        dxx=zeros, dyy=zeros, dss=zeros, dxy=zeros, dxs=zeros, dys=zeros,
        center=zeros,
        converged=jnp.zeros((k,), bool),
        rejected=jnp.zeros((k,), bool),
    )


def _make_newton_body(dog: jnp.ndarray, cfg: SiftConfig):
    """One masked Newton iteration (fori_loop body) over a state dict."""
    h, w = dog.shape[-2:]
    hw = h * w
    border = cfg.image_border_width
    dog_flat = dog.reshape(-1)

    import numpy as np

    offs = np.array(
        [dl * hw + dy * w + dx
         for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        dtype=np.int32,
    )
    offsets = jnp.asarray(offs)

    import os

    slice_gather = os.environ.get("VFX_CUBE_SLICE_GATHER", "0") == "1"

    def body(_t, st):
        active = ~(st["converged"] | st["rejected"])
        if slice_gather:
            cube = _cube_gather_slices(dog, st["l"], st["y"], st["x"])
        else:
            cube = _cube_gather(
                dog_flat, offsets, st["l"], st["y"], st["x"], w, hw
            )
        cube = cube.astype(jnp.float32) / 255.0
        (gx, gy, gs), hess, center = _derivatives(cube)
        ux, uy, us = _solve3(hess, (gx, gy, gs))
        (dxx, dyy, dss, dxy, dxs, dys) = hess

        def keep(new, old):
            return jnp.where(active, new, old)

        out = dict(st)
        for name, new in [
            ("ux", ux), ("uy", uy), ("us", us),
            ("gx", gx), ("gy", gy), ("gs", gs),
            ("dxx", dxx), ("dyy", dyy), ("dss", dss),
            ("dxy", dxy), ("dxs", dxs), ("dys", dys),
            ("center", center),
        ]:
            out[name] = keep(new, st[name])

        conv_now = (
            (jnp.abs(ux) < 0.5) & (jnp.abs(uy) < 0.5) & (jnp.abs(us) < 0.5)
        )
        out["converged"] = st["converged"] | (active & conv_now)
        # remember where this compute happened (pre-move cell)
        out["cx"] = keep(st["x"], st["cx"])
        out["cy"] = keep(st["y"], st["cy"])
        out["cl"] = keep(st["l"], st["cl"])

        moving = active & ~conv_now
        nx = st["x"] + jnp.rint(ux).astype(jnp.int32)
        ny = st["y"] + jnp.rint(uy).astype(jnp.int32)
        nl = st["l"] + jnp.rint(us).astype(jnp.int32)
        oob = (
            (ny < border) | (ny >= h - border)
            | (nx < border) | (nx >= w - border)
            | (nl < 1) | (nl > cfg.num_intervals)
        )
        out["rejected"] = st["rejected"] | (moving & oob)
        out["x"] = jnp.where(moving, jnp.clip(nx, 1, w - 2), st["x"])
        out["y"] = jnp.where(moving, jnp.clip(ny, 1, h - 2), st["y"])
        out["l"] = jnp.where(moving, jnp.clip(nl, 1, cfg.num_intervals), st["l"])
        return out

    return body


def _make_newton_slim(dog: jnp.ndarray, cfg: SiftConfig):
    """Early-exit Newton loop over a SLIM 9-lane state.

    The plain body (:func:`_make_newton_body`) carries 13 result lanes
    (gradient, Hessian, update, center) through every iteration purely
    so finalization can read the LAST-COMPUTE values — 13 masked selects
    per iteration whose payload is recomputable.  Here the loop carries
    position/flag lanes plus the Newton update (x, y, l, cx, cy, cl,
    ux, uy, us, converged, rejected, alive) and the gradient/Hessian/
    center lanes are re-derived ONCE after the loop by regathering the
    cube at the recorded last-compute cell (cl, cy, cx).  Those
    re-derivations are bit-stable across graphs (pure subtract /
    exact-power-of-two scalings of the same cube — no FMA-contractible
    chains), and the stored update makes every position / size /
    packed-octave output bit-identical to the plain path.  The update
    is STORED rather than re-derived because ``_solve3``'s cofactor
    chains DO contract differently between executables (measured 1-ulp
    wobble); the one output still exposed to that effect is
    ``response`` (its ``val`` dot product is evaluated per-graph),
    measured <= 1 ulp on 2/57 rows.

    The loop is a ``while_loop`` that stops as soon as every REAL row
    (``alive`` = cand_valid) has converged or rejected — the reference
    loop (sift_impl.py:175-195) runs per-point until convergence, so
    stopping a chunk when its last real row settles is exact; only
    filler-row garbage differs from the fixed 5-iteration path (same
    class of difference as the split-mover path, masked downstream).
    Under vmap the trip count becomes the batch max, still <= 5.

    Returns ``(run, finalize)``: ``run(state) -> state`` executes the
    loop; ``finalize(state, cand_valid, octave) -> Localized``.
    """
    h, w = dog.shape[-2:]
    hw = h * w
    border = cfg.image_border_width
    dog_flat = dog.reshape(-1)

    import numpy as np

    offs = np.array(
        [dl * hw + dy * w + dx
         for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        dtype=np.int32,
    )
    offsets = jnp.asarray(offs)

    def _cube_at(l, yy, xx):
        cube = _cube_gather(dog_flat, offsets, l, yy, xx, w, hw)
        return cube.astype(jnp.float32) / 255.0

    def cond(carry):
        t, st = carry
        settled = st["converged"] | st["rejected"]
        return (t < cfg.max_localize_iters) & jnp.any(st["alive"] & ~settled)

    def body(carry):
        t, st = carry
        active = ~(st["converged"] | st["rejected"])
        (gx, gy, gs), hess, _ = _derivatives(
            _cube_at(st["l"], st["y"], st["x"])
        )
        ux, uy, us = _solve3(hess, (gx, gy, gs))
        conv_now = (
            (jnp.abs(ux) < 0.5) & (jnp.abs(uy) < 0.5) & (jnp.abs(us) < 0.5)
        )
        out = dict(st)
        out["converged"] = st["converged"] | (active & conv_now)
        out["cx"] = jnp.where(active, st["x"], st["cx"])
        out["cy"] = jnp.where(active, st["y"], st["cy"])
        out["cl"] = jnp.where(active, st["l"], st["cl"])
        out["ux"] = jnp.where(active, ux, st["ux"])
        out["uy"] = jnp.where(active, uy, st["uy"])
        out["us"] = jnp.where(active, us, st["us"])
        moving = active & ~conv_now
        nx = st["x"] + jnp.rint(ux).astype(jnp.int32)
        ny = st["y"] + jnp.rint(uy).astype(jnp.int32)
        nl = st["l"] + jnp.rint(us).astype(jnp.int32)
        oob = (
            (ny < border) | (ny >= h - border)
            | (nx < border) | (nx >= w - border)
            | (nl < 1) | (nl > cfg.num_intervals)
        )
        out["rejected"] = st["rejected"] | (moving & oob)
        out["x"] = jnp.where(moving, jnp.clip(nx, 1, w - 2), st["x"])
        out["y"] = jnp.where(moving, jnp.clip(ny, 1, h - 2), st["y"])
        out["l"] = jnp.where(
            moving, jnp.clip(nl, 1, cfg.num_intervals), st["l"]
        )
        return (t + 1, out)

    def run(st):
        return jax.lax.while_loop(cond, body, (jnp.int32(0), st))[1]

    def finalize(st, cand_valid, octave):
        (gx, gy, gs), hess, center = _derivatives(
            _cube_at(st["cl"], st["cy"], st["cx"])
        )
        (dxx, dyy, dss, dxy, dxs, dys) = hess
        full = dict(
            st, gx=gx, gy=gy, gs=gs,
            dxx=dxx, dyy=dyy, dss=dss, dxy=dxy, dxs=dxs, dys=dys,
            center=center,
        )
        return _finalize_localized(full, cand_valid, octave, cfg)

    return run, finalize


def _init_state_slim(layer, y, x, alive):
    k = layer.shape[0]
    zeros = jnp.zeros((k,), jnp.float32)
    return dict(
        x=x, y=y, l=layer, cx=x, cy=y, cl=layer, alive=alive,
        ux=zeros, uy=zeros, us=zeros,
        converged=jnp.zeros((k,), bool), rejected=jnp.zeros((k,), bool),
    )


def localize_candidates_chunked_slim(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
    chunk: int = 512,
) -> Localized:
    """Live-chunked localization via the slim early-exit Newton loop.

    Valid-row output is bit-identical to :func:`localize_candidates_chunked`
    (pinned by tests/test_sift.py); only filler-row garbage differs.
    """
    k = layer.shape[0]
    if k <= chunk:
        chunk = k
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k

    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )

    run, finalize = _make_newton_slim(dog, cfg)
    n_chunks = k // chunk
    reshaped = (
        layer.reshape(n_chunks, chunk), y.reshape(n_chunks, chunk),
        x.reshape(n_chunks, chunk), cand_valid.reshape(n_chunks, chunk),
    )
    zf = jnp.zeros((n_chunks, chunk), jnp.float32)
    zi = jnp.zeros((n_chunks, chunk), jnp.int32)
    out_zeros = Localized(
        x=zi, y=zi, layer=zi, pt_x=zf, pt_y=zf, size=zf,
        response=zf, octave_packed=zi,
        valid=jnp.zeros((n_chunks, chunk), bool),
        jx=zi, jy=zi, jl=zi,
    )

    def body_fn(i):
        l_c, y_c, x_c, v_c = index_chunk(reshaped, i)
        st = run(_init_state_slim(l_c, y_c, x_c, v_c))
        return finalize(st, v_c, octave)

    out = chunked_live_loop(
        live_chunk_bound(cand_valid, chunk), body_fn, out_zeros
    )
    return Localized(*[f.reshape(k) for f in out])


def localize_candidates(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
) -> Localized:
    """Run the masked Newton loop for all candidates of one octave."""
    body = _make_newton_body(dog, cfg)
    st = jax.lax.fori_loop(
        0, cfg.max_localize_iters, body, _init_state(layer, y, x)
    )
    return _finalize_localized(st, cand_valid, octave, cfg)


def _finalize_localized(
    st: dict, cand_valid: jnp.ndarray, octave: int, cfg: SiftConfig
) -> Localized:
    """Accept tests + output packing from a finished Newton state."""
    val = st["center"] + 0.5 * (
        st["gx"] * st["ux"] + st["gy"] * st["uy"] + st["gs"] * st["us"]
    )
    contrast_ok = jnp.abs(val) * cfg.num_intervals >= cfg.contrast_threshold

    tr = st["dxx"] + st["dyy"]
    det2 = st["dxx"] * st["dyy"] - st["dxy"] * st["dxy"]
    er = cfg.eigen_ratio
    edge_ok = (det2 > 0) & (er * tr * tr < ((er + 1.0) ** 2) * det2)

    valid = cand_valid & ~st["rejected"] & contrast_ok & edge_ok

    xs, ys, ls = st["x"], st["y"], st["l"]
    scale_o = jnp.float32(2.0**octave)
    pt_x = (xs.astype(jnp.float32) + st["ux"]) * scale_o
    pt_y = (ys.astype(jnp.float32) + st["uy"]) * scale_o
    octave_packed = (
        octave
        + ls * 256
        + jnp.rint((st["us"] + 0.5) * 255.0).astype(jnp.int32) * 65536
    ).astype(jnp.int32)
    size = (
        cfg.sigma
        * jnp.exp2((ls.astype(jnp.float32) + st["us"]) / cfg.num_intervals)
        * (2.0 ** (octave + 1))
    )
    return Localized(
        x=xs, y=ys, layer=ls,
        pt_x=pt_x, pt_y=pt_y, size=size,
        response=jnp.abs(val), octave_packed=octave_packed, valid=valid,
        jx=st["cx"], jy=st["cy"], jl=st["cl"],
    )


def localize_candidates_chunked(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
    chunk: int = 512,
) -> Localized:
    """`localize_candidates` over the live leading chunks only.

    Candidate capacities are audited worst-case and `extract_candidates`
    compacts real candidates to the front, so the tail chunks of a
    typical image are pure filler — the loop's trip count is the live
    chunk bound (vmap-safe, unlike the earlier per-chunk cond: see
    models/sift/chunking.py).  Semantics are unchanged: filler rows come
    out ``valid=False`` either way.
    """
    k = layer.shape[0]
    if k <= chunk:
        chunk = k  # single chunk — still worth the live bound: tail
        #            octaves of a typical image have zero candidates
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k

    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )

    n_chunks = k // chunk
    reshaped = (
        layer.reshape(n_chunks, chunk), y.reshape(n_chunks, chunk),
        x.reshape(n_chunks, chunk), cand_valid.reshape(n_chunks, chunk),
    )
    zf = jnp.zeros((n_chunks, chunk), jnp.float32)
    zi = jnp.zeros((n_chunks, chunk), jnp.int32)
    out_zeros = Localized(
        x=zi, y=zi, layer=zi, pt_x=zf, pt_y=zf, size=zf,
        response=zf, octave_packed=zi,
        valid=jnp.zeros((n_chunks, chunk), bool),
        jx=zi, jy=zi, jl=zi,
    )

    def body_fn(i):
        l_c, y_c, x_c, v_c = index_chunk(reshaped, i)
        return localize_candidates(dog, l_c, y_c, x_c, v_c, octave, cfg)

    out = chunked_live_loop(
        live_chunk_bound(cand_valid, chunk), body_fn, out_zeros
    )
    return Localized(*[f.reshape(k) for f in out])


def compact_localized(loc: Localized, out_capacity: int) -> Localized:
    """Keep valid candidates (original order) in ``out_capacity`` slots.

    The raw candidate capacity is sized for the worst-case *extrema*
    count, but only a fraction survives localization; compacting before
    the window-heavy orientation/descriptor stages cuts their work
    proportionally.  Relative order of valid rows is preserved, so the
    downstream tie-break order matches the reference.
    """
    k = loc.x.shape[0]
    rank = jnp.where(loc.valid, jnp.arange(k, dtype=jnp.int32),
                     jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(rank)[:out_capacity]
    out = Localized(*[f[order] for f in loc])
    return out._replace(valid=loc.valid[order])


def localize_candidates_split_chunked(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
    chunk: int = 512,
) -> Localized:
    """Newton localization with mover compaction after iteration 1.

    The reference loop (sift_impl.py:175-195) runs up to 5 iterations,
    but measured convergence is front-loaded: 75% of candidates
    converge or reject at iteration 1 (host audit over parrington, see
    docs/DEVNOTES.md "Fused-regime extractor attribution").  The masked
    full-width loop in :func:`localize_candidates_chunked` still pays 5
    full gathers + lane passes for them.

    Here: iteration 1 runs over the live candidate chunks at full
    width, then the still-ACTIVE rows ("movers") are compacted to the
    front and the remaining ``max_localize_iters - 1`` iterations run
    only over the live mover chunks (~4x fewer).  Per-row arithmetic is
    identical — a converged/rejected row never changes state in the
    masked loop, so skipping it is exact; the compaction permutation is
    inverted before finalization, so row order (and therefore every
    downstream tie-break) is preserved.  The valid mask and every field
    of a valid row are bit-identical to the plain chunked path; only
    the garbage content of cand_valid=False filler rows inside live
    chunks differs (the plain path keeps iterating them, this one stops
    after iteration 1 — they are masked everywhere downstream).  Rows
    in dead candidate chunks are re-zeroed to match the plain path.
    """
    k = layer.shape[0]
    if k <= chunk:
        chunk = k
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k

    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )

    body = _make_newton_body(dog, cfg)
    n_chunks = k // chunk
    reshaped = (
        layer.reshape(n_chunks, chunk), y.reshape(n_chunks, chunk),
        x.reshape(n_chunks, chunk),
    )
    state_zeros = jax.tree.map(
        lambda f: jnp.zeros((n_chunks,) + f.shape, f.dtype),
        _init_state(layer[:chunk], y[:chunk], x[:chunk]),
    )

    def first_iter(i):
        l_c, y_c, x_c = index_chunk(reshaped, i)
        return body(0, _init_state(l_c, y_c, x_c))

    n_live = live_chunk_bound(cand_valid, chunk)
    st = chunked_live_loop(n_live, first_iter, state_zeros)
    st = jax.tree.map(lambda f: f.reshape((k,) + f.shape[2:]), st)

    # compact movers (still-active valid rows) to the front, original
    # order preserved on both sides of the split.  Sort-free: cumsum
    # destinations + one i32 scatter build the same stable permutation
    # an argsort of the mover rank would (TPU sorts at K=4096 cost more
    # than the Newton work this split saves — measured r3e).
    mover = cand_valid & ~(st["converged"] | st["rejected"])
    arange = jnp.arange(k, dtype=jnp.int32)
    mov_i = mover.astype(jnp.int32)
    n_mov = jnp.sum(mov_i)
    pos_m = jnp.cumsum(mov_i) - 1          # slot among movers
    pos_n = arange - pos_m - 1             # slot among non-movers
    dest = jnp.where(mover, pos_m, n_mov + pos_n)   # row i -> slot dest[i]
    order = jnp.zeros((k,), jnp.int32).at[dest].set(arange)
    st_p = jax.tree.map(lambda f: f[order], st)
    st_p = jax.tree.map(lambda f: f.reshape((n_chunks, chunk)), st_p)

    def rest_iters(i):
        return jax.lax.fori_loop(
            0, cfg.max_localize_iters - 1, body, index_chunk(st_p, i)
        )

    st_b = chunked_live_loop((n_mov + chunk - 1) // chunk, rest_iters, st_p)

    # dest is the inverse permutation of order: unpermute by gathering
    st = jax.tree.map(lambda f: f.reshape((k,))[dest], st_b)
    out = _finalize_localized(st, cand_valid, octave, cfg)
    # dead candidate chunks were never processed in the plain path —
    # zero them so both paths are bit-identical in every row
    in_live = arange < n_live * chunk
    return Localized(*[
        jnp.where(in_live, f, jnp.zeros_like(f)) for f in out
    ])


def localize_candidates_resident(
    dog: jnp.ndarray,
    layer: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    cand_valid: jnp.ndarray,
    octave: int,
    cfg: SiftConfig,
    chunk: int = 256,
) -> Localized:
    """VMEM-resident scalar-Newton localization (Pallas kernel).

    The whole DoG octave stack lives in VMEM for one kernel that runs
    the full Newton loop per candidate on the scalar core with true
    early exit — no per-iteration XLA dispatch, no per-iteration HBM
    gather (docs/PROBE_LOCALIZE_RESIDENT_r04.json: -49% vs the plain
    path in the fused extract prefix).

    Parity: the kernel's scalar-core solve contracts FMAs differently
    from the VPU, wobbling its ux/uy/us by <=1 ulp — enough to flip a
    knife-edge rint downstream (docs/RESIDENT_E2E_r04.json, first
    attempt: grail diverged).  So ONLY the kernel's integer convergence
    state (final cell, last-compute cell, converged/rejected — probed
    bit-identical) is consumed; every float lane is re-derived in XLA
    by re-gathering the 3x3x3 cube at the last-compute cell and running
    the stock :func:`_derivatives` + :func:`_solve3`, per live chunk in
    a ``chunked_live_loop`` mirroring the plain path's structure.  The
    recompute costs ~1 plain iteration over live chunks vs the >=5 the
    kernel saves.  Valid-row bit-identity with
    :func:`localize_candidates_chunked` is pinned by tests/test_sift.py
    and end-to-end byte parity on all four datasets by
    scripts/verify_resident_e2e.py.  Octaves with h < 16 (which carry
    no candidates at border width 5 anyway) fall back to the plain
    path.
    """
    h = dog.shape[-2]
    if h < 16:
        return localize_candidates_chunked(
            dog, layer, y, x, cand_valid, octave, cfg
        )

    from vfx_image_stitching_tpu.models.sift.chunking import (
        chunked_live_loop,
        index_chunk,
        live_chunk_bound,
    )
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        localize_newton_resident,
    )

    k = layer.shape[0]
    if k <= chunk:
        chunk = k
    elif k % chunk:
        import math

        chunk = math.gcd(k, chunk) or k

    n_live = live_chunk_bound(cand_valid, chunk)
    _outf, outi = localize_newton_resident(
        dog, layer, y, x, cand_valid, n_live,
        cfg.image_border_width, cfg.num_intervals,
        cfg.max_localize_iters, chunk,
    )

    hh, w = dog.shape[-2:]
    hw = hh * w
    dog_flat = dog.reshape(-1)

    import numpy as np

    offs = np.array(
        [dl * hw + dy * w + dx
         for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        dtype=np.int32,
    )
    offsets = jnp.asarray(offs)

    n_chunks = k // chunk
    reshaped = tuple(
        outi[:, c].reshape(n_chunks, chunk) for c in range(8)
    ) + (cand_valid.reshape(n_chunks, chunk),)
    zf = jnp.zeros((n_chunks, chunk), jnp.float32)
    zi = jnp.zeros((n_chunks, chunk), jnp.int32)
    out_zeros = Localized(
        x=zi, y=zi, layer=zi, pt_x=zf, pt_y=zf, size=zf,
        response=zf, octave_packed=zi,
        valid=jnp.zeros((n_chunks, chunk), bool),
        jx=zi, jy=zi, jl=zi,
    )

    def body_fn(i):
        xs, ys, ls, cx, cy, cl, conv, rej, v_c = index_chunk(reshaped, i)
        cube = _cube_gather(dog_flat, offsets, cl, cy, cx, w, hw)
        cube = cube.astype(jnp.float32) / 255.0
        (gx, gy, gs), hess, center = _derivatives(cube)
        ux, uy, us = _solve3(hess, (gx, gy, gs))
        (dxx, dyy, dss, dxy, dxs, dys) = hess
        st = dict(
            x=xs, y=ys, l=ls, cx=cx, cy=cy, cl=cl,
            converged=conv != 0, rejected=rej != 0,
            ux=ux, uy=uy, us=us, gx=gx, gy=gy, gs=gs,
            dxx=dxx, dyy=dyy, dss=dss, dxy=dxy, dxs=dxs, dys=dys,
            center=center,
        )
        return _finalize_localized(st, v_c, octave, cfg)

    out = chunked_live_loop(n_live, body_fn, out_zeros)
    return Localized(*[f.reshape(k) for f in out])
