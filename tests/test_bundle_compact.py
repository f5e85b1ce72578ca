"""Escalation-bundle compaction (pipeline/stitch._pack_bundle_esc) tests.

The compact bundle ships keypoint metadata only at rows the strict host
path can ever read (borderline rows + their candidate indices — see the
packer docstring).  These tests run finalize_pairwise_shifts in both
modes (VFX_ESC_COMPACT=1/0) with a recording stand-in for
strict.escalate_pair and assert the compact reconstruction is lossless
exactly where the consumer reads, plus the overflow fallback path.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vfx_image_stitching_tpu.config import StitchConfig
from vfx_image_stitching_tpu.pipeline.stitch import finalize_pairwise_shifts


def _synthetic(seed, n_img=4, kcap=32, n_cand=4):
    rng = np.random.default_rng(seed)
    n1 = n_img - 1
    xy = rng.uniform(0, 100, (n_img, kcap, 2)).astype(np.float32)
    valid_kp = rng.random((n_img, kcap)) < 0.8
    meta = {
        "size": rng.uniform(1, 10, (n_img, kcap)).astype(np.float32),
        "angle": rng.uniform(0, 360, (n_img, kcap)).astype(np.float32),
        "octave": rng.integers(0, 1 << 20, (n_img, kcap)).astype(np.float32),
        "ix": rng.integers(0, 500, (n_img, kcap)).astype(np.int32),
        "iy": rng.integers(0, 500, (n_img, kcap)).astype(np.int32),
        "jx": rng.integers(0, 500, (n_img, kcap)).astype(np.int32),
        "jy": rng.integers(0, 500, (n_img, kcap)).astype(np.int32),
        "jl": rng.integers(1, 4, (n_img, kcap)).astype(np.int32),
    }
    matched = (rng.random((n1, kcap)) < 0.3) & valid_kp[:-1]
    bflip = (rng.random((n1, kcap)) < 0.15) & valid_kp[:-1]
    bswap = (rng.random((n1, kcap)) < 0.15) & valid_kp[:-1]
    borderline = bflip | bswap
    material = borderline & (rng.random((n1, kcap)) < 0.5)
    bestb = rng.integers(0, kcap, (n1, kcap)).astype(np.int32)
    candidx = rng.integers(0, kcap, (n1, kcap, n_cand)).astype(np.int32)
    candinm = rng.random((n1, kcap, n_cand)) < 0.5
    candinm[..., 0] = True  # the best candidate is always in margin
    canddist = rng.uniform(0, 3e4, (n1, kcap, n_cand)).astype(np.float32)
    shifts = rng.normal(0, 5, (n1, 2)).astype(np.float32)
    pair_out = tuple(
        jnp.asarray(a) for a in (
            shifts, shifts + 1, shifts + 2,
            np.ones(n1, bool), matched.sum(1).astype(np.int32),
            bestb, candidx, canddist, candinm, matched, bflip, bswap,
            material, material.sum(1).astype(np.int32),
            np.full(n1, 2, np.int32),
        )
    )
    state = dict(
        xy=xy, valid_kp=valid_kp, meta=meta, matched=matched, bflip=bflip,
        bswap=bswap, material=material, bestb=bestb, candidx=candidx,
        candinm=candinm,
    )
    return state, pair_out


def _run(state, pair_out, monkeypatch, compact, caps=None, threads=False):
    """finalize in the given mode; returns the escalate_pair call args.

    Escalation runs serially by default so the recorded call order is
    the pair order (the threaded pool invokes escalate_pair from worker
    threads in nondeterministic order; results stay ordered because the
    pipeline uses executor.map, but the *call* recording would not be).
    """
    calls = []

    def recorder(cyl_a, cyl_b, xy_a, meta_a, xy_b, meta_b, valid_a,
                 best_b, cand_idx, cand_inm, matched, border_flip,
                 border_swap, material, cfg=None, desc_thresh=0.0,
                 ransac_thresh=0.0):
        calls.append(dict(
            xy_a=xy_a.copy(), xy_b=xy_b.copy(),
            meta_a={k: v.copy() for k, v in meta_a.items()},
            meta_b={k: v.copy() for k, v in meta_b.items()},
            valid_a=valid_a.copy(), best_b=best_b.copy(),
            cand_idx=cand_idx.copy(), cand_inm=cand_inm.copy(),
            matched=matched.copy(), border_flip=border_flip.copy(),
            border_swap=border_swap.copy(), material=material.copy(),
        ))
        return None

    import vfx_image_stitching_tpu.models.sift.strict as strict

    monkeypatch.setattr(strict, "escalate_pair", recorder)
    monkeypatch.setenv("VFX_ESC_COMPACT", "1" if compact else "0")
    monkeypatch.setenv("VFX_ESC_THREADS", "1" if threads else "0")
    if caps:
        monkeypatch.setenv("VFX_ESC_CAP_META", str(caps[0]))
        monkeypatch.setenv("VFX_ESC_CAP_CAND", str(caps[1]))
    n_img = state["xy"].shape[0]
    cyl = jnp.zeros((n_img, 8, 8, 3), jnp.uint8)
    cfg = StitchConfig(backend="sift")
    assert cfg.match().borderline_margin > 0
    out = finalize_pairwise_shifts(
        cyl, jnp.asarray(state["xy"]), jnp.asarray(state["valid_kp"]),
        {k: jnp.asarray(v) for k, v in state["meta"].items()}, None,
        pair_out, [True] * n_img, cfg,
    )
    return calls, out


def _needed_rows(state):
    """Host replica of the packer's needed-meta-row analysis."""
    n_img, kcap = state["valid_kp"].shape
    borderline = state["bflip"] | state["bswap"]
    needed = np.zeros((n_img, kcap), bool)
    n1 = borderline.shape[0]
    for i in range(n1):
        needed[i] |= borderline[i]
        for r in np.nonzero(borderline[i])[0]:
            needed[i + 1, state["bestb"][i, r]] = True
            if state["bswap"][i, r]:
                for c in np.nonzero(state["candinm"][i, r])[0]:
                    needed[i + 1, state["candidx"][i, r, c]] = True
    return needed


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compact_bundle_matches_full_where_read(seed, monkeypatch):
    state, pair_out = _synthetic(seed)
    full_calls, full_out = _run(state, pair_out, monkeypatch, compact=False)
    cmp_calls, cmp_out = _run(state, pair_out, monkeypatch, compact=True)
    assert len(full_calls) == len(cmp_calls) > 0
    needed = _needed_rows(state)
    n1 = state["matched"].shape[0]
    esc_pairs = [i for i in range(n1) if state["material"][i].any()]
    for pair_i, (f, c) in zip(esc_pairs, zip(full_calls, cmp_calls)):
        # full-shape data the host consumes everywhere: exact
        for key in ("xy_a", "xy_b", "valid_a", "best_b", "matched",
                    "border_flip", "border_swap", "material"):
            np.testing.assert_array_equal(f[key], c[key], err_msg=key)
        # metadata: exact at every needed row (zero elsewhere by design)
        for side, img in (("meta_a", pair_i), ("meta_b", pair_i + 1)):
            rows = np.nonzero(needed[img])[0]
            assert rows.size > 0
            for key in f[side]:
                np.testing.assert_array_equal(
                    np.asarray(f[side][key], np.float64)[rows],
                    np.asarray(c[side][key], np.float64)[rows],
                    err_msg=f"{side}.{key} pair {pair_i}",
                )
        # candidate arrays: exact at border-swap rows
        rows = np.nonzero(state["bswap"][pair_i])[0]
        np.testing.assert_array_equal(f["cand_idx"][rows], c["cand_idx"][rows])
        np.testing.assert_array_equal(f["cand_inm"][rows], c["cand_inm"][rows])
    # the finalize outputs (shifts/pairs/counts) agree between modes
    for a, b in zip(full_out, cmp_out):
        np.testing.assert_array_equal(np.asarray(a, object), np.asarray(b, object))


def test_compact_overflow_falls_back_with_warning(monkeypatch):
    import warnings

    state, pair_out = _synthetic(3)
    full_calls, _ = _run(state, pair_out, monkeypatch, compact=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cmp_calls, _ = _run(
            state, pair_out, monkeypatch, compact=True, caps=(4, 2)
        )
    msgs = [str(w.message) for w in caught]
    assert any("meta compaction overflow" in m for m in msgs), msgs
    assert any("candidate compaction overflow" in m for m in msgs), msgs
    # fallback pulls the ORIGINAL full arrays: everything matches exactly
    assert len(full_calls) == len(cmp_calls) > 0
    for f, c in zip(full_calls, cmp_calls):
        for key in ("xy_a", "xy_b", "valid_a", "best_b", "matched",
                    "border_flip", "border_swap", "material",
                    "cand_idx", "cand_inm"):
            np.testing.assert_array_equal(f[key], c[key], err_msg=key)
        for side in ("meta_a", "meta_b"):
            for key in f[side]:
                np.testing.assert_array_equal(
                    np.asarray(f[side][key], np.float64),
                    np.asarray(c[side][key], np.float64),
                    err_msg=f"{side}.{key}",
                )


def test_threaded_escalation_matches_serial(monkeypatch):
    """VFX_ESC_THREADS=1 calls the same pairs with the same data and
    produces identical finalize outputs (executor.map keeps result
    order; only the call-recording order may differ)."""
    state, pair_out = _synthetic(5)
    ser_calls, ser_out = _run(state, pair_out, monkeypatch, compact=True)
    thr_calls, thr_out = _run(
        state, pair_out, monkeypatch, compact=True, threads=True
    )
    assert len(ser_calls) == len(thr_calls) > 1

    def keyed(calls):
        return sorted(calls, key=lambda c: c["xy_a"].tobytes())

    for f, c in zip(keyed(ser_calls), keyed(thr_calls)):
        for key in ("xy_a", "xy_b", "valid_a", "best_b", "matched",
                    "border_flip", "border_swap", "material",
                    "cand_idx", "cand_inm"):
            np.testing.assert_array_equal(f[key], c[key], err_msg=key)
        for side in ("meta_a", "meta_b"):
            for key in f[side]:
                np.testing.assert_array_equal(
                    np.asarray(f[side][key], np.float64),
                    np.asarray(c[side][key], np.float64),
                    err_msg=f"{side}.{key}",
                )
    for a, b in zip(ser_out, thr_out):
        np.testing.assert_array_equal(np.asarray(a, object), np.asarray(b, object))


@pytest.mark.parametrize("n_strips", [2, 5])
def test_bundle_strip_pull_matches_single(n_strips, monkeypatch):
    """VFX_BUNDLE_STRIPS concurrent pull is byte-identical to one fetch."""
    state, pair_out = _synthetic(7)
    one_calls, one_out = _run(state, pair_out, monkeypatch, compact=True)
    monkeypatch.setenv("VFX_BUNDLE_STRIPS", str(n_strips))
    strip_calls, strip_out = _run(state, pair_out, monkeypatch, compact=True)
    assert len(one_calls) == len(strip_calls) > 0
    for f, c in zip(one_calls, strip_calls):
        for key in ("xy_a", "xy_b", "valid_a", "best_b", "matched",
                    "border_flip", "border_swap", "material",
                    "cand_idx", "cand_inm"):
            np.testing.assert_array_equal(f[key], c[key], err_msg=key)
    for a, b in zip(one_out, strip_out):
        np.testing.assert_array_equal(np.asarray(a, object), np.asarray(b, object))
