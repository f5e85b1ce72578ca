"""Speculative compose overlap (finalize_to_panorama): hit + fallback.

The host compose fold can start from the pre-escalation device shifts
while the strict escalation loop runs; if escalation changes any pair
the speculative mosaic must be discarded.  Both branches are pinned
against the non-speculative path (VFX_SPEC_COMPOSE=0).
"""

import numpy as np
import pytest

from vfx_image_stitching_tpu.config import StitchConfig
from vfx_image_stitching_tpu.pipeline import stitch as ST


def _fake_finalize(final_shift, cb_shift):
    """finalize_pairwise_shifts stub: fires the cb with cb_shift, returns
    final_shift (same -> speculative hit; different -> fallback)."""

    def fake(cyl, xy, valid_kp, meta, stats, pair_out, valid, cfg,
             host_images=None, focals=None, timings_out=None,
             pre_escalate_cb=None):
        n = int(cyl.shape[0])
        shifts_np = np.array([cb_shift], np.float64)
        pa = np.array([[5.0, 4.0]])
        pb = np.array([[2.0, 1.0]])
        anym = np.array([True])
        if pre_escalate_cb is not None:
            pre_escalate_cb(shifts_np.copy(), pa.copy(), pb.copy(),
                            anym.copy())
        final = np.array([final_shift], np.float64)
        shifts, pairs = ST._lists_from_arrays(final, pa, pb, anym,
                                              list(valid), n)
        return shifts, pairs, np.array([7])

    return fake


@pytest.mark.parametrize("changed", [False, True])
def test_spec_compose_hit_and_fallback(monkeypatch, changed):
    monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
    rng = np.random.default_rng(0)
    n, h, w = 2, 24, 32
    host_images = [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]
    focals = [100.0, 100.0]
    cyl = np.zeros((n, h, w, 3), np.uint8)
    cfg = StitchConfig(backend="harris")
    cb_shift = (3.0, 1.0)
    final_shift = (5.0, 2.0) if changed else cb_shift

    results = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("VFX_SPEC_COMPOSE", knob)
        monkeypatch.setenv("VFX_HOST_COMPOSE", "1")
        monkeypatch.setattr(
            ST, "finalize_pairwise_shifts",
            _fake_finalize(final_shift, cb_shift),
        )
        out = ST.finalize_to_panorama(
            cyl, None, None, None, None, None, [True] * n, cfg,
            h, w, margin=0, host_images=host_images, focals=focals,
        )
        results[knob] = out

    spec, plain = results["1"], results["0"]
    assert spec.detail.get("spec_compose") == (not changed)
    assert spec.shifts == plain.shifts == [final_shift]
    np.testing.assert_array_equal(spec.mosaic, plain.mosaic)
    np.testing.assert_array_equal(spec.panorama, plain.panorama)


def test_spec_miss_memory_skips_then_reenables(monkeypatch):
    """A dataset whose escalation changed skips speculation next run;
    once it confirms again, speculation re-enables."""
    monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
    rng = np.random.default_rng(1)
    n, h, w = 2, 24, 32
    host_images = [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]
    focals = [100.0, 100.0]
    cyl = np.zeros((n, h, w, 3), np.uint8)
    cfg = StitchConfig(backend="harris")
    monkeypatch.setenv("VFX_SPEC_COMPOSE", "1")
    monkeypatch.setenv("VFX_HOST_COMPOSE", "1")

    def run(final_shift):
        monkeypatch.setattr(
            ST, "finalize_pairwise_shifts",
            _fake_finalize(final_shift, (3.0, 1.0)),
        )
        return ST.finalize_to_panorama(
            cyl, None, None, None, None, None, [True] * n, cfg,
            h, w, margin=0, host_images=host_images, focals=focals,
        )

    # run 1: escalation changes -> miss recorded
    out = run((5.0, 2.0))
    assert out.detail["spec_compose"] is False
    assert len(ST._SPEC_MISS_KEYS) == 1
    # run 2 (same key, still changing): speculation skipped, still correct
    out2 = run((5.0, 2.0))
    assert out2.detail["spec_compose"] is False
    np.testing.assert_array_equal(out.panorama, out2.panorama)
    # run 3: escalation confirms -> key cleared for the next run...
    out3 = run((3.0, 1.0))
    assert out3.detail["spec_compose"] is False  # skipped this time
    assert len(ST._SPEC_MISS_KEYS) == 0
    # ...run 4 speculates again and hits
    out4 = run((3.0, 1.0))
    assert out4.detail["spec_compose"] is True
    np.testing.assert_array_equal(out3.panorama, out4.panorama)
