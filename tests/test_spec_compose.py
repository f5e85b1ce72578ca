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
             pre_escalate_cb=None, bundle=None):
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


def _fake_finalize_multi(pre_shifts, final_shifts, esc_rows, pairs):
    """Multi-pair stub: fires the cb with pre_shifts + esc_rows, returns
    final_shifts (one pair changed -> the snapshot/patch path)."""

    def fake(cyl, xy, valid_kp, meta, stats, pair_out, valid, cfg,
             host_images=None, focals=None, timings_out=None,
             pre_escalate_cb=None, bundle=None):
        n = int(cyl.shape[0])
        pa = np.array([p[0] for p in pairs], np.float64)
        pb = np.array([p[1] for p in pairs], np.float64)
        anym = np.ones(n - 1, bool)
        if pre_escalate_cb is not None:
            pre_escalate_cb(np.array(pre_shifts, np.float64), pa.copy(),
                            pb.copy(), anym.copy(), list(esc_rows))
        shifts, prs = ST._lists_from_arrays(
            np.array(final_shifts, np.float64), pa, pb, anym,
            list(valid), n)
        return shifts, prs, np.arange(n - 1)

    return fake


def test_spec_patch_resumes_prefix(monkeypatch):
    """Escalation changes ONE pair: the speculative prefix fold is
    patched (translated + suffix refold), byte-identical to spec-off."""
    monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
    rng = np.random.default_rng(3)
    n, h, w = 6, 24, 32
    host_images = [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]
    focals = [100.0] * n
    cyl = np.zeros((n, h, w, 3), np.uint8)
    cfg = StitchConfig(backend="harris")
    pre = [(20.0, 1.2), (19.0, -0.8), (21.0, 2.2), (18.0, 1.1),
           (20.0, -1.3)]
    final = list(pre)
    final[3] = (16.0, 2.1)
    pairs = []
    for i, (dx, dy) in enumerate(pre):
        xa, ya = 15 + i, 8 + i
        pairs.append(((float(xa), float(ya)), (xa - dx, ya - round(dy))))

    results = {}
    for knob in ("1", "0"):
        monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
        monkeypatch.setenv("VFX_SPEC_COMPOSE", knob)
        monkeypatch.setenv("VFX_HOST_COMPOSE", "1")
        monkeypatch.setattr(
            ST, "finalize_pairwise_shifts",
            _fake_finalize_multi(pre, final, [3], pairs),
        )
        results[knob] = ST.finalize_to_panorama(
            cyl, None, None, None, None, None, [True] * n, cfg,
            h, w, margin=0, host_images=host_images, focals=focals,
        )

    spec, plain = results["1"], results["0"]
    assert spec.detail.get("spec_compose") is False
    # snapshot before the step folding image 4 (= step index 3): the
    # first three bands were reused, only the suffix refolded
    assert spec.detail.get("spec_patch") == 3
    assert spec.shifts == plain.shifts
    np.testing.assert_array_equal(spec.mosaic, plain.mosaic)
    np.testing.assert_array_equal(spec.panorama, plain.panorama)


def test_spec_miss_memory_prefix_only_still_patches(monkeypatch):
    """A repeat-missing key folds the prefix only, then patches after
    escalation — correct both runs, and still re-enables on confirm."""
    monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
    rng = np.random.default_rng(4)
    n, h, w = 6, 24, 32
    host_images = [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]
    focals = [100.0] * n
    cyl = np.zeros((n, h, w, 3), np.uint8)
    cfg = StitchConfig(backend="harris")
    monkeypatch.setenv("VFX_SPEC_COMPOSE", "1")
    monkeypatch.setenv("VFX_HOST_COMPOSE", "1")
    pre = [(20.0, 1.2), (19.0, -0.8), (21.0, 2.2), (18.0, 1.1),
           (20.0, -1.3)]
    pairs = []
    for i, (dx, dy) in enumerate(pre):
        xa, ya = 15 + i, 8 + i
        pairs.append(((float(xa), float(ya)), (xa - dx, ya - round(dy))))

    def run(final_shifts):
        monkeypatch.setattr(
            ST, "finalize_pairwise_shifts",
            _fake_finalize_multi(pre, final_shifts, [3], pairs),
        )
        return ST.finalize_to_panorama(
            cyl, None, None, None, None, None, [True] * n, cfg,
            h, w, margin=0, host_images=host_images, focals=focals,
        )

    changed = list(pre)
    changed[3] = (16.0, 2.1)
    out = run(changed)           # miss recorded, patched
    assert out.detail["spec_patch"] == 3
    assert len(ST._SPEC_MISS_KEYS) == 1
    out2 = run(changed)          # prefix-only speculation, patched
    assert out2.detail["spec_patch"] == 3
    assert len(ST._SPEC_MISS_KEYS) == 1
    np.testing.assert_array_equal(out.panorama, out2.panorama)
    out3 = run(pre)              # confirms: key cleared, snapshot resumed
    assert out3.detail["spec_compose"] is False
    assert out3.detail["spec_patch"] == 3
    assert len(ST._SPEC_MISS_KEYS) == 0
    out4 = run(pre)              # full speculation hits again
    assert out4.detail["spec_compose"] is True
    np.testing.assert_array_equal(out3.panorama, out4.panorama)


def test_spec_patch_multi_snapshot_picks_longest_prefix(monkeypatch):
    """Several pairs escalate but only a LATER one changes: the patch
    must resume from the snapshot before the changed pair's band, not
    from the first escalated pair's."""
    monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
    rng = np.random.default_rng(5)
    n, h, w = 6, 24, 32
    host_images = [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]
    focals = [100.0] * n
    cyl = np.zeros((n, h, w, 3), np.uint8)
    cfg = StitchConfig(backend="harris")
    pre = [(20.0, 1.2), (19.0, -0.8), (21.0, 2.2), (18.0, 1.1),
           (20.0, -1.3)]
    final = list(pre)
    final[3] = (16.0, 2.1)  # pairs 0 and 3 escalate; only 3 changes
    pairs = []
    for i, (dx, dy) in enumerate(pre):
        xa, ya = 15 + i, 8 + i
        pairs.append(((float(xa), float(ya)), (xa - dx, ya - round(dy))))

    results = {}
    for knob in ("1", "0"):
        monkeypatch.setattr(ST, "_SPEC_MISS_KEYS", {})
        monkeypatch.setenv("VFX_SPEC_COMPOSE", knob)
        monkeypatch.setenv("VFX_HOST_COMPOSE", "1")
        monkeypatch.setattr(
            ST, "finalize_pairwise_shifts",
            _fake_finalize_multi(pre, final, [0, 3], pairs),
        )
        results[knob] = ST.finalize_to_panorama(
            cyl, None, None, None, None, None, [True] * n, cfg,
            h, w, margin=0, host_images=host_images, focals=focals,
        )

    spec, plain = results["1"], results["0"]
    # snapshots exist at steps 0 (pair 0) and 3 (pair 3); pair 0
    # confirmed, so the step-3 snapshot is the reused prefix
    assert spec.detail.get("spec_patch") == 3
    np.testing.assert_array_equal(spec.mosaic, plain.mosaic)
    np.testing.assert_array_equal(spec.panorama, plain.panorama)
