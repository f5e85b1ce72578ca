"""Knife-edge strict escalation (models/sift/strict.py) parity tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests.conftest import requires_cv2, requires_reference
from vfx_image_stitching_tpu.config import SiftConfig


def test_reference_vote_first_max():
    from vfx_image_stitching_tpu.models.sift.strict import reference_vote

    moves = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]])
    win, votes = reference_vote(moves)
    assert (win, votes) == (0, 2)  # two tied clusters -> first row wins
    assert reference_vote(np.zeros((0, 2))) == (-1, 0)


def test_translation_ransac_material_flags_decisive_rows():
    from vfx_image_stitching_tpu.estimate.ransac import (
        translation_ransac_material,
    )

    # cluster A: rows 0-2 (3 votes), cluster B: rows 3-4 (+ row 5 pending).
    moves = jnp.asarray(
        [[0, 0], [0.1, 0], [0, 0.1], [9, 9], [9.1, 9], [9, 9.1]],
        jnp.float32,
    )
    matched = jnp.asarray([True, True, True, True, True, False])
    border = jnp.asarray([False, False, False, False, False, True])
    no_swap = jnp.zeros(6, bool)
    best, votes, anym, material, n_mat = translation_ransac_material(
        moves, matched, border, no_swap
    )
    # adding row 5 ties cluster B at 3 with cluster A; first-max keeps row 0
    assert int(best) == 0 and int(votes) == 3 and bool(anym)
    assert not bool(material[5]) and int(n_mat) == 0

    # make cluster B already tied: adding row 5 flips the winner to row 3
    matched2 = jnp.asarray([True, True, False, True, True, False])
    best2, votes2, _, material2, n2 = translation_ransac_material(
        moves, matched2, border, no_swap
    )
    assert int(best2) == 0 and int(votes2) == 2
    assert bool(material2[5]) and int(n2) == 1

    # removing a cluster-A voter is material when it breaks the lead
    border3 = jnp.asarray([True, False, False, False, False, False])
    best3, _, _, material3, _ = translation_ransac_material(
        moves, matched, border3, no_swap
    )
    assert int(best3) == 0 and bool(material3[0])


@requires_reference
@requires_cv2
def test_strict_keypoint_and_descriptor_bit_exact(reference_dir):
    """Strict host re-derivation == the reference pipeline, bit for bit."""
    import os

    import cv2

    from tests.conftest import load_reference_module

    sift_impl = load_reference_module("sift_impl")

    from vfx_image_stitching_tpu.models.sift.strict import (
        descriptor_strict,
        host_dog_octaves,
        host_gaussian_pyramid,
        recompute_keypoint_strict,
    )

    img = cv2.imread(os.path.join(reference_dir, "out", "out00.jpg"))
    crop = img[60:188, 80:240]
    cfg = SiftConfig()

    # reference ground truth on the crop
    kps, descs = sift_impl.compute_keypoints_and_descriptors(crop)
    assert len(kps) > 3

    pyr = host_gaussian_pyramid(crop, cfg)
    dogs = host_dog_octaves(pyr)

    checked = 0
    for i, kp in enumerate(kps[:20]):
        octv, layer, scale = sift_impl.unpack_octave(kp)
        o_orig = octv + 1
        # offset byte decode (sift_impl.py:208): offset = packed/255 - 0.5
        off = ((kp.octave >> 16) & 255) / 255.0 - 0.5
        # pt (converted) = (cell + update) * 2**o_orig * 0.5
        cell_x = int(round(kp.pt[0] / (2.0 ** o_orig) * 2.0))
        cell_y = int(round(kp.pt[1] / (2.0 ** o_orig) * 2.0))
        # reference keypoints reachable this way are converged fits, so
        # the compute cell equals the position cell and jl == layer
        got = recompute_keypoint_strict(
            cell_x, cell_y, cell_x, cell_y, layer, kp.octave, kp.angle,
            pyr, dogs, cfg
        )
        if got is None:
            continue
        (px, py), size, angle, packed = got
        if abs(px - kp.pt[0]) > 0.5 or abs(py - kp.pt[1]) > 0.5:
            continue  # rounded to a neighboring cell; skip
        assert packed == kp.octave
        np.testing.assert_allclose([px, py], kp.pt, rtol=0, atol=1e-9)
        assert size == kp.size
        assert angle == kp.angle
        d = descriptor_strict((px, py), size, angle, packed, pyr, cfg)
        np.testing.assert_array_equal(d, descs[i])
        checked += 1
    assert checked >= 3


def test_escalate_pair_fixed_point(monkeypatch):
    """Loop semantics with a controlled strict oracle: confirm vs flip."""
    from vfx_image_stitching_tpu.models.sift import strict

    k = 6
    xy_a = np.array(
        [[0, 0], [1, 0], [0, 1], [50, 50], [51, 50], [50, 51]], np.float64
    )
    xy_b = np.zeros((k, 2))
    best_b = np.arange(k)
    # moves == xy_a: cluster A rows 0-2 (3 votes) vs cluster B rows 3-5
    matched = np.array([True, True, True, True, True, False])
    border = np.array([False] * 5 + [True])
    no_swap = np.zeros(k, bool)
    material = border.copy()
    valid_a = np.ones(k, bool)
    meta = {m: np.zeros(k) for m in ("size", "angle", "octave", "ix", "iy")}
    img_a = np.zeros((8, 8, 3), np.uint8)
    img_b = np.ones((8, 8, 3), np.uint8)

    # case 1: strict CONFIRMS the device decision (row 5 stays unmatched:
    # its A/B descriptors differ by more than the threshold) ->
    # escalate_pair returns None
    def far_desc(image, m, row, cfg):
        if row == 5 and image is img_a:
            return np.full(128, 100.0)  # sq distance 128e4 >> thresh
        return np.zeros(128)

    monkeypatch.setattr(strict, "_strict_desc_cached", far_desc)
    cand_idx = best_b[:, None]
    cand_dist = np.zeros((k, 1))
    out = strict.escalate_pair(
        img_a, img_b, xy_a, meta, xy_b, meta, valid_a, best_b,
        cand_idx, cand_dist,
        matched.copy(), border, no_swap, material, desc_thresh=25000.0,
    )
    assert out is None

    # case 2: strict FLIPS row 5 to matched -> cluster B ties at 3 and the
    # first-max re-vote still keeps row 0... make cluster A weaker instead
    matched2 = np.array([True, True, False, True, True, False])
    # device winner was row 0 (cluster A = 2 votes vs B = 2, row 0 first);
    # strict flip of row 5 gives B 3 votes -> winner flips to row 3
    monkeypatch.setattr(
        strict, "_strict_desc_cached",
        lambda image, m, row, cfg: np.zeros(128),  # all distances 0 < thresh
    )
    out2 = strict.escalate_pair(
        img_a, img_b, xy_a, meta, xy_b, meta, valid_a, best_b,
        cand_idx, cand_dist,
        matched2, border, no_swap, material, desc_thresh=25000.0,
    )
    assert out2 is not None
    shift, pair, anym = out2
    assert anym and tuple(shift) == (50.0, 50.0)
    assert pair[0] == (50.0, 50.0)


def test_swap_materiality_exact_per_candidate():
    """Swap materiality is decided per KNOWN alternative candidate: the
    same swap row is material when its alternative lands in a rival
    cluster one vote behind, and immaterial when the alternative lands
    nowhere near a rival (the old over-approximation flagged both)."""
    from vfx_image_stitching_tpu.estimate.ransac import (
        translation_ransac_material,
    )

    # winner cluster: rows 0-4 (5 votes); rival cluster: rows 5-8 (4)
    moves = jnp.asarray(
        [[0, 0], [0.1, 0], [0, 0.1], [0.1, 0.1], [0.05, 0.05],
         [9, 9], [9.1, 9], [9, 9.1], [9.1, 9.1]],
        jnp.float32,
    )
    matched = jnp.ones(9, bool)
    no_flip = jnp.zeros(9, bool)
    # row 1: in the winner's cluster but not the seed row (removing the
    # seed row itself always changes the winning row, which is material
    # for the trivial reason that the seed pair changes)
    swap1 = no_flip.at[1].set(True)
    # alternative candidate for row 1 lands IN the rival cluster: rival
    # goes 4+1 = 5 > winner's diminished 5-1 = 4 -> material
    alt_rival = jnp.zeros((9, 1, 2), jnp.float32).at[1, 0].set(
        jnp.asarray([9.0, 9.0])
    )
    alt_valid1 = jnp.zeros((9, 1), bool).at[1, 0].set(True)
    best, votes, anym, material, n_mat = translation_ransac_material(
        moves, matched, no_flip, swap1, alt_rival, alt_valid1
    )
    assert int(best) == 0 and int(votes) == 5
    assert bool(material[1]) and int(n_mat) == 1

    # same row, but the only alternative lands far from every cluster:
    # winner drops to 4, rival stays 4, first-max keeps row 0 -> NOT
    # material (the old rival-count over-approximation flagged this)
    alt_far = jnp.zeros((9, 1, 2), jnp.float32).at[1, 0].set(
        jnp.asarray([50.0, 50.0])
    )
    _, _, _, material2, n2 = translation_ransac_material(
        moves, matched, no_flip, swap1, alt_far, alt_valid1
    )
    assert not bool(material2[1]) and int(n2) == 0

    # no known alternatives at all: swap rows only material via flip
    _, _, _, material3, n3 = translation_ransac_material(
        moves, matched, no_flip, swap1
    )
    assert not bool(material3[1]) and int(n3) == 0


def test_swap_materiality_advice_counterexample():
    """The advisor's round-2 counterexample: a swapped vote that departs
    a shared cluster and lands next to a winner-ADJACENT rival flips the
    winner; the old over-approximation excluded winner-adjacent rivals
    and missed it."""
    from vfx_image_stitching_tpu.estimate.ransac import (
        translation_ransac_material,
    )

    moves = jnp.asarray(
        [[0, 0], [0.05, 0], [0.1, 0], [-1.0, 0], [1.6, 0]], jnp.float32
    )
    matched = jnp.ones(5, bool)
    no_flip = jnp.zeros(5, bool)
    swap3 = no_flip.at[3].set(True)
    alt = jnp.zeros((5, 1, 2), jnp.float32).at[3, 0].set(
        jnp.asarray([3.0, 0.0])
    )
    alt_valid = jnp.zeros((5, 1), bool).at[3, 0].set(True)
    best, votes, _, material, n_mat = translation_ransac_material(
        moves, matched, no_flip, swap3, alt, alt_valid
    )
    # current winner: row 0 with 5 votes; swapping row 3 to move 3.0
    # gives row 4 (winner-adjacent!) 5 votes vs the winner's 4
    assert int(best) == 0 and int(votes) == 5
    assert bool(material[3]) and int(n_mat) == 1


def _materiality_oracle(moves, matched, border_flip, border_swap,
                        alt_moves, alt_valid, thresh_sq=3.0):
    """Brute-force scenario enumeration (f64) for the fuzz cross-check."""

    def winner(mv, mt):
        if not mt.any():
            return -1
        d2 = ((mv[:, None, :] - mv[None, :, :]) ** 2).sum(-1)
        cnt = ((d2 < thresh_sq) & mt[None, :]).sum(1)
        return int(np.argmax(np.where(mt, cnt, -1)))

    k = moves.shape[0]
    best = winner(moves, matched)
    any_now = matched.any()
    out = np.zeros(k, bool)
    for j in range(k):
        if not (border_flip[j] or border_swap[j]):
            continue
        mt = matched.copy()
        mt[j] = not matched[j]
        wj = winner(moves, mt)
        if (wj < 0) != (not any_now) or (wj >= 0 and wj != best):
            out[j] = True
            continue
        if not border_swap[j]:
            continue
        for c in np.nonzero(alt_valid[j])[0]:
            mv = moves.copy()
            mv[j] = alt_moves[j, int(c)]
            mt = matched.copy()
            mt[j] = True
            wj = winner(mv, mt)
            if wj != best or wj == j or not any_now:
                out[j] = True
                break
    return out


def test_materiality_fuzz_device_host_oracle():
    """Fuzzed vote configurations: the device analysis, the host replay
    (strict._material_rows) and a brute-force scenario oracle must agree
    row for row (VERDICT r2 item 4)."""
    from vfx_image_stitching_tpu.estimate.ransac import (
        translation_ransac_material,
    )
    from vfx_image_stitching_tpu.models.sift.strict import _material_rows

    rng = np.random.default_rng(42)
    centers = np.array([[0, 0], [1, 0], [9, 9], [10, 9], [50, 50]])
    n_cases = 300
    for case in range(n_cases):
        k = int(rng.integers(1, 13))
        n_alt = int(rng.integers(0, 4))
        # integer-valued moves so f32 (device) and f64 (host/oracle)
        # adjacency comparisons agree exactly
        moves = centers[rng.integers(0, len(centers), k)] + rng.integers(
            0, 2, (k, 2)
        )
        moves = moves.astype(np.float64)
        matched = rng.random(k) < 0.7
        border_flip = rng.random(k) < 0.3
        border_swap = rng.random(k) < 0.3
        alt_moves = (
            centers[rng.integers(0, len(centers), (k, n_alt))]
            + rng.integers(0, 2, (k, n_alt, 2))
        ).astype(np.float64)
        alt_valid = rng.random((k, n_alt)) < 0.6

        oracle = _materiality_oracle(
            moves, matched, border_flip, border_swap, alt_moves, alt_valid
        )
        _, _, _, mat_dev, _ = translation_ransac_material(
            jnp.asarray(moves, jnp.float32), jnp.asarray(matched),
            jnp.asarray(border_flip), jnp.asarray(border_swap),
            jnp.asarray(alt_moves, jnp.float32), jnp.asarray(alt_valid),
        )
        np.testing.assert_array_equal(
            np.asarray(mat_dev), oracle, err_msg=f"device case {case}"
        )
        mat_host = _material_rows(
            moves, matched, border_flip, border_swap, alt_moves, alt_valid,
            3.0,
        )
        np.testing.assert_array_equal(
            mat_host, oracle, err_msg=f"host case {case}"
        )


def test_swap_cap_overflow_is_conservative():
    """Swap rows beyond the compacted slab are marked material outright."""
    from vfx_image_stitching_tpu.estimate.ransac import (
        translation_ransac_material,
    )

    k = 6
    moves = jnp.asarray(np.arange(k * 2).reshape(k, 2) * 10.0, jnp.float32)
    matched = jnp.ones(k, bool)
    no_flip = jnp.zeros(k, bool)
    swaps = jnp.ones(k, bool)
    alt_moves = jnp.zeros((k, 1, 2), jnp.float32)
    alt_valid = jnp.zeros((k, 1), bool)  # no real alternatives anywhere
    _, _, _, material, n_mat = translation_ransac_material(
        moves, matched, no_flip, swaps, alt_moves, alt_valid,
        swap_cap=2,
    )
    # rows 0-1 analyzed exactly: row 0 is material via the flip branch
    # (removing the winner row changes the winner), row 1 is not (no
    # valid alternatives); the 4 overflow rows are conservatively material
    material = np.asarray(material)
    assert material[0] and not material[1]
    assert material[2:].all() and int(n_mat) == 5
