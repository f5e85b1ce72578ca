"""Matching + voting RANSAC vs oracles (random fixed-shape cases)."""

import numpy as np
import jax.numpy as jnp

from vfx_image_stitching_tpu.match import match_descriptors
from vfx_image_stitching_tpu.estimate import translation_ransac, correct_drift
from tests import oracles


def _random_descs(rng, n, scale=1.0):
    d = rng.random((n, 128)).astype(np.float32) * scale
    return d


def test_match_parity_random():
    rng = np.random.default_rng(0)
    for trial in range(5):
        na, nb = 40, 37
        da = _random_descs(rng, na)
        db = np.concatenate([da[:20] + rng.normal(0, 0.02, (20, 128)).astype(np.float32),
                             _random_descs(rng, nb - 20)])
        ka = [(i, 2 * i) for i in range(na)]
        kb = [(3 * j, j) for j in range(nb)]
        oracle = oracles.nn_match(ka, da, kb, db, desc_thresh=0.5)

        bi, mm = map(
            np.asarray,
            match_descriptors(
                jnp.asarray(da), jnp.ones(na, bool),
                jnp.asarray(db), jnp.ones(nb, bool), 0.5,
            ),
        )
        ours = [(ka[i], kb[bi[i]]) for i in range(na) if mm[i]]
        assert ours == oracle


def test_match_respects_validity_masks():
    rng = np.random.default_rng(1)
    da = _random_descs(rng, 10)
    db = np.concatenate([da, da])  # perfect matches exist in both halves
    va = np.array([True] * 5 + [False] * 5)
    vb = np.array([False] * 10 + [True] * 10)
    bi, mm = map(
        np.asarray,
        match_descriptors(jnp.asarray(da), jnp.asarray(va),
                          jnp.asarray(db), jnp.asarray(vb), 0.5),
    )
    assert not mm[5:].any()          # invalid A rows never match
    assert (bi[mm] >= 10).all()       # invalid B columns never selected


def test_ransac_parity_random():
    rng = np.random.default_rng(2)
    for trial in range(10):
        m = 60
        true = rng.integers(-100, 100, 2)
        moves = np.tile(true, (m, 1)).astype(np.float64)
        noise_rows = rng.random(m) < 0.4
        moves[noise_rows] += rng.integers(-50, 50, (noise_rows.sum(), 2))
        matches = [((float(dx + 7), 1.0), (7.0, 1.0 - dy)) for dx, dy in moves]
        # matches encode (a-b) == (dx, dy)
        oracle_move, oracle_pair = oracles.vote_ransac(matches, 3)

        bi, votes, anyv = map(
            np.asarray,
            translation_ransac(jnp.asarray(moves, jnp.float32), jnp.ones(m, bool), 3.0),
        )
        assert bool(anyv)
        assert tuple(moves[int(bi)]) == oracle_move
        assert matches[int(bi)] == oracle_pair


def test_ransac_first_max_tie():
    moves = np.array([[5, 5], [9, 9], [5, 5], [9, 9]], np.float32)
    bi, votes, anyv = map(np.asarray, translation_ransac(jnp.asarray(moves), jnp.ones(4, bool), 3.0))
    assert int(bi) == 0 and int(votes) == 2  # first of the tied maxima


def test_ransac_invalid_rows_excluded():
    moves = np.array([[1, 1], [1, 1], [9, 9]], np.float32)
    valid = np.array([False, True, True])
    bi, votes, anyv = map(np.asarray, translation_ransac(jnp.asarray(moves), jnp.asarray(valid), 3.0))
    assert int(bi) == 1  # invalid row 0 can never win
    assert int(votes) == 1  # ...and does not vote for row 1


def test_drift_correction():
    shifts = [(10.0, 3.0), (12.0, -1.0), (11.0, 4.0)]
    out = correct_drift(shifts, n_images=4)
    avg = (3.0 - 1.0 + 4.0) / 3
    for (dx, dy), (odx, ody) in zip(shifts, out):
        assert odx == dx and abs(ody - (dy - avg)) < 1e-12
    # single image: no drift
    assert correct_drift([], 1) == []


def test_inmargin_guard_warns_on_five_way_near_tie():
    """A borderline row with >4 in-margin candidates exceeds the top-4
    strict re-rank capacity; the pipeline surfaces a warning instead of
    silently degrading parity (VERDICT r2 item 3)."""
    import warnings

    import jax.numpy as jnp

    from vfx_image_stitching_tpu.pipeline.stitch import (
        _pair_shift,
        finalize_pairwise_shifts,
    )
    from vfx_image_stitching_tpu.config import StitchConfig

    k, margin = 8, 1024.0
    desc_a = np.zeros((k, 128), np.float32)
    desc_b = np.zeros((k, 128), np.float32)
    # A row 0 vs five B candidates at squared distances 0, 1, 4, 9, 16 —
    # all within the margin of the best
    for j in range(5):
        desc_b[j, 0] = float(j)
    desc_b[5:] = 300.0  # far beyond margin and threshold
    xy = np.arange(2 * k, dtype=np.float32).reshape(k, 2)
    valid = np.ones(k, bool)

    out = _pair_shift(
        jnp.asarray(xy), jnp.asarray(desc_a), jnp.asarray(valid),
        jnp.asarray(xy), jnp.asarray(desc_b), jnp.asarray(valid),
        desc_thresh=25000.0, ransac_thresh=3.0, refine=1, margin=margin,
    )
    assert int(out[14]) >= 5  # max_inmargin (15th field) sees all five

    pair_out = tuple(o[None] for o in out)  # add the (N-1) pair axis
    cyl = jnp.zeros((2, 8, 8, 3), jnp.uint8)
    cfg = StitchConfig(backend="sift")
    assert cfg.match().borderline_margin == margin
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        finalize_pairwise_shifts(
            cyl, jnp.asarray(xy)[None].repeat(2, 0), None, None, None,
            pair_out, [True, True], cfg,
        )
    msgs = [str(w.message) for w in caught]
    assert any("candidate capacity" in m for m in msgs), msgs
