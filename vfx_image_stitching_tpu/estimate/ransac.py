"""Batched-hypothesis translation "RANSAC" (exhaustive voting).

The reference (image_stitching_harris.py:242-271, image_stitching_sift.py:
86-111) is deterministic exhaustive voting, not sampling: every match's
``(dx, dy) = (xA - xB, yA - yB)`` is a hypothesis; its score is the number
of matches whose move differs by squared distance < 3; the first argmax
wins and the winning *seed match pair* is returned alongside the move (the
pair drives blending offsets later).  Empty match set -> ((0,0), None).

TPU design: the O(M^2) Python loop becomes an M x M pairwise squared
distance computation + row-wise masked count + argmax — fixed shape with a
validity mask.  First-argmax tie semantics match the reference's strict
``>`` update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def translation_ransac(
    moves: jnp.ndarray, valid: jnp.ndarray, dist_sq_thresh: float = 3.0
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vote over translation hypotheses.

    Args:
      moves: (M, 2) float32 candidate (dx, dy) moves (invalid rows ignored).
      valid: (M,) bool.
      dist_sq_thresh: strict squared-distance vote threshold.

    Returns:
      ``(best_index, best_votes, any_valid)``; ``best_index`` is the first
      row achieving the maximal vote count among valid rows (int32), valid
      rows keep their relative order so tie-breaks match the reference's
      compacted match list.
    """
    m = moves.astype(jnp.float32)
    diff = m[:, None, :] - m[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    votes = jnp.sum((d2 < dist_sq_thresh) & valid[None, :], axis=1)
    votes = jnp.where(valid, votes, -1)
    best_index = jnp.argmax(votes)
    return best_index.astype(jnp.int32), votes[best_index], jnp.any(valid)


@functools.partial(jax.jit, static_argnames=("swap_cap",))
def translation_ransac_material(
    moves: jnp.ndarray,
    matched: jnp.ndarray,
    border_flip: jnp.ndarray,
    border_swap: jnp.ndarray,
    alt_moves: jnp.ndarray | None = None,
    alt_valid: jnp.ndarray | None = None,
    dist_sq_thresh: float = 3.0,
    swap_cap: int = 64,
) -> tuple[jnp.ndarray, ...]:
    """Vote + per-row decision materiality, in one O(K^2) pass.

    Borderline rows are knife edges the f32 descriptor path cannot
    decide (see models/sift/strict.py): a ``border_flip`` row's
    *threshold* decision may flip (matched <-> unmatched); a
    ``border_swap`` row's *argmin* choice may swap to one of its
    in-margin runner-up candidates, changing the row's hypothesis move
    to a KNOWN alternative (``alt_moves[j, c]``, valid where
    ``alt_valid[j, c]``).  A row is *material* when one of its possible
    single-row changes would alter the winning hypothesis:

      * flip: the add/remove scenario at the row's current move is
        evaluated exactly (including changes to ``any_match`` — an
        empty vote's argmax is row 0, so winner comparison alone would
        conflate "no winner" with "row 0 wins").  The remove scenario
        also covers swap rows whose A-side keypoint fails the strict
        re-derivation entirely (strict.py marks those unmatched).
      * swap: evaluated exactly per alternative candidate: row ``j``'s
        vote moves to ``alt_moves[j, c]`` (and the row counts as
        matched — an unmatched borderline row can strictly land matched
        at the alternative).  Every candidate's new count follows from
        one adjacency row: rivals lose j's departing vote and gain the
        re-landed one if adjacent; j itself becomes a candidate at the
        alternative position.  The scenario is material when the
        first-max winner changes, or when j itself wins (the seed pair
        — consumed by blending — changes even if the move ties).

    Swap scenarios run on a compacted (``swap_cap``, C, K) slab — swap
    rows are a handful per pair; if more than ``swap_cap`` exist the
    excess rows are conservatively marked material.

    Only material rows are escalated to the strict host path, so clear
    vote margins never pay host work.  tests/test_strict.py fuzzes this
    analysis against a brute-force scenario oracle.

    Returns ``(best_index, best_votes, any_match, material, n_material)``.
    """
    k = moves.shape[0]
    if alt_moves is None:  # no candidate set: swap rows have no known
        alt_moves = jnp.zeros((k, 0, 2), jnp.float32)  # alternatives and
        alt_valid = jnp.zeros((k, 0), bool)  # are material only via flip
    m = moves.astype(jnp.float32)
    diff = m[:, None, :] - m[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    adj = d2 < dist_sq_thresh                      # symmetric (K, K)
    votes = jnp.sum(adj & matched[None, :], axis=1).astype(jnp.int32)
    votes_masked = jnp.where(matched, votes, -1)
    best = jnp.argmax(votes_masked).astype(jnp.int32)
    best_votes = votes_masked[best]
    any_now = jnp.any(matched)

    # flip scenario per row j: counts under j's flip (remove if matched
    # else add); candidate hypothesis rows after the flip
    sign = jnp.where(matched, -1, 1).astype(jnp.int32)
    counts = votes[None, :] + sign[:, None] * adj.astype(jnp.int32)
    eye = jnp.eye(k, dtype=bool)
    cand = (matched[None, :] & ~(matched[:, None] & eye)) | (
        (~matched)[:, None] & eye
    )
    winner_j = jnp.argmax(jnp.where(cand, counts, -1), axis=1)
    scen_any = jnp.any(cand, axis=1)
    flip_changes = (scen_any != any_now) | (
        scen_any & any_now & (winner_j != best)
    )

    # exact swap scenarios over the compacted swap rows
    s = min(swap_cap, k)
    order = jnp.argsort(~border_swap)              # stable: swap rows first
    rows = order[:s].astype(jnp.int32)             # (S,)
    slot_swap = border_swap[rows]
    r_alt = alt_moves[rows].astype(jnp.float32)    # (S, C, 2)
    r_valid = alt_valid[rows] & slot_swap[:, None]  # (S, C)
    ad = r_alt[:, :, None, :] - m[None, None, :, :]
    alt_adj = jnp.sum(ad * ad, axis=-1) < dist_sq_thresh   # (S, C, K)
    # rival i's count: loses j's departing vote, gains the re-landed one
    # if the alternative lands in its cluster
    dep = (adj[rows] & matched[rows][:, None]).astype(jnp.int32)  # (S, K)
    cnt = votes[None, None, :] - dep[:, None, :] + alt_adj.astype(jnp.int32)
    # j's own count at the alternative: matched neighbors of the new
    # position (minus j's old vote if it was adjacent) + its own vote
    n_alt = alt_adj.shape[1]
    self_adj = jnp.take_along_axis(
        alt_adj, jnp.broadcast_to(rows[:, None, None], (s, n_alt, 1)), axis=2
    )[..., 0]                                      # (S, C): alt adj old move
    nbr = jnp.sum(alt_adj & matched[None, None, :], axis=-1).astype(jnp.int32)
    cnt_j = nbr - (self_adj & matched[rows][:, None]).astype(jnp.int32) + 1
    is_j = jnp.arange(k, dtype=jnp.int32)[None, None, :] == rows[:, None, None]
    counts_sc = jnp.where(is_j, cnt_j[:, :, None], cnt)       # (S, C, K)
    cand_sc = matched[None, None, :] | is_j
    winner_sc = jnp.argmax(
        jnp.where(cand_sc, counts_sc, -1), axis=-1
    ).astype(jnp.int32)                            # (S, C) first-max
    changed = (
        (winner_sc != best) | (winner_sc == rows[:, None]) | ~any_now
    )
    mat_slot = jnp.any(r_valid & changed, axis=-1)
    material_swap = jnp.zeros(k, bool).at[rows].set(mat_slot & slot_swap)
    selected = jnp.zeros(k, bool).at[rows].set(slot_swap)
    material_swap = material_swap | (border_swap & ~selected)  # overflow

    material = (border_flip & flip_changes) | (
        border_swap & flip_changes
    ) | material_swap
    return best, best_votes, any_now, material, jnp.sum(material)
