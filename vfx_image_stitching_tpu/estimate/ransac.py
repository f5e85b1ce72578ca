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


@jax.jit
def translation_ransac_material(
    moves: jnp.ndarray,
    matched: jnp.ndarray,
    border_flip: jnp.ndarray,
    border_swap: jnp.ndarray,
    dist_sq_thresh: float = 3.0,
) -> tuple[jnp.ndarray, ...]:
    """Vote + per-row decision materiality, in one O(K^2) pass.

    Borderline rows are knife edges the f32 descriptor path cannot
    decide (see models/sift/strict.py): a ``border_flip`` row's
    *threshold* decision may flip (matched <-> unmatched); a
    ``border_swap`` row's *argmin* choice may swap to its runner-up,
    changing the row's hypothesis move.  A row is *material* when its
    possible change could alter the winning hypothesis:

      * flip: the single add/remove scenario is evaluated exactly
        (including changes to ``any_match`` — an empty vote's argmax is
        row 0, so winner comparison alone conflates "no winner" with
        "row 0 wins");
      * swap: over-approximated — material when removing the row's vote
        changes the winner OR any cluster outside the winner's could
        overtake the winner's *post-swap* count with one extra vote (a
        swapped vote may simultaneously leave the winner's cluster and
        land in a rival's, so the winner's count is diminished by the
        row's own contribution before the comparison; a brand-new
        one-vote cluster at the row itself is also considered).

    Only material rows are escalated to the strict host path, so clear
    vote margins never pay host work.

    Returns ``(best_index, best_votes, any_match, material, n_material)``.
    """
    k = moves.shape[0]
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

    # swap over-approximation, per swap row j: the winner's post-swap
    # count is best_votes minus j's own contribution (j's vote may leave
    # the winner's cluster); a rival i beats it with votes_i + 1 under
    # first-max order (strict >, or == with i < best).  Encode the order
    # in 2*count + (index < best) so one max covers both conditions; a
    # brand-new one-vote cluster seeded at j itself is scored the same
    # way.
    arange = jnp.arange(k, dtype=jnp.int32)
    rival_key = jnp.where(
        ~adj[best],
        2 * (votes + 1) + (arange < best).astype(jnp.int32),
        jnp.iinfo(jnp.int32).min,
    )
    max_rival = jnp.max(rival_key)
    own = (matched & adj[best]).astype(jnp.int32)          # j's winner vote
    win_after = best_votes - own                           # per row j
    new_cluster_key = 2 + (arange < best).astype(jnp.int32)
    overtake = (jnp.maximum(max_rival, new_cluster_key) > 2 * win_after)

    material = (border_flip & flip_changes) | (
        border_swap & (flip_changes | overtake)
    )
    return best, best_votes, any_now, material, jnp.sum(material)
