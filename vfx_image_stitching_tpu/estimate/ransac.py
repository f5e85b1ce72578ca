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
    border: jnp.ndarray,
    dist_sq_thresh: float = 3.0,
) -> tuple[jnp.ndarray, ...]:
    """Vote + per-row decision materiality, in one O(K^2) pass.

    A ``border`` row is *material* when flipping its matched state (the
    knife-edge the f32 descriptor path cannot decide — see
    models/sift/strict.py) would change the winning hypothesis row.
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

    # scenario per row j: counts under j's flip (remove if matched else add)
    sign = jnp.where(matched, -1, 1).astype(jnp.int32)
    counts = votes[None, :] + sign[:, None] * adj.astype(jnp.int32)
    eye = jnp.eye(k, dtype=bool)
    cand = (matched[None, :] & ~(matched[:, None] & eye)) | (
        (~matched)[:, None] & eye
    )
    winner_j = jnp.argmax(jnp.where(cand, counts, -1), axis=1)
    material = border & (winner_j != best)
    return (
        best, votes_masked[best], jnp.any(matched),
        material, jnp.sum(material),
    )
