"""Brute-force nearest-neighbor matching as one MXU matmul.

The reference does an O(N_A * N_B * 128) pure-Python loop (hot loop #2,
image_stitching_harris.py:219-240 and image_stitching_sift.py:62-79):
nearest neighbor in squared L2, kept iff the best distance beats an
*absolute* threshold (1.0 for unit-norm Harris descriptors, 25000 for
0..255-scaled SIFT descriptors; no Lowe ratio, no cross-check).

TPU design: ``|a|^2 + |b|^2 - 2 a.b`` via a single matmul, then a per-row
exact re-check of the top candidates.  The re-check matters for parity:
the matmul form loses ~1 ulp of 2^23 to cancellation, while the reference
accumulates ``dot(a-b, a-b)`` directly; recomputing the exact form for the
top-``refine`` candidates restores the reference's argmin/threshold
decisions.  (For SIFT's integer-valued descriptors the matmul itself is
already exact: inputs <= 255 are exact in bf16 and every partial sum is an
integer < 2^24, exactly representable in the f32 accumulator.)

Tie semantics: the reference keeps the *first* index achieving the best
distance (strict ``<`` update); ``jnp.argmin`` also returns the first
minimum.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


def pairwise_sqdist(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(K_A, K_B) squared L2 distances via matmul (f32 accumulate)."""
    a = desc_a.astype(jnp.float32)
    b = desc_b.astype(jnp.float32)
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    na = jnp.sum(a * a, axis=-1, keepdims=True)
    nb = jnp.sum(b * b, axis=-1, keepdims=True)
    return na + nb.T - 2.0 * ab


@functools.partial(
    jax.jit, static_argnames=("refine", "lowe_ratio", "return_dist")
)
def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    desc_thresh: float,
    refine: int = 8,
    lowe_ratio: Optional[float] = None,
    return_dist: bool = False,
    margin: float = 0.0,
) -> Tuple[jnp.ndarray, ...]:
    """Per-A-row nearest neighbor in B under an absolute threshold.

    Returns ``(best_idx, matched)``: for every A row, the best B index and
    whether the match is kept (valid rows, best exact distance <
    ``desc_thresh``, optional Lowe ratio for the API surface — the
    reference stitching path never uses the ratio).  With
    ``return_dist=True`` also returns ``(best_dist, second_dist,
    cand_idx (K, 4), cand_dist (K, 4), n_inmargin)`` — the top-4
    candidate set by exact distance, used by the knife-edge
    precision-escalation path to spot (and strictly re-rank) decisions
    that sit within descriptor-quantization noise of the threshold or
    of the argmin gap (any candidate whose device distance is within
    ``margin`` of the best could strictly win).  ``n_inmargin`` counts,
    per A row, ALL candidates within ``margin`` of the row's best
    (including the best itself) over the full B set: the escalation can
    only re-rank the 4 returned candidates, so the pipeline warns when
    a borderline row's count exceeds the candidate capacity instead of
    assuming it never happens (tests/test_strict.py constructs the
    5-way near-tie).
    """
    d2 = pairwise_sqdist(desc_a, desc_b)
    d2 = jnp.where(valid_b[None, :], d2, _BIG)

    if refine <= 1:
        # integer-descriptor fast path (SIFT): the matmul distances are
        # exact (see module docstring), so a plain first-min argmin
        # reproduces the reference bit-for-bit with no re-check.
        best_dist = jnp.min(d2, axis=-1)
        best_idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        matched = valid_a & (best_dist < desc_thresh) & (best_dist < _BIG)
        if lowe_ratio is not None:
            masked = jnp.where(
                jnp.arange(d2.shape[1])[None, :] == best_idx[:, None], _BIG, d2
            )
            second = jnp.min(masked, axis=-1)
            matched = matched & (best_dist < lowe_ratio * lowe_ratio * second)
        if return_dist:
            n_cand = min(4, d2.shape[1])
            # iterative argmin+mask instead of lax.top_k: top_k lowers to
            # a full stable sort of the (K_A, K_B) distance matrix on TPU
            # (measured 82 ms/pair on parrington); four bandwidth-bound
            # min passes produce the identical (value, first-index) order
            cols = jnp.arange(d2.shape[1], dtype=jnp.int32)[None, :]
            d2m = d2
            idxs = [best_idx]
            dists = [best_dist]
            for _ in range(n_cand - 1):
                d2m = jnp.where(cols == idxs[-1][:, None], _BIG, d2m)
                dists.append(jnp.min(d2m, axis=-1))
                idxs.append(jnp.argmin(d2m, axis=-1).astype(jnp.int32))
            cand_idx = jnp.stack(idxs, axis=-1)
            cand_dist = jnp.stack(dists, axis=-1)
            second = cand_dist[:, 1] if n_cand > 1 else best_dist
            n_inmargin = jnp.sum(
                (d2 < best_dist[:, None] + margin) & (d2 < _BIG), axis=-1
            ).astype(jnp.int32)
            return (best_idx, matched, best_dist, second,
                    cand_idx.astype(jnp.int32), cand_dist, n_inmargin)
        return best_idx, matched

    refine = min(refine, desc_b.shape[0])
    # top `refine` candidates per row (smallest approximate distance)
    neg_top, cand_idx = jax.lax.top_k(-d2, refine)          # (K_A, refine)
    cand_desc = desc_b[cand_idx]                            # (K_A, refine, D)
    diff = desc_a[:, None, :].astype(jnp.float32) - cand_desc.astype(jnp.float32)
    exact = jnp.sum(diff * diff, axis=-1)                   # (K_A, refine)
    exact = jnp.where(-neg_top >= _BIG, _BIG, exact)
    best_dist = jnp.min(exact, axis=-1)
    # tie-break on the smallest B index among exact minima — the reference's
    # strict-< scan keeps the first (lowest-index) minimum
    best_idx = jnp.min(
        jnp.where(exact == best_dist[:, None], cand_idx, jnp.iinfo(jnp.int32).max),
        axis=-1,
    )

    matched = valid_a & (best_dist < desc_thresh) & (best_dist < _BIG)
    if lowe_ratio is not None:
        second = jnp.sort(exact, axis=-1)[:, 1] if refine > 1 else best_dist
        matched = matched & (best_dist < lowe_ratio * lowe_ratio * second)
    if return_dist:
        n_cand = min(4, refine)
        neg, pos = jax.lax.top_k(-exact, n_cand)          # by exact distance
        out_dist = -neg
        out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1).astype(
            jnp.int32
        )
        second = (
            out_dist[:, min(1, n_cand - 1)] if n_cand > 1 else best_dist
        )
        # in-margin count over the full row (approximate distances are
        # fine for the guard; the SIFT escalation path uses refine=1)
        n_inmargin = jnp.sum(
            (d2 < best_dist[:, None] + margin) & (d2 < _BIG), axis=-1
        ).astype(jnp.int32)
        return best_idx, matched, best_dist, second, out_idx, out_dist, n_inmargin
    return best_idx, matched
