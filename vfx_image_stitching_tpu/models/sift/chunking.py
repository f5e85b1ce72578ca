"""Live-bounded chunk loops for the fixed-capacity SIFT stages.

The masked, fixed-capacity pipeline processes keypoint-like rows in
chunks; capacities are audited worst-case, so a typical image fills well
under half its slots and compaction packs the valid rows to the front.
Rounds 1-2 skipped the all-filler tail chunks with a per-chunk
``lax.cond`` inside ``lax.map``.  That breaks down under ``vmap`` (the
multi-panorama / 2-D-mesh configuration): vmap rewrites ``cond`` into a
``select`` that executes BOTH branches, so every pano pays worst-case
capacity work — measured 7.2x per pano on the 8-device CPU mesh
(scripts/mesh_cost.py, r3).

A ``fori_loop`` whose trip count is the LIVE chunk count fixes both
sides: single-pano execution never even dispatches the dead chunks (the
cond skip still cost ~50 us per dead chunk), and under vmap the loop
becomes a while whose trip count is the *batch maximum* live count —
panos pay max(live), not capacity.

The bound derives from the LAST valid row (not the valid count), so a
caller that passes non-compacted rows still gets every valid row
processed — the loop merely covers more chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def live_chunk_bound(valid: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Number of leading chunks containing any valid row (i32 scalar)."""
    k = valid.shape[0]
    last = jnp.max(
        jnp.where(valid, jnp.arange(k, dtype=jnp.int32) + 1, 0), initial=0
    )
    return (last + chunk - 1) // chunk


def chunked_live_loop(n_live: jnp.ndarray, body_fn, out_zeros):
    """``out[i] = body_fn(i)`` for ``i < n_live``; tail rows stay zero.

    ``out_zeros`` is a pytree of (n_chunks, ...) arrays; ``body_fn(i)``
    returns a matching pytree of per-chunk results.
    """

    def body(i, out):
        res = body_fn(i)
        return jax.tree.map(
            lambda o, r: jax.lax.dynamic_update_index_in_dim(o, r, i, 0),
            out, res,
        )

    return jax.lax.fori_loop(0, n_live, body, out_zeros)


def index_chunk(tree, i: jnp.ndarray):
    """Row ``i`` of every (n_chunks, ...) leaf in ``tree``."""
    return jax.tree.map(
        lambda f: jax.lax.dynamic_index_in_dim(f, i, 0, keepdims=False),
        tree,
    )
