"""Mesh construction and the sharded pairwise-shift pipeline.

Design: a 1-D ``("images",)`` mesh (optionally folded into a 2-D
``("data", "images")`` mesh for the multi-panorama throughput config).
The (N, H, W, 3) cylindrical batch is sharded along images; feature
extraction is purely local; the adjacent-pair stage reads ``feats[:-1]``
and ``feats[1:]``, which XLA lowers to a one-hop halo exchange
(collective-permute) over ICI; the resulting (N-1, 2) shift vectors are
tiny and replicated.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vfx_image_stitching_tpu.config import StitchConfig
from vfx_image_stitching_tpu.models.harris import harris_batch


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "images"
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: jnp.ndarray, mesh: Mesh, axis_name: str = "images"):
    """Place an (N, ...) batch sharded along its leading axis."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pairwise_shift_step(cyl: jnp.ndarray, cfg: StitchConfig):
    """One full device step: features + adjacent-pair match + voting.

    This is the framework's "training-step equivalent": the complete
    batched compute of a stitching round, jittable under any sharding of
    the leading image axis.
    """
    from vfx_image_stitching_tpu.pipeline.stitch import _pair_shift

    mcfg = cfg.match()
    if cfg.backend == "harris":
        xy, descs, valid_kp = harris_batch(cyl, cfg.harris)
    else:
        from vfx_image_stitching_tpu.models.sift import sift_batch

        xy, descs, valid_kp = sift_batch(cyl, cfg.sift)
    pair_fn = jax.vmap(
        functools.partial(
            _pair_shift,
            desc_thresh=mcfg.desc_thresh,
            ransac_thresh=mcfg.ransac_thresh,
            refine=mcfg.refine,
        )
    )
    return pair_fn(
        xy[:-1], descs[:-1], valid_kp[:-1], xy[1:], descs[1:], valid_kp[1:]
    )


def sharded_pairwise_shifts(
    batch: jnp.ndarray,
    mesh: Mesh,
    cfg: Optional[StitchConfig] = None,
    axis_name: str = "images",
):
    """Run the pairwise-shift step with the image axis sharded over ``mesh``.

    An image count that does not divide the mesh size is padded with blank
    images up to the next multiple (XLA's sharding layout requires equal
    shards); the pair outputs are trimmed back to the real N-1 pairs, which
    never read a padding image.

    Returns the 15-tuple of ``pipeline.stitch._pair_shift`` outputs
    (shifts, pair_a, pair_b, any_match, counts, best_b, cand_idx,
    cand_dist, cand_inm, matched, border_flip, border_swap, material,
    n_material, max_inmargin) as device arrays with a leading pair axis.

    NOTE: this is the minimal *benchmark* step — ``_pairwise_shift_step``
    runs with ``margin=0`` so the knife-edge escalation signals
    (border_flip/border_swap/material/max_inmargin) are always zero.  A
    caller that needs full single-chip semantics (escalation included)
    must use :func:`sharded_multi_pano_full` / ``_full_shift_step``,
    which route through ``dispatch_pair_step`` and carry the live
    ``cfg.match().borderline_margin``.
    """
    cfg = cfg or StitchConfig(backend="harris")
    n = batch.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    if n % n_dev:
        pad = n_dev - n % n_dev
        batch = jnp.concatenate(
            [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)]
        )
    batch = jax.device_put(batch, NamedSharding(mesh, P(axis_name)))
    out = _pairwise_shift_step(batch, cfg)
    if batch.shape[0] != n:
        out = tuple(o[: n - 1] for o in out)
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def _multi_pano_step(batch: jnp.ndarray, cfg: StitchConfig):
    """(P, N, H, W, 3) multi-panorama step: vmap over the panorama axis."""
    return jax.vmap(lambda b: _pairwise_shift_step(b, cfg))(batch)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _full_shift_step(cyl: jnp.ndarray, cfg: StitchConfig):
    """Pipeline-grade step: features (+meta/stats) AND the pair outputs.

    Unlike :func:`_pairwise_shift_step` (the minimal benchmark step), this
    returns everything ``pipeline.stitch.finalize_pairwise_shifts`` needs —
    keypoint meta and capacity stats for the SIFT knife-edge escalation and
    overflow warnings — so a sharded run keeps full single-chip semantics.
    """
    from vfx_image_stitching_tpu.pipeline.stitch import (
        dispatch_pair_step,
        extract_features,
    )

    xy, descs, valid_kp, meta, stats = extract_features(cyl, cfg)
    pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
    return (xy, valid_kp, meta, stats, pair_out)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _multi_pano_full_step(batch: jnp.ndarray, cfg: StitchConfig):
    # Perf note: the extractor's capacity skipping is a live-bounded
    # fori_loop (models/sift/chunking.py), which survives this vmap as a
    # while whose trip count is the batch MAX live-chunk count — panos
    # pay max(live), not worst-case capacity.  The residual vmap cost is
    # the per-octave gradient-fields lax.cond (rewritten into a select)
    # plus extrema work; measured 1.96x per pano on the 8-dev CPU mesh
    # (was 7.2x with cond-based skipping — scripts/mesh_cost.py,
    # captured in docs/MESH_COST_r03.json).
    return jax.vmap(lambda b: _full_shift_step(b, cfg))(batch)


def sharded_multi_pano_full(
    batch: jnp.ndarray,
    mesh: Mesh,
    cfg: Optional[StitchConfig] = None,
):
    """Full shift stage for a (P, N, H, W, 3) batch on the 2-D mesh.

    Data-parallel over panoramas on one axis, image-parallel within each
    panorama on the other; returns the per-pano
    ``(xy, valid_kp, meta, stats, pair_out)`` leaves with a leading P
    axis, ready for per-dataset finalize/compose on the host side.
    """
    cfg = cfg or StitchConfig(backend="sift")
    batch = jax.device_put(batch, NamedSharding(mesh, P(*mesh.axis_names)))
    return _multi_pano_full_step(batch, cfg)


def make_mesh_2d(n_devices: Optional[int] = None,
                 axes: Sequence[str] = ("pano", "images")) -> Mesh:
    """2-D mesh for the multi-panorama throughput config."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    d0 = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(np.asarray(devs).reshape(d0, n // d0), tuple(axes))


def sharded_multi_pano_shifts(
    batch: jnp.ndarray,
    mesh: Mesh,
    cfg: Optional[StitchConfig] = None,
):
    """Hierarchically sharded step: data-parallel over panoramas on one
    mesh axis, image-parallel within each panorama on the other.

    ``batch`` is (P, N, H, W, 3); feature extraction shards over both
    axes, the adjacent-pair coupling stays a one-hop exchange on the
    inner axis, and the per-pair shift outputs are tiny.
    """
    cfg = cfg or StitchConfig(backend="harris")
    batch = jax.device_put(
        batch, NamedSharding(mesh, P(*mesh.axis_names))
    )
    return _multi_pano_step(batch, cfg)
