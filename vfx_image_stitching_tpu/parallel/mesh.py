"""Mesh construction and the sharded pairwise-shift pipeline.

Design: a 1-D ``("images",)`` mesh (optionally folded into a 2-D
``("data", "images")`` mesh), plus the 1-D ``("pano",)`` mesh from
:func:`make_mesh_pano`.  The (N, H, W, 3) cylindrical batch is sharded
along images; feature extraction is purely local; the adjacent-pair
stage reads ``feats[:-1]`` and ``feats[1:]``, which XLA lowers to a
one-hop halo exchange (collective-permute) over ICI; the resulting
(N-1, 2) shift vectors are tiny and replicated.

Which layout to use (measured):

* **Scale-out = the pano axis.**  ``make_mesh_pano`` +
  ``sharded_multi_pano_full`` is the recommended multi-chip layout:
  0.93x per pano vs the sequential loop (docs/MESH_COST_r03b.json) —
  n chips stitch ~n panoramas in one pano's time.
* **The images axis is a correctness config, not a speedup.**  At the
  realistic single-pano shape (18 x 384x512, full SIFT caps) sharding
  one panorama's images across 6 devices inflates total work 6.24x —
  per-shard GSPMD padding/halo swamps the 1/n compute — so the
  projected speedup on n real chips is ~0.96x: never better than one
  device (docs/MESH_COST_r04.json, VERDICT r3 item 6).  It stays for
  mesh-shape generality (2-D meshes fold it in) and for tests.
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
    # captured in docs/MESH_COST_r03.json).  The default multi-pano
    # path is now the shard_map step (_shardmap_full_step), which keeps
    # conds real and pays ~1.0x; this vmap step remains for
    # mode="vmap" and as the comparison baseline.
    return jax.vmap(lambda b: _full_shift_step(b, cfg))(batch)


@functools.lru_cache(maxsize=None)
def _shardmap_full_step(mesh: Mesh, cfg: StitchConfig):
    """Build the shard_map multi-pano step for ``mesh`` (cached per mesh+cfg).

    Manual over the leading (pano) mesh axis only: each pano-axis shard
    runs the UNvmapped single-pano program over its local panoramas via
    ``lax.map`` (a scan — ``lax.cond`` capacity skips stay real conds, so
    each pano pays its own live-chunk cost, not the batch max or a
    cond->select rewrite).  Any remaining mesh axes stay in GSPMD "auto"
    mode: a sharding constraint keeps the image axis sharded over them
    inside the manual region, so a 2-D (pano, images) mesh still uses all
    devices.  Outputs are bit-equal to the per-pano ``_full_shift_step``
    (pinned by tests/test_parallel.py).
    """
    pano_ax = mesh.axis_names[0]
    auto_axes = mesh.axis_names[1:]

    def body(local):  # (P_local, N, H, W, 3); image axis global under auto
        if auto_axes:
            local = jax.lax.with_sharding_constraint(local, P(None, *auto_axes))
        return jax.lax.map(lambda b: _full_shift_step(b, cfg), local)

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=P(pano_ax),
            out_specs=P(pano_ax),
            axis_names={pano_ax},
            # scan carries start as pano-invariant constants and become
            # varying, which the vma checker rejects; semantics are pure
            # per-shard map, so the check is safely disabled.
            check_vma=False,
        )
    )


def sharded_multi_pano_full(
    batch: jnp.ndarray,
    mesh: Mesh,
    cfg: Optional[StitchConfig] = None,
    mode: str = "shard_map",
):
    """Full shift stage for a (P, N, H, W, 3) batch on the mesh.

    Data-parallel over panoramas on the leading mesh axis,
    image-parallel within each panorama on the remaining axes; returns
    the per-pano ``(xy, valid_kp, meta, stats, pair_out)`` leaves with a
    leading P axis, ready for per-dataset finalize/compose on the host.

    ``mode="shard_map"`` (default) runs the unvmapped per-pano program
    per shard — no vmap cond->select penalty (1.0x per pano vs the
    vmapped 1.96x, docs/MESH_COST_r03b.json); P is padded to a pano-axis
    multiple with blank panos (cheap: zero live capacity chunks) and
    trimmed on return.  ``mode="vmap"`` keeps the old single-executable
    vmap path (useful when P < the pano axis would waste devices).
    """
    cfg = cfg or StitchConfig(backend="sift")
    if mode == "vmap":
        batch = jax.device_put(
            batch, NamedSharding(mesh, P(*mesh.axis_names))
        )
        return _multi_pano_full_step(batch, cfg)
    p = batch.shape[0]
    pano_n = int(mesh.devices.shape[0])
    pad = (-p) % pano_n
    if pad:
        batch = jnp.concatenate(
            [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)]
        )
    batch = jax.device_put(batch, NamedSharding(mesh, P(*mesh.axis_names)))
    out = _shardmap_full_step(mesh, cfg)(batch)
    if pad:
        out = jax.tree.map(lambda x: x[:p], out)
    return out


def make_mesh_pano(n_devices: Optional[int] = None,
                   axis_name: str = "pano") -> Mesh:
    """1-D pano-only mesh: each device runs whole panoramas.

    The preferred throughput layout when P >= n_devices — the per-pano
    step cost stays ~1.0x the single-device step (no image-axis halo
    collectives, conds stay conds under the shard_map path;
    docs/MESH_COST_r03b.json), and scaling across panoramas is linear
    with zero inter-device communication.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


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
