"""Multi-panorama throughput: stitch several datasets in one run.

BASELINE config "Batched multi-panorama throughput (wind/out/parrington/
grail in one run)".  Unlike a sequential loop of ``stitch_panorama``
calls (which synchronizes per phase), this pipeline keeps the device
queue full across datasets:

  1. every dataset's JPEG decode runs in parallel threads, each image
     ``device_put`` as soon as it decodes (uploads hide behind decodes);
  2. cylindrical projection, feature extraction, the pair step AND the
     result bundle (with its d2h copy started) are *dispatched* for each
     dataset the moment its load lands, from a staging worker — JAX
     dispatch is asynchronous, so dataset B's features run on device
     while the host finalizes dataset A; same-shape datasets
     (parrington/grail: both 18x384x512) share compiled executables;
  3. per dataset, in input order, STARTING as soon as that dataset is
     staged (the staging worker keeps dispatching later datasets
     underneath): pull the prefetched result bundle (the only sync),
     escalate knife edges, plan + fold the mosaic on host;
  4. panoramas are cropped and returned.

For multi-chip scale-out the same shift stage runs under the 2-D
(pano, images) mesh (parallel/mesh.py: sharded_multi_pano_shifts);
this module is the single-chip throughput path.

Benchmarked by scripts/bench_multi.py (pipelined vs sequential).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import threading
import time
from typing import Dict, Optional, Sequence

from vfx_image_stitching_tpu.config import DEFAULT_CROP_MARGINS, StitchConfig
from vfx_image_stitching_tpu.pipeline.stitch import (
    StitchResult,
    _autoscale_sift_caps,
    _resolve_cfg,
    dispatch_pair_step,
    dispatch_result_bundle,
    extract_features,
)


def _autoscale_many(cfg: StitchConfig, folders) -> StitchConfig:
    """Area-scale default SIFT capacities by the LARGEST dataset image.

    One shared config keeps same-shape executables shared across
    datasets; capacities are upper bounds, so the max-area choice is
    pure headroom for the smaller datasets.  Identity at
    reference-dataset sizes (config.SiftCapacities.scaled_for_area).
    """
    if cfg.backend != "sift":
        return cfg
    from vfx_image_stitching_tpu.io import peek_image_size

    best = None
    for f in folders:
        hw = peek_image_size(f)
        if hw and (best is None or hw[0] * hw[1] > best[0] * best[1]):
            best = hw
    if best is None:
        return cfg
    return _autoscale_sift_caps(cfg, None, hw=best)[0]


def stitch_many(
    folders: Sequence[str],
    backend: str = "sift",
    margins: Optional[Dict[str, int]] = None,
    cfg: Optional[StitchConfig] = None,
    verbose: bool = False,
    mesh=None,
) -> Dict[str, StitchResult]:
    """Stitch every dataset folder in one pipelined run.

    Margins default to the author's per-dataset golden margins
    (README.md:52-54 of the reference).  Returns per-folder results in
    input order.

    With ``mesh`` (a 2-D ``(pano, images)`` ``jax.sharding.Mesh``, see
    ``parallel.make_mesh_2d``) the shift stage of same-shape datasets runs
    data-parallel over panoramas and image-parallel within each — the
    multi-chip throughput configuration.  Results are identical to the
    single-device path (finalize/escalation/compose semantics are shared).
    """
    if mesh is not None:
        return _stitch_many_sharded(
            folders, mesh, backend=backend, margins=margins, cfg=cfg,
            verbose=verbose,
        )
    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.io import load_dataset_device
    from vfx_image_stitching_tpu.pipeline.stitch import finalize_to_panorama

    cfg = _resolve_cfg(backend, cfg)
    cfg = _autoscale_many(cfg, folders)
    margins = margins or {}
    t0 = time.time()

    names = [os.path.basename(os.path.normpath(f)) for f in folders]

    # phase 1+2: decode + upload every dataset concurrently and dispatch
    # projection + features + pair step for each AS SOON AS its own load
    # lands (no barrier on the slowest dataset's decode — later loads
    # upload while earlier datasets already compute).  Under host
    # compose (the default, docs/CHIP_AB_R3C.json) only 1 byte/px grays
    # go up — the compose source is rebuilt on host from host_imgs.
    gray = os.environ.get("VFX_HOST_COMPOSE", "1") == "1"
    host_project = gray and os.environ.get("VFX_HOST_PROJECT", "1") == "1"
    staged_by_idx: Dict[int, tuple] = {}
    dispatch_ts: Dict[int, dict] = {}
    staged_ev = {i: threading.Event() for i in range(len(folders))}

    def _stage_all(loads) -> None:
        # runs in its own worker: dispatches each dataset's device chain
        # as soon as its load lands, and keeps dispatching LATER datasets
        # while the main thread already finalizes earlier ones (the
        # finalize's device waits release the GIL)
        try:
            for fut in cf.as_completed(loads):
                i = loads[fut]
                tl = time.time()
                batch, valid, focals, shape, host_imgs = fut.result()
                cyl = (
                    batch if host_project  # loader projected on host
                    else cylindrical_project_batch(batch, tuple(focals))
                )
                feats = extract_features(cyl, cfg)
                xy, descs, valid_kp, meta, stats = feats
                pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
                # pack the finalize bundle NOW and start its d2h copy:
                # sub-MB results cross the tunneled link as soon as this
                # dataset's device work finishes instead of queueing
                # behind later datasets' multi-MB uploads
                bundle = dispatch_result_bundle(
                    xy, valid_kp, meta, stats, pair_out, cfg
                )
                staged_by_idx[i] = (
                    cyl, valid, shape, feats, pair_out, host_imgs, focals,
                    bundle,
                )
                # host-clock breadcrumbs for the multi phase budget: when
                # this dataset's load landed and how long its (async)
                # dispatch chain took to issue
                dispatch_ts[i] = {
                    "load_done_s": tl - t0,
                    "dispatch_s": time.time() - tl,
                }
                staged_ev[i].set()
        finally:
            for ev in staged_ev.values():  # unblock on error paths
                ev.set()

    # phase 3+4: finalize each dataset in input order, each STARTING as
    # soon as its own stage lands (no barrier on the slowest dataset's
    # decode — round 3 waited for all loads before the first finalize,
    # 0.68 s of the 1.32 s wall, docs/PHASE_BUDGET_MULTI_r04.json)
    results: Dict[str, StitchResult] = {}
    with cf.ThreadPoolExecutor(max_workers=len(folders) + 1) as pool:
        loads = {
            pool.submit(load_dataset_device, f, with_host=True, gray=gray,
                        host_project=host_project): i
            for i, f in enumerate(folders)
        }
        stager = pool.submit(_stage_all, loads)
        for di, name in enumerate(names):
            staged_ev[di].wait()
            if di not in staged_by_idx:
                stager.result()  # surfaces the staging exception
                raise RuntimeError(f"staging produced no result for {name}")
            (cyl, valid, (h, w, _c), feats, pair_out, host_imgs, focals,
             bundle) = staged_by_idx[di]
            td0 = time.time()
            xy, descs, valid_kp, meta, stats = feats
            margin = margins.get(name, DEFAULT_CROP_MARGINS.get(name, 15))
            fin = finalize_to_panorama(
                cyl, xy, valid_kp, meta, stats, pair_out, list(valid), cfg,
                h, w, margin, host_images=host_imgs, focals=focals,
                bundle=bundle,
            )
            td1 = time.time()
            timings = {"finalize_compose": td1 - td0, "total": td1 - t0}
            timings.update(dispatch_ts.get(di, {}))
            timings["finalize_start_s"] = td0 - t0
            timings.update(fin.detail)  # bundle_pull/escalate/fold phases
            results[name] = StitchResult(
                panorama=fin.panorama,
                mosaic=fin.mosaic,
                shifts=fin.shifts,
                corrected_shifts=fin.corrected,
                pairs=fin.pairs,
                timings=timings,
                # surfaced, not auto-recovered: the multi-run shares one
                # executable set across datasets; callers re-run the
                # flagged dataset via stitch_panorama (which recovers)
                capacity_stats=timings.pop("capacity_overflow", None),
            )
            if verbose:
                print(f"{name}: {fin.panorama.shape} in {td1 - td0:.2f} s "
                      f"(cumulative {td1 - t0:.2f} s)")
        stager.result()

    if verbose:
        print(f"stitched {len(folders)} panoramas in {time.time() - t0:.2f} s")
    return results


def _stitch_many_sharded(
    folders: Sequence[str],
    mesh,
    backend: str = "sift",
    margins: Optional[Dict[str, int]] = None,
    cfg: Optional[StitchConfig] = None,
    verbose: bool = False,
) -> Dict[str, StitchResult]:
    """Multi-chip throughput path: shift stage sharded over ``mesh``.

    Accepts a 1-D pano-only mesh (``parallel.make_mesh_pano`` — each
    device runs whole panoramas, the preferred layout when
    P >= n_devices: docs/MESH_COST_r03b.json measured ~1.0x per-pano
    cost vs 4x+ for image-axis sharding at small shapes) or the 2-D
    (pano, images) mesh (``parallel.make_mesh_2d`` — for P < n_devices
    with large images).  Same-shape datasets batch into a
    (P, N, H, W, 3) array sharded over the mesh axes; P and N are
    zero-padded up to mesh-axis multiples (padding panos/images produce
    no pairs that touch real data and are trimmed).  Finalize (incl.
    knife-edge escalation), planning, compose and crop reuse the
    single-device implementations per dataset.
    """
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.io import load_dataset_device
    from vfx_image_stitching_tpu.parallel.mesh import sharded_multi_pano_full
    from vfx_image_stitching_tpu.pipeline.stitch import finalize_to_panorama

    cfg = _resolve_cfg(backend, cfg)
    cfg = _autoscale_many(cfg, folders)
    margins = margins or {}
    names = [os.path.basename(os.path.normpath(f)) for f in folders]

    with cf.ThreadPoolExecutor(max_workers=max(1, len(folders))) as pool:
        loads = [
            pool.submit(load_dataset_device, f, with_host=True)
            for f in folders
        ]
        loaded = [f.result() for f in loads]

    # group same-(N, shape) datasets for batching
    groups: Dict[tuple, list] = {}
    for k, (batch, valid, focals, shape, host) in enumerate(loaded):
        groups.setdefault((batch.shape[0],) + tuple(shape), []).append(k)

    if mesh.devices.ndim == 1:
        # pano-only throughput mesh (parallel.make_mesh_pano): each
        # device runs whole panoramas — the preferred layout when
        # P >= n_devices (no image-axis halo collectives)
        pano_ax, img_ax = mesh.devices.shape[0], 1
    else:
        pano_ax, img_ax = mesh.devices.shape
    staged: Dict[int, tuple] = {}
    for key, members in groups.items():
        n = key[0]
        cyls = []
        for k in members:
            batch, valid, focals, shape, host = loaded[k]
            cyls.append(cylindrical_project_batch(batch, tuple(focals)))
        stacked = jnp.stack(cyls)
        p = stacked.shape[0]
        # pad both batch axes to mesh-axis multiples (sharding layouts
        # need equal shards); padding never touches a real pair
        p_pad = (-p) % pano_ax
        n_pad = (-n) % img_ax
        if p_pad or n_pad:
            stacked = jnp.pad(
                stacked, [(0, p_pad), (0, n_pad), (0, 0), (0, 0), (0, 0)]
            )
        xy, valid_kp, meta, stats, pair_out = sharded_multi_pano_full(
            stacked, mesh, cfg
        )

        for slot, k in enumerate(members):
            # trim the image/pair padding back off every leaf
            meta_k = (
                None if meta is None
                else {mk: mv[slot][:n] for mk, mv in meta.items()}
            )
            stats_k = (
                None if stats is None
                else {sk: sv[slot][:n] for sk, sv in stats.items()}
            )
            pair_k = tuple(pv[slot][: n - 1] for pv in pair_out)
            staged[k] = (
                cyls[slot], xy[slot][:n], valid_kp[slot][:n],
                meta_k, stats_k, pair_k,
            )

    results: Dict[str, StitchResult] = {}
    t0 = time.time()
    for k, name in enumerate(names):
        batch, valid, focals, (h, w, _c), host = loaded[k]
        cyl, xy_k, validkp_k, meta_k, stats_k, pair_k = staged[k]
        td0 = time.time()
        margin = margins.get(name, DEFAULT_CROP_MARGINS.get(name, 15))
        fin = finalize_to_panorama(
            cyl, xy_k, validkp_k, meta_k, stats_k, pair_k, list(valid), cfg,
            h, w, margin, host_images=host, focals=focals,
        )
        results[name] = StitchResult(
            panorama=fin.panorama,
            mosaic=fin.mosaic,
            shifts=fin.shifts,
            corrected_shifts=fin.corrected,
            pairs=fin.pairs,
            timings={"finalize_compose": time.time() - td0,
                     "total": time.time() - t0},
            capacity_stats=fin.detail.pop("capacity_overflow", None),
        )
        if verbose:
            print(f"{name}: {fin.panorama.shape}")
    return results
