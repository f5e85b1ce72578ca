"""End-to-end panorama stitching (run_panorama parity).

Pipeline phases mirror the reference driver (image_stitching_harris.py:
425-548 / image_stitching_sift.py:254-389):

  1. load + cylindrical projection          [host IO + device gather]
  2. pairwise shifts (features + match + voting RANSAC)   [device, batched]
  3. drift correction                        [host float64]
  4. sequential compositing                  [device lax.scan]
  5. rectangling crop                        [device reductions + host slice]

All per-image work is batched (N, H, W, 3) and vmapped; pairwise stages are
vmapped over the N-1 adjacent pairs.  Phase timers (with
``block_until_ready``) reproduce the reference's stdout timing format.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftCapacities, StitchConfig
from vfx_image_stitching_tpu.compose import (
    compose_mosaic,
    plan_compose,
    rectangle_crop,
)
from vfx_image_stitching_tpu.estimate import correct_drift, translation_ransac
from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
from vfx_image_stitching_tpu.io import save_bgr
from vfx_image_stitching_tpu.match import match_descriptors
from vfx_image_stitching_tpu.models.harris import harris_batch


# byte-packed result-bundle layout (finalize_pairwise_shifts): meta
# fields split by the smallest exact dtype; sentinels verify that the
# device's u8 bitcast byte order matches the host's little-endian views
_META_F32 = ("size", "angle", "octave")   # octave packs < 2^24: f32-exact
_META_U16 = ("ix", "iy", "jx", "jy", "jl")  # cell coords < 2^16
_SENTINEL_F32 = np.float32(3.1415927)
_SENTINEL_U16 = np.uint16(0x0102)

# escalation-block compaction capacities (_pack_bundle_esc): measured
# maxima over the four reference datasets are 744 needed meta rows and
# 180 border-swap rows TOTAL (scripts in docs/DEVNOTES.md round 3), so
# these defaults carry ~5x/11x headroom; overflow falls back to a full
# pull with a warning.  Override via VFX_ESC_CAP_META/VFX_ESC_CAP_CAND.
_ESC_CAP_META = 4096
_ESC_CAP_CAND = 2048


def _assemble_bundle(f32_parts, u16_parts, u8_parts):
    """Concat typed parts into one u8 buffer (trace-time helper)."""
    f32_seq = [jnp.full((1,), _SENTINEL_F32, jnp.float32)] + [
        p.reshape(-1).astype(jnp.float32) for p in f32_parts
    ]
    u16_seq = [jnp.full((1,), _SENTINEL_U16, jnp.uint16)] + [
        p.reshape(-1).astype(jnp.uint16) for p in u16_parts
    ]
    segs = [
        jax.lax.bitcast_convert_type(
            jnp.concatenate(f32_seq), jnp.uint8
        ).reshape(-1),
        jax.lax.bitcast_convert_type(
            jnp.concatenate(u16_seq), jnp.uint8
        ).reshape(-1),
    ]
    if u8_parts:
        segs.append(
            jnp.concatenate([p.reshape(-1).astype(jnp.uint8)
                             for p in u8_parts])
        )
    return jnp.concatenate(segs)


@jax.jit
def _pack_bundle(f32_parts, u16_parts, u8_parts):
    """Typed u8 result bundle, packed in ONE dispatched executable.

    Un-jitted, the ~30 reshape/astype/concat/bitcast ops here would each
    be a separate tunneled dispatch on this backend (docs/DEVNOTES.md);
    jitting keys the trace on the pytree structure, which is fixed per
    pipeline config.
    """
    return _assemble_bundle(f32_parts, u16_parts, u8_parts)


@functools.partial(jax.jit, static_argnames=("n",))
def _split_u8(buf: jnp.ndarray, n: int):
    """Ceil-split a 1-D u8 buffer into n chunks as ONE executable."""
    from vfx_image_stitching_tpu.compose.crop import ceil_split

    return ceil_split(buf, n)


def _pull_bundle(bundle_dev) -> np.ndarray:
    """Device->host pull of the packed result bundle.

    VFX_BUNDLE_STRIPS > 1 pulls ceil-split chunks concurrently from
    host threads — the same link-multiplexing trick the mosaic pull
    uses (compose/crop.pull_strips, docs/CHIP_AB_R3B.json); default 1
    (single fetch) pending an on-chip win.
    """
    n = int(os.environ.get("VFX_BUNDLE_STRIPS", "1"))
    if n <= 1:
        return np.asarray(bundle_dev)
    from vfx_image_stitching_tpu.compose.crop import pull_strips

    return pull_strips(_split_u8(bundle_dev, n))


def _pack_bits(flat_bool: jnp.ndarray) -> jnp.ndarray:
    """(M,) bool -> (ceil(M/8),) u8, little-endian bit order."""
    m = flat_bool.shape[0]
    pad = (-m) % 8
    if pad:
        flat_bool = jnp.concatenate(
            [flat_bool, jnp.zeros((pad,), bool)]
        )
    b = flat_bool.reshape(-1, 8).astype(jnp.uint8)
    w = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, :]
    return jnp.sum(b * w, axis=1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cap_meta", "cap_cand"))
def _pack_bundle_esc(
    head_f32, xy, meta, valid_kp, bestb, candidx, candinm,
    matched, bflip, bswap, material, cap_meta: int, cap_cand: int,
):
    """Result bundle with the escalation block COMPACTED on device.

    The strict host path (models/sift/strict.py) only ever reads

      * keypoint ``meta`` at borderline rows of the pair's A image and
        at their best/in-margin candidate indices in the B image
        (``material ⊆ borderline`` by construction — the device vote
        analysis only marks borderline rows, estimate/ransac.py), and
      * ``cand_idx``/``cand_inm`` at border-swap rows (both the strict
        re-rank candidate list and the host materiality replay's swap
        scenarios restrict to them),

    so shipping those arrays at FULL (n_img/n_pair, kcap) shape moves
    ~2 MB of bytes that are never read.  This packer scatters the
    needed meta rows (flat image*kcap indices, f32-exact < 2^24) into a
    ``cap_meta``-row block and the border-swap candidate rows into a
    ``cap_cand``-row block, and bit-packs the five boolean masks.  The
    full-shape arrays the host genuinely consumes everywhere (``xy``
    for the f64 re-vote moves, ``bestb``, the masks) still ride whole.
    Overflow (more needed rows than capacity) is detected on host from
    the shipped counts; the caller falls back to pulling the original
    device arrays directly (correct, just slower) and warns.

    Measured layout on parrington (18 images, kcap 3072): 3.2 MB full
    -> ~0.75 MB compact on the first sync of every warm run.
    """
    n_img, kcap = valid_kp.shape
    n1 = matched.shape[0]
    borderline = bflip | bswap

    # B-side needed rows: best_b of borderline rows + in-margin
    # candidates of border-swap rows (scatter; kcap col sentinel drops)
    pair_rows = jnp.arange(n1, dtype=jnp.int32)[:, None]
    bcols = jnp.where(borderline, bestb.astype(jnp.int32), kcap)
    b_mask = jnp.zeros((n1, kcap), bool)
    b_mask = b_mask.at[pair_rows, bcols].max(True, mode="drop")
    ccols = jnp.where(
        bswap[..., None] & candinm, candidx.astype(jnp.int32), kcap
    )
    b_mask = b_mask.at[
        jnp.broadcast_to(pair_rows[..., None], ccols.shape), ccols
    ].max(True, mode="drop")

    needed = jnp.zeros((n_img, kcap), bool)
    needed = needed.at[:n1].max(borderline)   # pair i's A image is i
    needed = needed.at[1:].max(b_mask)        # pair i's B image is i+1

    flat_needed = needed.reshape(-1)
    tgt = jnp.where(
        flat_needed, jnp.cumsum(flat_needed) - 1, cap_meta
    )
    cnt_meta = jnp.sum(flat_needed)
    iota = jnp.arange(flat_needed.shape[0], dtype=jnp.float32)
    meta_idx = jnp.zeros((cap_meta,), jnp.float32).at[tgt].set(
        iota, mode="drop"
    )

    def compact_meta(name, dtype):
        return jnp.zeros((cap_meta,), dtype).at[tgt].set(
            meta[name].reshape(-1).astype(dtype), mode="drop"
        )

    meta_f32_c = [compact_meta(k, jnp.float32) for k in _META_F32]
    meta_u16_c = [compact_meta(k, jnp.uint16) for k in _META_U16]

    flat_sw = bswap.reshape(-1)
    tgt2 = jnp.where(flat_sw, jnp.cumsum(flat_sw) - 1, cap_cand)
    cnt_cand = jnp.sum(flat_sw)
    iota2 = jnp.arange(flat_sw.shape[0], dtype=jnp.float32)
    cand_rowidx = jnp.zeros((cap_cand,), jnp.float32).at[tgt2].set(
        iota2, mode="drop"
    )
    n_cand = candidx.shape[-1]
    candidx_c = jnp.zeros((cap_cand, n_cand), jnp.uint16).at[tgt2].set(
        candidx.reshape(-1, n_cand).astype(jnp.uint16), mode="drop"
    )
    candinm_c = jnp.zeros((cap_cand, n_cand), jnp.uint8).at[tgt2].set(
        candinm.reshape(-1, n_cand).astype(jnp.uint8), mode="drop"
    )

    bits = _pack_bits(
        jnp.concatenate(
            [valid_kp.reshape(-1), matched.reshape(-1),
             bflip.reshape(-1), bswap.reshape(-1), material.reshape(-1)]
        )
    )

    f32_parts = list(head_f32) + [
        jnp.stack([cnt_meta, cnt_cand]).astype(jnp.float32),
        xy, meta_idx,
    ] + meta_f32_c + [cand_rowidx]
    u16_parts = [bestb] + meta_u16_c + [candidx_c]
    u8_parts = [bits, candinm_c]
    return _assemble_bundle(f32_parts, u16_parts, u8_parts)


@dataclasses.dataclass
class StitchResult:
    panorama: np.ndarray                  # cropped final panorama (BGR u8)
    mosaic: np.ndarray                    # uncropped mosaic
    shifts: List[Tuple[float, float]]     # raw pairwise shifts
    corrected_shifts: List[Tuple[float, float]]
    pairs: List[Optional[Tuple[Tuple[float, float], Tuple[float, float]]]]
    timings: dict
    steps: Optional[List[np.ndarray]] = None
    # host capacity stats, present ONLY when a SIFT stage count hit its
    # capacity during this run (keypoints may have been truncated); the
    # stitch_panorama recovery loop re-runs with grown capacities and
    # returns a result whose capacity_stats is None
    capacity_stats: Optional[dict] = None


@functools.partial(
    jax.jit,
    static_argnames=("desc_thresh", "ransac_thresh", "refine", "margin"),
)
def _pair_shift(
    xy_a, desc_a, valid_a, xy_b, desc_b, valid_b,
    desc_thresh: float, ransac_thresh: float, refine: int = 8,
    margin: float = 0.0,
):
    """Shift + winning pair for one adjacent image pair (fixed shape).

    Returns the 15-tuple ``(shift, pair_a, pair_b, any_match, n_matched,
    best_b, cand_idx, cand_dist, cand_inm, matched, border_flip,
    border_swap, material, n_material, max_inmargin)``.  ``cand_inm``
    marks the exported candidates within ``margin`` of the row's best —
    the exact set the strict re-rank may consider (shipping the mask
    instead of f32 distances keeps the host bundle small).  With ``margin > 0`` the
    escalation signals are live (see models/sift/strict.py):
    ``border_flip`` rows sit within ``margin`` of the absolute
    threshold, ``border_swap`` rows within ``margin`` of their argmin
    runner-up (matched or not — a row that strictly flips to matched
    needs its argmin re-ranked too) — either could flip under +-1
    descriptor quantization; ``cand_idx``/``cand_dist`` carry the top-4
    candidate set the strict re-rank draws from; ``material`` marks the
    subset whose change could alter the winning hypothesis (the exact
    per-candidate scenario analysis runs on device inside the vote,
    estimate/ransac.py), so the host is only involved when a seam
    genuinely hangs on quantization noise.  ``max_inmargin`` is the
    largest in-margin candidate count over the borderline-swap rows —
    the guard for the top-4 candidate capacity (the pipeline warns when
    it exceeds the candidates the strict re-rank can see).
    """
    best_b, matched, best_dist, second, cand_idx, cand_dist, n_inmargin = (
        match_descriptors(
            desc_a, valid_a, desc_b, valid_b, desc_thresh, refine=refine,
            return_dist=True, margin=margin,
        )
    )
    pts_a = xy_a.astype(jnp.float32)
    pts_b = xy_b[best_b].astype(jnp.float32)
    moves = pts_a - pts_b
    if margin > 0:
        border_flip = valid_a & (jnp.abs(best_dist - desc_thresh) < margin)
        # argmin knife edge: relevant when the row is matched now OR could
        # strictly flip to matched (an unmatched row far beyond the
        # threshold stays unmatched whichever candidate wins its argmin)
        border_swap = (
            valid_a & ((second - best_dist) < margin)
            & (matched | border_flip)
        )
        # alternative hypothesis moves for the exact swap scenarios: the
        # non-best top-k candidates within margin of the row's best (only
        # those can strictly win the argmin)
        cand_inm = cand_dist < cand_dist[:, :1] + margin
        alt_valid = cand_inm[:, 1:]
        alt_moves = pts_a[:, None, :] - xy_b[cand_idx[:, 1:]].astype(
            jnp.float32
        )
        from vfx_image_stitching_tpu.estimate.ransac import (
            translation_ransac_material,
        )

        best_i, votes, any_match, material, n_material = (
            translation_ransac_material(moves, matched, border_flip,
                                        border_swap, alt_moves, alt_valid,
                                        ransac_thresh)
        )
        max_inmargin = jnp.max(
            jnp.where(border_swap, n_inmargin, 0), initial=0
        ).astype(jnp.int32)
    else:
        best_i, votes, any_match = translation_ransac(
            moves, matched, ransac_thresh
        )
        border_flip = jnp.zeros_like(matched)
        border_swap = border_flip
        material = border_flip
        n_material = jnp.int32(0)
        max_inmargin = jnp.int32(0)
        cand_inm = jnp.zeros_like(cand_dist, dtype=bool)
    shift = jnp.where(any_match, moves[best_i], jnp.zeros(2, jnp.float32))
    pair_a = jnp.where(any_match, pts_a[best_i], jnp.zeros(2, jnp.float32))
    pair_b = jnp.where(any_match, pts_b[best_i], jnp.zeros(2, jnp.float32))
    return (
        shift, pair_a, pair_b, any_match, jnp.sum(matched),
        best_b, cand_idx, cand_dist, cand_inm, matched, border_flip,
        border_swap, material, n_material, max_inmargin,
    )


def _resolve_cfg(backend: str, cfg: Optional[StitchConfig]) -> StitchConfig:
    """Normalize backend selection + environment knobs into the config."""
    cfg = cfg or StitchConfig(backend=backend)
    if cfg.backend != backend:
        cfg = dataclasses.replace(cfg, backend=backend)
    split_env = os.environ.get("VFX_LOCALIZE_SPLIT")
    if split_env is not None and (split_env == "1") != cfg.sift.localize_split:
        cfg = dataclasses.replace(
            cfg, sift=dataclasses.replace(
                cfg.sift, localize_split=split_env == "1"
            )
        )
    slim_env = os.environ.get("VFX_LOCALIZE_SLIM")
    if slim_env is not None and (slim_env == "1") != cfg.sift.localize_slim:
        cfg = dataclasses.replace(
            cfg, sift=dataclasses.replace(
                cfg.sift, localize_slim=slim_env == "1"
            )
        )
    res_env = os.environ.get("VFX_LOCALIZE_RESIDENT")
    if res_env is None and not cfg.sift.localize_resident:
        # Default ON for real-chip runs: the interleaved on-chip A/B
        # (docs/CHIP_AB_R5A.json, 12 rounds) has resident localize at
        # 0.451 s median vs 0.487 s plain on the headline stitch with
        # shifts_ok every round, and end-to-end byte parity on all four
        # datasets is certified by docs/RESIDENT_E2E_r05.json.  CPU
        # (tests) keeps the plain path — the kernel would only run in
        # slow interpret mode there.
        res_env = "1" if jax.default_backend() == "tpu" else None
    if res_env is not None and (
            (res_env == "1") != cfg.sift.localize_resident):
        cfg = dataclasses.replace(
            cfg, sift=dataclasses.replace(
                cfg.sift, localize_resident=res_env == "1"
            )
        )
    if os.environ.get("VFX_USE_PALLAS") == "1":
        # chip runs opt in via env; the Pallas window gather rides along
        # (docs/CHIP_AB_R3B.json: best config -0.11 s median vs base,
        # shifts_ok all rounds) unless VFX_PALLAS_GATHER=0 pins the XLA
        # dynamic_slice gather for A/B.
        gather = os.environ.get("VFX_PALLAS_GATHER", "1") == "1"
        if not cfg.sift.use_pallas or (
            gather and not cfg.sift.capacities.desc_pallas_gather
        ):
            cfg = dataclasses.replace(
                cfg,
                sift=dataclasses.replace(
                    cfg.sift,
                    use_pallas=True,
                    capacities=dataclasses.replace(
                        cfg.sift.capacities, desc_pallas_gather=gather
                    ),
                ),
            )
    return cfg


def _autoscale_sift_caps(cfg: StitchConfig, folder, pano_file=None,
                         hw=None) -> Tuple[StitchConfig, bool]:
    """Swap in area-scaled SIFT capacities for larger-than-audited inputs.

    The default capacity tables were audited on the reference datasets
    (largest image 708x434); a user pointing the pipeline at bigger
    photos would otherwise overflow them (overflow warns, but drops
    keypoints).  Only the DEFAULT tables are ever touched — explicitly
    configured capacities are the user's contract.  At reference-dataset
    sizes this is the identity, so every audited executable keeps its
    exact shapes.  Size comes from the first image's header
    (io.peek_image_size), not a pixel decode.

    Returns ``(cfg, managed)``: ``managed`` is True when the capacities
    are framework-owned (the defaults, possibly area-scaled here) — the
    gate for the driver's overflow-recovery loop, which must never
    override a user's explicitly configured capacity contract.
    """
    if cfg.backend != "sift":
        return cfg, False
    caps = cfg.sift.capacities
    default = SiftCapacities()
    # env toggles (_resolve_cfg) ride on the capacities dataclass;
    # normalize them before deciding whether the user customized caps
    if dataclasses.replace(
        caps, desc_pallas_gather=default.desc_pallas_gather
    ) != default:
        return cfg, False
    if hw is None:
        from vfx_image_stitching_tpu.io import peek_image_size

        hw = peek_image_size(folder, pano_file)
    if hw is None:
        return cfg, True
    scaled = caps.scaled_for_area(*hw)
    if scaled == caps:
        return cfg, True
    return dataclasses.replace(
        cfg, sift=dataclasses.replace(cfg.sift, capacities=scaled)
    ), True


def extract_features(cyl: jnp.ndarray, cfg: StitchConfig):
    """Dispatch batched feature extraction (async; device arrays).

    Returns ``(xy, descs, valid_kp, meta, stats)``; ``meta``/``stats``
    are ``None`` for the Harris backend.
    """
    if cfg.backend == "harris":
        xy, descs, valid_kp = harris_batch(cyl, cfg.harris)
        return xy, descs, valid_kp, None, None
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_batch_with_stats,
    )

    mode = os.environ.get("VFX_SIFT_BATCH_MODE", "map")
    return sift_batch_with_stats(cyl, cfg.sift, mode)


def _concat_feats(feats_list):
    """Concatenate per-group extract_features outputs along the image axis."""
    if len(feats_list) == 1:
        return feats_list[0]

    def cat(idx):
        return jnp.concatenate([f[idx] for f in feats_list])

    def cat_dict(idx):
        if feats_list[0][idx] is None:
            return None
        keys = feats_list[0][idx]
        return {
            k: jnp.concatenate([f[idx][k] for f in feats_list]) for k in keys
        }

    return cat(0), cat(1), cat(2), cat_dict(3), cat_dict(4)


def dispatch_pair_step(xy, descs, valid_kp, cfg: StitchConfig):
    """Dispatch the vmapped adjacent-pair step (async).

    Returns the 15-tuple of :func:`_pair_shift` outputs with a leading
    (N-1) pair axis — see its docstring for the field list.
    """
    mcfg = cfg.match()
    pair_fn = jax.vmap(
        functools.partial(
            _pair_shift,
            desc_thresh=mcfg.desc_thresh,
            ransac_thresh=mcfg.ransac_thresh,
            refine=mcfg.refine,
            margin=mcfg.borderline_margin,
        )
    )
    return pair_fn(
        xy[:-1], descs[:-1], valid_kp[:-1],
        xy[1:], descs[1:], valid_kp[1:],
    )


def _build_bundle(xy, valid_kp, meta, stats, pair_out, cfg: StitchConfig):
    """Pack the finalize result bundle on device (async dispatch).

    Returns ``(bundle_dev, info)`` where ``info`` records the layout
    decisions (esc_present / compact / caps) so a bundle packed at
    dispatch time can be safely matched against the consumer's expected
    layout in :func:`finalize_pairwise_shifts`.
    """
    mcfg = cfg.match()
    (
        shifts_d, pa_d, pb_d, any_d, counts_d,
        bestb_d, candidx_d, canddist_d, candinm_d, matched_d, bflip_d,
        bswap_d, material_d, nmaterial_d, maxinm_d,
    ) = pair_out
    head_f32 = [
        shifts_d, pa_d, pb_d, any_d, counts_d, nmaterial_d, maxinm_d,
    ]
    for key in sorted(stats) if stats is not None else []:
        head_f32.append(stats[key])
    esc_present = meta is not None and mcfg.borderline_margin > 0
    compact = esc_present and os.environ.get("VFX_ESC_COMPACT", "1") == "1"
    info = dict(esc_present=esc_present, compact=compact)
    if compact:
        cap_meta = int(os.environ.get("VFX_ESC_CAP_META", _ESC_CAP_META))
        cap_cand = int(os.environ.get("VFX_ESC_CAP_CAND", _ESC_CAP_CAND))
        info.update(cap_meta=cap_meta, cap_cand=cap_cand)
        bundle_dev = _pack_bundle_esc(
            head_f32, xy, meta, valid_kp, bestb_d, candidx_d, candinm_d,
            matched_d, bflip_d, bswap_d, material_d,
            cap_meta=cap_meta, cap_cand=cap_cand,
        )
        return bundle_dev, info
    f32_parts, u16_parts, u8_parts = list(head_f32), [], []
    if esc_present:
        # legacy full-shape escalation block (VFX_ESC_COMPACT=0):
        # octave packs into < 2^24 so the f32 ride is exact; the cell
        # coordinates (ix/iy/jx/jy/jl) and all B indices fit u16
        f32_parts.append(xy)
        for key in _META_F32:
            f32_parts.append(meta[key])
        for key in _META_U16:
            u16_parts.append(meta[key])
        u16_parts.append(bestb_d)
        u16_parts.append(candidx_d)
        for arr in (valid_kp, candinm_d, matched_d, bflip_d, bswap_d,
                    material_d):
            u8_parts.append(arr)
    return _pack_bundle(f32_parts, u16_parts, u8_parts), info


def dispatch_result_bundle(xy, valid_kp, meta, stats, pair_out, cfg):
    """Pack the result bundle and START its device->host copy (async).

    For pipelined multi-dataset runs (pipeline/multi.py): issuing the
    d2h copy at DISPATCH time lets a small (sub-MB) bundle cross the
    tunneled link as soon as its device work finishes, instead of
    queueing behind later datasets' multi-MB uploads — wind's finalize
    spent 0.295 s in that queue (docs/PHASE_BUDGET_MULTI_r04.json).
    Returns an opaque handle for ``finalize_pairwise_shifts(bundle=)``;
    the packed layout is recorded so the consumer repacks instead if
    its expected layout ever differs.
    """
    bundle_dev, info = _build_bundle(xy, valid_kp, meta, stats, pair_out, cfg)
    try:
        bundle_dev.copy_to_host_async()
    except Exception:  # pragma: no cover - backend-optional fast path
        pass
    return bundle_dev, info


def compute_pairwise_shifts(
    cyl: jnp.ndarray,
    valid: Sequence[bool],
    cfg: StitchConfig,
    host_images: Optional[Sequence] = None,
    focals: Optional[Sequence[float]] = None,
) -> Tuple[List[Tuple[float, float]], List[Optional[tuple]], np.ndarray]:
    """Batched feature extraction + adjacent-pair shift estimation.

    Returns (shifts, pairs, match_counts); unreadable images produce the
    reference's degraded ((0,0), dummy pair) entries
    (image_stitching_harris.py:479-482).
    """
    xy, descs, valid_kp, meta, stats = extract_features(cyl, cfg)
    pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
    return finalize_pairwise_shifts(
        cyl, xy, valid_kp, meta, stats, pair_out, valid, cfg,
        host_images=host_images, focals=focals,
    )


def finalize_pairwise_shifts(
    cyl, xy, valid_kp, meta, stats, pair_out, valid: Sequence[bool],
    cfg: StitchConfig,
    host_images: Optional[Sequence] = None,
    focals: Optional[Sequence[float]] = None,
    timings_out: Optional[dict] = None,
    pre_escalate_cb=None,
    bundle=None,
) -> Tuple[List[Tuple[float, float]], List[Optional[tuple]], np.ndarray]:
    """Pull pair results, warn on capacity hits, escalate knife edges.

    With ``timings_out`` (a dict) the host-side phase budget is recorded
    into it: ``bundle_pull_s`` (the first device sync — includes waiting
    for extract + pair compute and the tunneled transfer) and
    ``escalate_s`` (host strict re-decisions incl. the escalation-input
    bundle pull).

    ``bundle`` — an optional :func:`dispatch_result_bundle` handle whose
    d2h copy was started at dispatch time; used (skipping the pack here)
    when its recorded layout matches this call's expected one.

    ``pre_escalate_cb(shifts_np, pa_np, pb_np, any_np, esc_rows)`` —
    when given — fires with COPIES of the pre-escalation device
    decisions plus the list of pair rows about to be escalated, just
    before the (host, tens-of-ms) escalation loop starts, so a caller
    can speculatively begin composing while escalation re-derives the
    rare knife-edge pairs (finalize_to_panorama overlaps the host
    compose fold this way — escalation almost always confirms the
    device result, and ``esc_rows`` bounds which fold bands it could
    ever change, enabling the snapshot/patch resume).
    """
    mcfg = cfg.match()
    (
        shifts_d, pa_d, pb_d, any_d, counts_d,
        bestb_d, candidx_d, canddist_d, candinm_d, matched_d, bflip_d,
        bswap_d, material_d, nmaterial_d, maxinm_d,
    ) = pair_out

    # ONE device->host transfer for EVERYTHING the finalize needs: on a
    # tunneled/high-RTT link every np.asarray is a round trip, so the
    # shifts/pairs/flags/counts, the capacity stats AND (for the SIFT
    # escalation path) the per-row keypoint/candidate arrays all ride a
    # single fixed-shape bundle.  Round 2 pulled the escalation inputs
    # as a second bundle gated on n_material > 0; the second dispatch +
    # round trip cost ~0.2 s warm (docs/PHASE_BUDGET_r03.json) vs
    # ~50 ms of extra transfer for always including them — and a fixed
    # shape means the executable never depends on which pairs escalate.
    # The buffer is BYTE-PACKED (u8) with typed regions — f32, then
    # u16 (small integer fields), then u8 (masks) — which shrinks the
    # escalation block ~40% vs an all-f32 ride; leading f32/u16
    # sentinels catch any device<->host byte-order mismatch loudly.
    n1 = int(shifts_d.shape[0])
    head_f32 = [
        shifts_d, pa_d, pb_d, any_d, counts_d, nmaterial_d, maxinm_d,
    ]
    stat_keys = sorted(stats) if stats is not None else []
    for key in stat_keys:
        head_f32.append(stats[key])
    esc_present = meta is not None and mcfg.borderline_margin > 0
    compact = esc_present and os.environ.get("VFX_ESC_COMPACT", "1") == "1"
    if esc_present:
        n_img, kcap = xy.shape[:2]
        n_cand = int(candidx_d.shape[-1])
    f32_parts, u16_parts, u8_parts = list(head_f32), [], []
    expected = dict(esc_present=esc_present, compact=compact)
    if compact:
        cap_meta = int(os.environ.get("VFX_ESC_CAP_META", _ESC_CAP_META))
        cap_cand = int(os.environ.get("VFX_ESC_CAP_CAND", _ESC_CAP_CAND))
        expected.update(cap_meta=cap_meta, cap_cand=cap_cand)
    elif esc_present:
        # legacy full-shape escalation block (VFX_ESC_COMPACT=0): the
        # parts lists double as the unpack size map below; packing
        # itself happens in _build_bundle
        f32_parts.append(xy)
        for key in _META_F32:
            f32_parts.append(meta[key])
        for key in _META_U16:
            u16_parts.append(meta[key])
        u16_parts.append(bestb_d)
        u16_parts.append(candidx_d)
        for arr in (valid_kp, candinm_d, matched_d, bflip_d, bswap_d,
                    material_d):
            u8_parts.append(arr)
    _tb0 = time.time()
    if bundle is not None and bundle[1] == expected:
        bundle_dev = bundle[0]  # packed + d2h-prefetched at dispatch time
    else:
        bundle_dev, _ = _build_bundle(
            xy, valid_kp, meta, stats, pair_out, cfg
        )
    bundle_u8 = _pull_bundle(bundle_dev)
    if timings_out is not None:
        timings_out["bundle_pull_s"] = time.time() - _tb0
        timings_out["bundle_bytes"] = int(bundle_u8.nbytes)

    if compact:
        head_n = sum(int(np.prod(p.shape)) for p in head_f32)
        n_f32 = 1 + head_n + 2 + n_img * kcap * 2 + cap_meta * 4 + cap_cand
        n_u16 = 1 + n1 * kcap + cap_meta * 5 + cap_cand * n_cand
    else:
        n_f32 = 1 + sum(int(np.prod(p.shape)) for p in f32_parts)
        n_u16 = 1 + sum(int(np.prod(p.shape)) for p in u16_parts)
    bundle = bundle_u8[: 4 * n_f32].view(np.float32)
    bundle_u16 = bundle_u8[4 * n_f32 : 4 * n_f32 + 2 * n_u16].view(np.uint16)
    bundle_u8 = bundle_u8[4 * n_f32 + 2 * n_u16 :]
    if bundle[0] != _SENTINEL_F32 or bundle_u16[0] != _SENTINEL_U16:
        raise RuntimeError(
            "bundle byte-order sentinel mismatch: device bitcast bytes "
            "do not match host little-endian views "
            f"(f32 {bundle[0]!r}, u16 {bundle_u16[0]!r})"
        )
    bundle = bundle[1:]
    bundle_u16 = bundle_u16[1:]

    shifts_np = bundle[: 2 * n1].reshape(n1, 2).astype(np.float64)
    pa_np = bundle[2 * n1 : 4 * n1].reshape(n1, 2).astype(np.float64)
    pb_np = bundle[4 * n1 : 6 * n1].reshape(n1, 2).astype(np.float64)
    any_np = bundle[6 * n1 : 7 * n1] != 0.0
    counts = bundle[7 * n1 : 8 * n1].astype(np.int64)
    nmaterial_np = bundle[8 * n1 : 9 * n1].astype(np.int64)
    maxinm_np = bundle[9 * n1 : 10 * n1].astype(np.int64)
    off = 10 * n1

    # top-4 candidate-capacity guard: the strict re-rank can only consider
    # the candidates the device exported, so an in-margin candidate count
    # beyond that capacity is surfaced, never silently dropped
    n_cand_cap = int(candidx_d.shape[-1])
    if (maxinm_np > n_cand_cap).any():
        import warnings

        worst = int(maxinm_np.max())
        pairs_over = np.nonzero(maxinm_np > n_cand_cap)[0].tolist()
        warnings.warn(
            "strict escalation candidate capacity exceeded: a borderline "
            f"row has {worst} in-margin candidates but only the top "
            f"{n_cand_cap} are re-ranked (pairs {pairs_over}); parity may "
            "degrade — raise the candidate width in match_descriptors",
            RuntimeWarning, stacklevel=2,
        )
    if stats is not None:
        import warnings

        from vfx_image_stitching_tpu.utils.capacity import (
            capacity_overflow_report,
        )

        host_stats = {}
        for key in stat_keys:
            size = int(np.prod(stats[key].shape))
            host_stats[key] = bundle[off : off + size].reshape(
                stats[key].shape
            )
            off += size
        overflow_msgs = capacity_overflow_report(host_stats)
        for msg in overflow_msgs:
            warnings.warn(f"SIFT capacity: {msg}", RuntimeWarning, stacklevel=2)
        if overflow_msgs and timings_out is not None:
            # ride the stats up to the driver so its recovery loop can
            # re-run with capacities grown to fit (grown_to_fit) instead
            # of silently truncating keypoints on denser-than-audited
            # content
            timings_out["capacity_overflow"] = host_stats

    # knife-edge precision escalation (models/sift/strict.py): pairs where
    # a borderline decision is MATERIAL (flipping it would change the
    # winning hypothesis — decided on device inside the vote) are
    # re-decided on host with reference-exact arithmetic + an f64 re-vote.
    # The inputs were already pulled in the single bundle above.
    if esc_present and nmaterial_np.any():
        esc_rows = [
            int(i) for i in np.nonzero(nmaterial_np > 0)[0]
            if valid[int(i)] and valid[int(i) + 1]
        ]
        if pre_escalate_cb is not None:
            pre_escalate_cb(
                shifts_np.copy(), pa_np.copy(), pb_np.copy(), any_np.copy(),
                esc_rows,
            )
        _te0 = time.time()
        from vfx_image_stitching_tpu.models.sift.strict import escalate_pair

        def taker(region, start):
            pos = [start]

            def take(shape):
                size = int(np.prod(shape))
                out = region[pos[0] : pos[0] + size].reshape(shape)
                pos[0] += size
                return out

            return take

        take_f = taker(bundle, off)
        if compact:
            cnts = take_f((2,)).astype(np.int64)
            cnt_meta, cnt_cand = int(cnts[0]), int(cnts[1])
            xy_np = take_f((n_img, kcap, 2)).astype(np.float64)
            meta_idx = take_f((cap_meta,)).astype(np.int64)
            meta_c = {key: take_f((cap_meta,)) for key in _META_F32}
            cand_rowidx = take_f((cap_cand,)).astype(np.int64)
            take_u16 = taker(bundle_u16, 0)
            bestb_np = take_u16((n1, kcap)).astype(np.int64)
            for key in _META_U16:
                meta_c[key] = take_u16((cap_meta,))
            candidx_c = take_u16((cap_cand, n_cand)).astype(np.int64)
            take_u8 = taker(bundle_u8, 0)
            nbits = (n_img + 4 * n1) * kcap
            packed = take_u8((-(-nbits // 8),))
            bits = np.unpackbits(packed, bitorder="little")[:nbits] != 0
            validkp_np = bits[: n_img * kcap].reshape(n_img, kcap)
            rest = bits[n_img * kcap :].reshape(4, n1, kcap)
            matched_np, bflip_np, bswap_np, material_np = rest
            candinm_c = take_u8((cap_cand, n_cand)) != 0

            # reconstruct full shapes; rows outside the shipped sets are
            # zero — provably never read by escalate_pair (see
            # _pack_bundle_esc).  Capacity overflow falls back to pulling
            # the original device arrays (slower second fetch, correct).
            import warnings

            if cnt_meta > cap_meta:
                warnings.warn(
                    f"escalation meta compaction overflow ({cnt_meta} needed "
                    f"rows > capacity {cap_meta}); pulling full metadata — "
                    "raise VFX_ESC_CAP_META", RuntimeWarning, stacklevel=2,
                )
                meta_np = {
                    key: np.asarray(meta[key]) for key in
                    _META_F32 + _META_U16
                }
            else:
                meta_np = {}
                for key in _META_F32:
                    full = np.zeros(n_img * kcap, np.float32)
                    full[meta_idx[:cnt_meta]] = meta_c[key][:cnt_meta]
                    meta_np[key] = full.reshape(n_img, kcap)
                for key in _META_U16:
                    full = np.zeros(n_img * kcap, np.uint16)
                    full[meta_idx[:cnt_meta]] = meta_c[key][:cnt_meta]
                    meta_np[key] = full.reshape(n_img, kcap)
            if cnt_cand > cap_cand:
                warnings.warn(
                    f"escalation candidate compaction overflow ({cnt_cand} "
                    f"swap rows > capacity {cap_cand}); pulling full "
                    "candidate arrays — raise VFX_ESC_CAP_CAND",
                    RuntimeWarning, stacklevel=2,
                )
                candidx_np = np.asarray(candidx_d).astype(np.int64)
                candinm_np = np.asarray(candinm_d) != 0
            else:
                candidx_np = np.zeros((n1 * kcap, n_cand), np.int64)
                candidx_np[cand_rowidx[:cnt_cand]] = candidx_c[:cnt_cand]
                candidx_np = candidx_np.reshape(n1, kcap, n_cand)
                candinm_np = np.zeros((n1 * kcap, n_cand), bool)
                candinm_np[cand_rowidx[:cnt_cand]] = candinm_c[:cnt_cand]
                candinm_np = candinm_np.reshape(n1, kcap, n_cand)
        else:
            xy_np = take_f((n_img, kcap, 2)).astype(np.float64)
            meta_np = {key: take_f((n_img, kcap)) for key in _META_F32}
            take_u16 = taker(bundle_u16, 0)
            for key in _META_U16:
                meta_np[key] = take_u16((n_img, kcap))
            bestb_np = take_u16((n1, kcap)).astype(np.int64)
            candidx_np = take_u16((n1, kcap, n_cand)).astype(np.int64)
            take_u8 = taker(bundle_u8, 0)
            validkp_np = take_u8((n_img, kcap)) != 0
            candinm_np = take_u8((n1, kcap, n_cand)) != 0
            matched_np = take_u8((n1, kcap)) != 0
            bflip_np = take_u8((n1, kcap)) != 0
            bswap_np = take_u8((n1, kcap)) != 0
            material_np = take_u8((n1, kcap)) != 0
        if timings_out is not None:
            timings_out["esc_parse_s"] = time.time() - _te0
            timings_out["esc_n_pairs"] = int((nmaterial_np > 0).sum())

        cyl_host_cache: dict = {}

        def cyl_host(i: int) -> np.ndarray:
            if i not in cyl_host_cache:
                if host_images is not None and focals is not None and (
                    host_images[i] is not None
                ):
                    from vfx_image_stitching_tpu.geometry.cylindrical import (
                        cylindrical_project_host_cached,
                    )

                    cyl_host_cache[i] = cylindrical_project_host_cached(
                        host_images[i], float(focals[i])
                    )
                else:
                    cyl_host_cache[i] = np.asarray(cyl[i])
            return cyl_host_cache[i]

        def _escalate_one(i: int):
            meta_a = {k: v[i] for k, v in meta_np.items()}
            meta_b = {k: v[i + 1] for k, v in meta_np.items()}
            return escalate_pair(
                cyl_host(i), cyl_host(i + 1),
                xy_np[i], meta_a, xy_np[i + 1], meta_b,
                validkp_np[i], bestb_np[i], candidx_np[i], candinm_np[i],
                matched_np[i], bflip_np[i], bswap_np[i], material_np[i],
                cfg=cfg.sift,
                desc_thresh=mcfg.desc_thresh,
                ransac_thresh=mcfg.ransac_thresh,
            )

        # pairs are independent (each touches only its own row); run them
        # in a small thread pool — host pyramid builds dominate the cost
        # and the strict caches dedupe shared images (strict._pyramid_for)
        if len(esc_rows) > 1 and os.environ.get("VFX_ESC_THREADS", "1") == "1":
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(4, len(esc_rows))) as _ep:
                esc_results = list(_ep.map(_escalate_one, esc_rows))
        else:
            esc_results = [_escalate_one(i) for i in esc_rows]
        for i, esc in zip(esc_rows, esc_results):
            if esc is None:
                continue  # strict pass confirmed the device result
            shift, pair, anym = esc
            any_np[i] = anym
            if anym:
                shifts_np[i] = shift
                pa_np[i] = pair[0]
                pb_np[i] = pair[1]
        if timings_out is not None:
            timings_out["escalate_s"] = time.time() - _te0

    shifts, pairs = _lists_from_arrays(
        shifts_np, pa_np, pb_np, any_np, valid, int(cyl.shape[0])
    )
    return shifts, pairs, counts


def _lists_from_arrays(
    shifts_np, pa_np, pb_np, any_np, valid: Sequence[bool], n: int
) -> Tuple[List[Tuple[float, float]], List[Optional[tuple]]]:
    """Reference-shaped (shifts, pairs) lists from the bundle arrays.

    Degraded entries follow image_stitching_harris.py:479-482: an
    invalid image yields ((0,0), dummy pair); no match yields ((0,0),
    None).
    """
    shifts: List[Tuple[float, float]] = []
    pairs: List[Optional[tuple]] = []
    for i in range(n - 1):
        if not (valid[i] and valid[i + 1]):
            shifts.append((0.0, 0.0))
            pairs.append(((0.0, 0.0), (0.0, 0.0)))
        elif not any_np[i]:
            shifts.append((0.0, 0.0))
            pairs.append(None)
        else:
            shifts.append((float(shifts_np[i, 0]), float(shifts_np[i, 1])))
            pairs.append(
                (
                    (float(pa_np[i, 0]), float(pa_np[i, 1])),
                    (float(pb_np[i, 0]), float(pb_np[i, 1])),
                )
            )
    return shifts, pairs


# dataset keys (pre-escalation decision bytes) whose strict escalation
# CHANGED an outcome on a previous run: speculation for them is wasted
# work that contends with the threaded escalation, so it is skipped
# until the key confirms again.  Bounded insertion-order dict.
_SPEC_MISS_KEYS: dict = {}
_SPEC_MISS_MAX = 256


@dataclasses.dataclass
class _Finalized:
    """Output of the shared finalize->compose tail (finalize_to_panorama)."""

    panorama: np.ndarray
    mosaic: np.ndarray
    shifts: List[Tuple[float, float]]
    corrected: List[Tuple[float, float]]
    pairs: list
    counts: np.ndarray
    steps: Optional[List[np.ndarray]]
    finalize_s: float
    compose_s: float
    crop_s: float
    detail: dict  # fine-grained phase budget (bundle_pull/escalate/
    #               plan_dispatch/mosaic_pull), host-clock seconds


def finalize_to_panorama(
    cyl, xy, valid_kp, meta, stats, pair_out, valid, cfg: StitchConfig,
    h: int, w: int, margin: int,
    host_images: Optional[Sequence] = None,
    focals: Optional[Sequence[float]] = None,
    return_steps: bool = False,
    compose_cyl=None,
    bundle=None,
) -> _Finalized:
    """Shared pipeline tail: finalize -> drift -> plan -> compose -> crop.

    Used by the single-dataset driver, the pipelined multi-dataset run
    and the mesh-sharded throughput path, so escalation/planning/compose
    semantics (and transfer bundling — bounds + mosaic in one
    device_get) can never drift between them.

    ``compose_cyl`` (a nullary callable returning the RGB cylindrical
    batch) supports the gray-first load path: the compose source is
    built only HERE, after the first sync, so no device op ahead of the
    result-bundle pull ever waits on the RGB uploads; ``cyl`` may then
    be the gray batch (used for counts and as the escalation fallback —
    the strict path grays it anyway).

    ``VFX_HOST_COMPOSE`` (default ON; the measured on-chip winner,
    docs/CHIP_AB_R3C.json) composes the mosaic on HOST
    (compose/host.py): the cylindrical RGB projections are computed in
    a background thread *during* the result-bundle device wait (host
    and device gathers are bit-identical), and the fold + bounds + crop
    all happen in NumPy — the compose dispatch and the ~6.6 MB mosaic
    pull leave the critical path entirely.  Requires host images; the
    step-capture path (``return_steps``) stays on device.
    """
    detail: dict = {}
    t0 = time.time()
    n_imgs = int(cyl.shape[0])
    host_compose = (
        os.environ.get("VFX_HOST_COMPOSE", "1") == "1"
        and not return_steps
        and host_images is not None
        and focals is not None
        and all(
            host_images[i] is not None for i in range(n_imgs) if valid[i]
        )
    )
    proj_futs = None
    if host_compose:
        from concurrent.futures import ThreadPoolExecutor

        from vfx_image_stitching_tpu.geometry.cylindrical import (
            cylindrical_project_host_cached,
        )

        _pool = ThreadPoolExecutor(max_workers=4)
        proj_futs = {
            i: _pool.submit(
                cylindrical_project_host_cached,
                host_images[i], float(focals[i]),
            )
            for i in range(n_imgs)
            if valid[i]
        }
        _pool.shutdown(wait=False)

    # Speculative compose: the host fold needs only the shifts, and the
    # escalation loop (tens of ms) usually CONFIRMS the device decisions
    # — so when escalation is about to run, a worker thread starts
    # drift/plan/fold from the pre-escalation arrays in parallel.
    #
    # Escalation can only change pairs in ``esc_rows`` (the material
    # knife edges), and the fold is a left-to-right band fold, so the
    # thread SNAPSHOTS the canvas just before every step a material
    # pair feeds.  If escalation changes an outcome, the final plan
    # usually differs from the speculative one only by a UNIFORM
    # translation of the prefix (the changed step's frame suffix-sum)
    # plus changed suffix steps — plan_patch_point verifies this
    # exactly — and the longest still-valid snapshot is translated and
    # resumed instead of refolding all bands (full refold stays as the
    # fallback).  Dataset keys whose
    # escalation changed an outcome before (parrington's pair-13 knife
    # edge flips every run — docs/DEVNOTES.md) speculate the PREFIX only
    # — the suffix fold would be discarded anyway and contends with the
    # threaded escalation — and re-enable full speculation if they
    # start confirming.
    # Speculation is a PARALLELISM play: the spec fold thread must run
    # beside the escalation threads.  On a 1-core host they time-slice
    # instead — measured on-chip (docs/CHIP_AB_R4A.json, 1-vCPU box):
    # the fold win (0.044 -> 0.019) comes back as escalate/join
    # inflation and the wall is ~0.04 s WORSE — so the default follows
    # the host's parallelism; VFX_SPEC_COMPOSE=0/1 pins it either way.
    spec: dict = {}
    spec_default = "1" if (os.cpu_count() or 1) >= 2 else "0"
    spec_enabled = (
        host_compose
        and os.environ.get("VFX_SPEC_COMPOSE", spec_default) == "1"
    )

    def _pre_escalate(shifts_np, pa_np, pb_np, any_np, esc_rows=None):
        if not spec_enabled:
            return
        import threading

        from vfx_image_stitching_tpu.compose.host import (
            compose_mosaic_host_prefix,
            content_bounds_host,
            resume_compose_host,
        )

        key = (
            shifts_np.tobytes(), pa_np.tobytes(), tuple(valid), n_imgs
        )
        spec["key"] = key
        prefix_only = key in _SPEC_MISS_KEYS
        spec["prefix_only"] = prefix_only
        esc_rows_l = sorted(esc_rows) if esc_rows else [0]

        def run():
            try:
                shifts_s, pairs_s = _lists_from_arrays(
                    shifts_np, pa_np, pb_np, any_np, list(valid), n_imgs
                )
                corrected_s = correct_drift(shifts_s, n_images=n_imgs)
                plan_s = plan_compose(
                    h, w, n_imgs, list(valid), corrected_s, pairs_s
                )
                # snapshot boundaries: pair r feeds the step folding
                # image r+1, so the canvas just before that step (i.e.
                # after all steps with img_index <= r) is reusable when
                # escalation confirms every pair < r and earlier steps
                # move only by the uniform drift/frame delta
                # plan_patch_point checks for.  One snapshot per
                # material pair: escalation usually changes at most ONE
                # of them, so the patch resumes from the longest
                # still-valid prefix.  (esc_rows unknown -> a single
                # image-0 snapshot; resume == refold.)
                #
                # Steady state (prefix_only): the miss memory stores
                # which boundary the last patch resumed from, so only
                # the prefix up to THAT boundary folds — no snapshot
                # copies, no wasted suffix fold.
                if prefix_only:
                    n_steps = len(plan_s.steps)
                    remembered = int(_SPEC_MISS_KEYS.get(spec["key"], 0))
                    bounds_steps = [max(0, min(remembered, n_steps))]
                else:
                    bounds_steps = sorted({
                        sum(1 for s in plan_s.steps if s.img_index <= r)
                        for r in esc_rows_l
                    })
                imgs_s = {i: f.result() for i, f in proj_futs.items()}
                snapshots = {}
                canvas, occ = compose_mosaic_host_prefix(
                    imgs_s, plan_s, bounds_steps[0]
                )
                if prefix_only:
                    # the live state IS the single snapshot (no copy —
                    # nothing folds past it)
                    snapshots[bounds_steps[0]] = (canvas, occ)
                    spec.update(
                        shifts=shifts_s, pairs=pairs_s,
                        corrected=corrected_s, plan=plan_s,
                        imgs=imgs_s, snapshots=snapshots,
                    )
                    return
                snapshots[bounds_steps[0]] = (canvas.copy(), occ.copy())
                for b0, b1 in zip(bounds_steps, bounds_steps[1:]):
                    resume_compose_host(canvas, occ, imgs_s, plan_s, b0, b1)
                    snapshots[b1] = (canvas.copy(), occ.copy())
                spec.update(
                    shifts=shifts_s, pairs=pairs_s, corrected=corrected_s,
                    plan=plan_s, imgs=imgs_s, snapshots=snapshots,
                )
                mosaic_s = resume_compose_host(
                    canvas, occ, imgs_s, plan_s, bounds_steps[-1]
                )
                bounds_s = content_bounds_host(mosaic_s, cfg.black_threshold)
                spec.update(mosaic=mosaic_s, bounds=bounds_s)
            except Exception as exc:  # pragma: no cover - spec is advisory
                spec["err"] = exc

        th = threading.Thread(target=run, daemon=True)
        th.start()
        spec["thread"] = th

    shifts, pairs, counts = finalize_pairwise_shifts(
        cyl, xy, valid_kp, meta, stats, pair_out, list(valid), cfg,
        host_images=host_images, focals=focals, timings_out=detail,
        pre_escalate_cb=_pre_escalate if spec_enabled else None,
        bundle=bundle,
    )
    t1 = time.time()
    n = cyl.shape[0]
    corrected = correct_drift(shifts, n_images=n)
    plan = plan_compose(h, w, n, list(valid), corrected, pairs)
    if host_compose:
        from vfx_image_stitching_tpu.compose.host import (
            compose_mosaic_host,
            content_bounds_host,
            plan_patch_point,
            resume_compose_host,
            translate_prefix,
        )
        from vfx_image_stitching_tpu.compose.crop import apply_crop

        spec_hit = False
        if "thread" in spec:
            spec["thread"].join()
            spec_ok = (
                "err" not in spec
                and spec.get("shifts") == shifts
                and spec.get("pairs") == pairs
            )
            spec_hit = spec_ok and "mosaic" in spec
            if "key" in spec:
                if spec_ok:
                    # confirmed: re-enable full speculation next run
                    _SPEC_MISS_KEYS.pop(spec["key"], None)
                else:
                    while len(_SPEC_MISS_KEYS) >= _SPEC_MISS_MAX:
                        _SPEC_MISS_KEYS.pop(next(iter(_SPEC_MISS_KEYS)))
                    # 0 = "escalation changes this dataset"; overwritten
                    # below with the patch boundary so the steady state
                    # folds exactly the reusable prefix
                    _SPEC_MISS_KEYS[spec["key"]] = 0
        detail["spec_compose"] = bool(spec_hit)
        if spec_hit:
            imgs_host = spec["imgs"]
            mosaic = spec["mosaic"]
            bounds = spec["bounds"]
            t1b = time.time()
            detail["plan_dispatch_s"] = t1b - t1
            t2 = time.time()
            detail["mosaic_pull_s"] = t2 - t1b
            panorama = apply_crop(mosaic, bounds, margin)
            t3 = time.time()
            return _Finalized(
                panorama=panorama, mosaic=mosaic, shifts=shifts,
                corrected=corrected, pairs=pairs, counts=counts, steps=None,
                finalize_s=t1 - t0, compose_s=t2 - t1, crop_s=t3 - t2,
                detail=detail,
            )
        imgs_host = (
            spec["imgs"] if "imgs" in spec and "err" not in spec
            else {i: f.result() for i, f in proj_futs.items()}
        )
        t1b = time.time()
        detail["plan_dispatch_s"] = t1b - t1
        # patch path: escalation changed the plan, but the speculative
        # fold snapshotted the canvas before every step a material pair
        # feeds; any snapshot whose prefix matches the final plan's (up
        # to a uniform translation — plan_patch_point) is reusable, so
        # only the bands after the longest still-valid snapshot refold
        mosaic = None
        if spec.get("snapshots") and "err" not in spec:
            patch = plan_patch_point(spec["plan"], plan)
            if patch is not None:
                j, dty, dtx = patch
                usable = [b for b in spec["snapshots"] if b <= j]
                if usable:
                    snap_step = max(usable)
                    canvas, occ = spec["snapshots"][snap_step]
                    if (
                        (dty, dtx) != (0, 0)
                        or canvas.shape[:2] != (plan.height, plan.width)
                    ):
                        canvas, occ = translate_prefix(
                            canvas, occ, plan, dty, dtx
                        )
                    mosaic = resume_compose_host(
                        canvas, occ, imgs_host, plan, snap_step
                    )
                    detail["spec_patch"] = snap_step
                    if spec.get("key") in _SPEC_MISS_KEYS:
                        _SPEC_MISS_KEYS[spec["key"]] = snap_step
        if mosaic is None:
            detail["spec_patch"] = -1
            if spec.get("key") in _SPEC_MISS_KEYS:
                # remembered boundary unusable this run: fall back to a
                # trivial prefix until the dataset's pattern re-settles
                _SPEC_MISS_KEYS[spec["key"]] = 0
            mosaic = compose_mosaic_host(imgs_host, plan)
        bounds = content_bounds_host(mosaic, cfg.black_threshold)
        t2 = time.time()
        detail["mosaic_pull_s"] = t2 - t1b  # host fold (no transfer)
        panorama = apply_crop(mosaic, bounds, margin)
        t3 = time.time()
        return _Finalized(
            panorama=panorama, mosaic=mosaic, shifts=shifts,
            corrected=corrected, pairs=pairs, counts=counts, steps=None,
            finalize_s=t1 - t0, compose_s=t2 - t1, crop_s=t3 - t2,
            detail=detail,
        )
    src = compose_cyl() if compose_cyl is not None else cyl
    out = compose_mosaic(src, plan, return_steps=return_steps)
    mosaic_d, steps = out if return_steps else (out, None)
    from vfx_image_stitching_tpu.compose.crop import (
        mosaic_with_bounds,
        mosaic_with_bounds_strips,
        pull_strips,
        unpack_mosaic_bounds,
    )

    t1b = time.time()
    detail["plan_dispatch_s"] = t1b - t1
    # bounds + mosaic ride ONE u8 buffer: a tuple device_get fetches
    # each leaf separately (six round trips on the tunneled harness).
    # VFX_MOSAIC_STRIPS > 1 splits the buffer into row strips pulled
    # concurrently from host threads (multiplexes the tunneled link);
    # 4 measured best on-chip (docs/CHIP_AB_R3B.json: mosaic_pull
    # 0.31 -> 0.25 s median, interleaved A/B).
    n_strips = int(os.environ.get("VFX_MOSAIC_STRIPS", "4"))
    if n_strips > 1:
        buf = pull_strips(
            mosaic_with_bounds_strips(
                mosaic_d, jnp.uint8(cfg.black_threshold), n_strips
            )
        )
    else:
        buf = jax.device_get(
            mosaic_with_bounds(mosaic_d, jnp.uint8(cfg.black_threshold))
        )
    mosaic, bounds = unpack_mosaic_bounds(buf)
    t2 = time.time()
    detail["mosaic_pull_s"] = t2 - t1b
    panorama = rectangle_crop(mosaic, cfg.black_threshold, margin, bounds=bounds)
    t3 = time.time()
    return _Finalized(
        panorama=panorama, mosaic=mosaic, shifts=shifts,
        corrected=corrected, pairs=pairs, counts=counts, steps=steps,
        finalize_s=t1 - t0, compose_s=t2 - t1, crop_s=t3 - t2,
        detail=detail,
    )


def stitch_panorama(
    folder: str,
    backend: str = "harris",
    pano_file: Optional[str] = None,
    crop_margin: Optional[int] = None,
    cfg: Optional[StitchConfig] = None,
    save_path: Optional[str] = None,
    return_steps: bool = False,
    verbose: bool = False,
) -> StitchResult:
    """Stitch one dataset folder end to end."""
    cfg = _resolve_cfg(backend, cfg)
    margin = cfg.crop_margin if crop_margin is None else crop_margin

    from vfx_image_stitching_tpu.utils.profiling import profile_trace

    with profile_trace(cfg.profile_dir):
        # larger-than-audited inputs get area-scaled capacities (must
        # happen before the loader callback dispatches any extraction)
        run_cfg, managed = _autoscale_sift_caps(cfg, folder, pano_file)
        res = _stitch_inner(
            folder, pano_file, margin, run_cfg, save_path, return_steps,
            verbose,
        )
        # Overflow recovery: area scaling models photo statistics, but
        # CONTENT denser than the audited photo sets can still hit a
        # stage capacity (counts ride the result bundle).  Rather than
        # silently truncating keypoints, re-run with capacities grown to
        # fit the measured counts — framework-owned capacities only; a
        # user's explicit capacity config is their contract (the warning
        # from finalize_pairwise_shifts still fires).  Never triggers on
        # the audited reference datasets (>=1.35x headroom there).
        for _ in range(3):
            if not managed or res.capacity_stats is None:
                break
            grown = run_cfg.sift.capacities.grown_to_fit(res.capacity_stats)
            if grown is run_cfg.sift.capacities:
                break
            import warnings

            warnings.warn(
                "SIFT capacity overflow: re-running with capacities grown "
                "to fit the measured counts (set StitchConfig.sift."
                "capacities explicitly to pin shapes)",
                RuntimeWarning, stacklevel=2,
            )
            run_cfg = dataclasses.replace(
                run_cfg, sift=dataclasses.replace(run_cfg.sift,
                                                  capacities=grown)
            )
            res = _stitch_inner(
                folder, pano_file, margin, run_cfg, save_path,
                return_steps, verbose,
            )
        return res


def _stitch_inner(
    folder, pano_file, margin, cfg, save_path, return_steps, verbose
) -> StitchResult:
    timings = {}
    t0 = time.time()
    group_target = int(os.environ.get("VFX_LOAD_GROUP", "6"))
    # Host compose + gray-first is the measured on-chip winner (0.83 s
    # vs 1.41 s median, docs/CHIP_AB_R3C.json): the mosaic never crosses
    # the link and only 1 byte/px grays ride the upload.  Gray-first
    # WITHOUT host compose stays opt-in — it was A/B-refuted there (the
    # per-image RGB uploads it defers cost more than they save,
    # docs/DEVNOTES.md r3a).
    host_compose = os.environ.get("VFX_HOST_COMPOSE", "1") == "1"
    gray_first = (
        os.environ.get("VFX_GRAY_FIRST", "1" if host_compose else "0")
        == "1"
    )
    # host projection of the gray uploads (bit-identical index-map
    # gather) keeps the per-group device gather off the critical path
    host_project = (
        gray_first and os.environ.get("VFX_HOST_PROJECT", "1") == "1"
    )
    # dispatch projection + extraction per group the moment its gray
    # stack lands on device (loader callback): the device starts on
    # group 0 while later images are still decoding, instead of idling
    # behind the whole single-core JPEG pass.  VFX_EXTRACT_ON_LOAD=0
    # restores dispatch-after-load for A/B.
    extract_on_load = os.environ.get("VFX_EXTRACT_ON_LOAD", "1") == "1"
    cyl_by_group: dict = {}
    feats_by_group: dict = {}

    def _on_group(k, dev_stack, lo, hi, focals_all):
        if host_project:
            cyl_g = dev_stack  # loader already projected on host
        else:
            cyl_g = cylindrical_project_batch(
                dev_stack, tuple(focals_all[lo:hi])
            )
        cyl_by_group[k] = cyl_g
        feats_by_group[k] = extract_features(cyl_g, cfg)

    if gray_first:
        from vfx_image_stitching_tpu.io import load_dataset_device_split

        # with host compose the RGB batch never reaches the device at
        # all — only the 1 byte/px grays ride the link
        gray_batches, rgb_imgs, valid, focals, (h, w, _c), host_imgs = (
            load_dataset_device_split(
                folder, pano_file, group_target,
                upload_rgb=not (host_compose and not return_steps),
                host_project=host_project,
                on_group=_on_group if extract_on_load else None,
            )
        )
    else:  # RGB-everything fallback (VFX_GRAY_FIRST=0)
        from vfx_image_stitching_tpu.io import load_dataset_device_grouped

        gray_batches, valid, focals, (h, w, _c), host_imgs = (
            load_dataset_device_grouped(folder, pano_file, group_target)
        )
        rgb_imgs = None
    n = int(sum(b.shape[0] for b in gray_batches))
    sizes = [int(b.shape[0]) for b in gray_batches]

    # pipelined load->extract on the GRAY batches (1 byte/px on the
    # critical path; the 3-byte/px RGB uploads queue behind and are
    # consumed only at compose time): project + extract each group as
    # soon as its stack is ready
    cyl_groups, feats_groups = [], []
    idx = 0
    for k, b in enumerate(gray_batches):
        gsize = int(b.shape[0])
        if k in feats_by_group:  # dispatched by the loader callback
            cyl_groups.append(cyl_by_group[k])
            feats_groups.append(feats_by_group[k])
            idx += gsize
            continue
        if host_project:
            cyl_g = b  # loader already projected on host (bit-identical)
        else:
            cyl_g = cylindrical_project_batch(
                b, tuple(focals[idx : idx + gsize])
            )
        idx += gsize
        cyl_groups.append(cyl_g)
        feats_groups.append(extract_features(cyl_g, cfg))
    cyl = (
        jnp.concatenate(cyl_groups) if len(cyl_groups) > 1 else cyl_groups[0]
    )
    if verbose:
        # phase-accurate timer costs a device sync (a round trip on
        # tunneled links); without verbose the load timer records dispatch
        cyl.block_until_ready()
    t1 = time.time()
    timings["load_project"] = t1 - t0
    if verbose:
        print(f"Timer: {t1 - t0:.2f} s load + cylindrical projection")

    xy, descs, valid_kp, meta, stats = _concat_feats(feats_groups)
    pair_out = dispatch_pair_step(xy, descs, valid_kp, cfg)
    # start the result bundle's d2h copy now: on a high-RTT tunneled
    # link the transfer begins the moment device work finishes instead
    # of waiting for finalize's pull request (one RTT earlier)
    bundle = dispatch_result_bundle(xy, valid_kp, meta, stats, pair_out, cfg)

    def compose_cyl():
        # per-group projection reuses the device-resident winner stacks
        # the gray projections cached (same (h, w, focal-slice) keys).
        # rgb_imgs entries may be None when the loader skipped RGB
        # uploads (upload_rgb=False) but finalize then declined host
        # compose — upload from the host copies (zeros for unreadable
        # images) rather than crash on the placeholders.
        out, a = [], 0
        for gsize in sizes:
            grp = []
            for i in range(a, a + gsize):
                im = rgb_imgs[i]
                if im is None:
                    im = (host_imgs[i] if host_imgs[i] is not None
                          else np.zeros((h, w, 3), np.uint8))
                grp.append(jnp.asarray(im))
            out.append(cylindrical_project_batch(
                jnp.stack(grp), tuple(focals[a : a + gsize])
            ))
            a += gsize
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    if not gray_first:
        compose_cyl = None  # `cyl` is already the RGB batch

    fin = finalize_to_panorama(
        cyl, xy, valid_kp, meta, stats, pair_out, list(valid), cfg,
        h, w, margin, host_images=host_imgs, focals=focals,
        return_steps=return_steps, compose_cyl=compose_cyl, bundle=bundle,
    )
    t2 = t1 + fin.finalize_s
    timings["features_ransac"] = t2 - t1
    if verbose:
        print(f"Timer: {t2 - t1:.2f} s features + RANSAC "
              f"(matches per pair: {list(map(int, fin.counts))})")
    timings["compose"] = fin.compose_s
    timings["crop"] = fin.crop_s
    timings.update(fin.detail)
    t4 = time.time()
    timings["total"] = t4 - t0
    if verbose:
        print(f"Total: {t4 - t0:.2f} s")

    # save only when the caller provides a path; the reference's
    # write-into-the-input-folder behavior lives in the CLI drivers
    if save_path:
        save_bgr(save_path, fin.panorama)

    return StitchResult(
        panorama=fin.panorama,
        mosaic=fin.mosaic,
        shifts=fin.shifts,
        corrected_shifts=fin.corrected,
        pairs=fin.pairs,
        timings=timings,
        steps=fin.steps,
        capacity_stats=timings.pop("capacity_overflow", None),
    )
