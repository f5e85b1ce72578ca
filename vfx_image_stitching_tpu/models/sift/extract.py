"""SIFT orchestrator: full pipeline + reference-API-parity wrappers.

Stage order matches ``sift_impl.compute_keypoints_and_descriptors``
(sift_impl.py:15-39); the only reordering is that conversion-to-input-size
and descriptors run *per octave* before the global sort/dedup — both are
per-keypoint elementwise maps, so the result set is identical while the
descriptor windows can use contiguous per-octave gradient stacks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig
from vfx_image_stitching_tpu.ops.color import bgr_to_gray_f32
from vfx_image_stitching_tpu.models.sift.pyramid import (
    generate_base_image,
    compute_number_of_octaves,
    generate_gaussian_kernels,
    generate_gaussian_images,
    generate_dog_images,
    gradient_fields,
)
from vfx_image_stitching_tpu.models.sift.extrema import (
    extrema_threshold,
    extract_candidates,
)
from vfx_image_stitching_tpu.models.sift.localize import (
    localize_candidates_chunked,
    localize_candidates_chunked_slim,
    localize_candidates_resident,
    localize_candidates_split_chunked,
    compact_localized,
)
from vfx_image_stitching_tpu.models.sift.orientation import (
    assign_orientations_chunked,
)
from vfx_image_stitching_tpu.models.sift.descriptor import (
    compute_descriptors_bucketed,
    compute_descriptors_chunked,
)
from vfx_image_stitching_tpu.models.sift.keypoints import (
    Keypoints,
    concatenate,
    compact,
    convert_keypoints_to_input_image_size,
    sort_and_dedup,
)


def _to_gray(image: jnp.ndarray) -> jnp.ndarray:
    if image.ndim == 3 and image.shape[-1] == 3:
        return bgr_to_gray_f32(image)
    return jnp.asarray(image, jnp.float32)


def sift_keypoints_and_descriptors(
    image: jnp.ndarray, cfg: SiftConfig = SiftConfig()
) -> Tuple[Keypoints, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full SIFT on one image -> (Keypoints, (K,128) descriptors, stats).

    ``stats`` carries per-stage occupancy counts so callers/tests can
    verify no fixed capacity truncated (the masked-array analogue of the
    reference's dynamic lists).
    """
    gray = _to_gray(image)
    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(base, num_octaves, kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    caps = cfg.capacities
    per_kps: List[Keypoints] = []
    per_desc: List[jnp.ndarray] = []
    cand_counts, oriented_counts, cand_caps, oriented_caps = [], [], [], []
    loc_counts, loc_caps = [], []
    desc_big_counts, desc_big_caps = [], []
    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        cand_cap = min(caps.scaled_candidates(o), 3 * h_o * w_o)
        layer, y, x, cand_valid = extract_candidates(
            dog, cfg.image_border_width, thresh, cand_cap
        )
        if cfg.localize_resident:
            localize = localize_candidates_resident
        elif cfg.localize_slim:
            localize = localize_candidates_chunked_slim
        elif cfg.localize_split:
            localize = localize_candidates_split_chunked
        else:
            localize = localize_candidates_chunked
        loc = localize(dog, layer, y, x, cand_valid, o, cfg)
        loc_cap = min(caps.scaled_localized(o), cand_cap)
        loc_counts.append(jnp.sum(loc.valid))
        loc_caps.append(loc_cap)
        loc = compact_localized(loc, loc_cap)
        # gradient fields (sqrt + atan2 over the octave) are only
        # consumed by the orientation/descriptor windows, and only at the
        # localized layers 1..num_intervals (localize.py clips the final
        # layer there) — levels 0 and the top two are dead work, so only
        # the 3-level slice is computed (layer_base=1 re-bases the
        # consumers' plane index).  Skip entirely when the octave
        # localized nothing (typical for the tail octaves).
        grad_src = pyramid[o][..., 1 : cfg.num_intervals + 1, :, :]
        mag, ang = jax.lax.cond(
            jnp.any(loc.valid),
            lambda s: gradient_fields(s),
            lambda s: (jnp.zeros_like(s), jnp.zeros_like(s)),
            grad_src,
        )
        kps = assign_orientations_chunked(mag, ang, loc, o, cfg,
                                          layer_base=1)
        o_cap = caps.scaled_oriented(o)
        kps_c = compact(kps, o_cap)
        kps_c = convert_keypoints_to_input_image_size(kps_c)
        if caps.desc_bucketed:
            big_cap = min(caps._table(caps.desc_big_caps, o), o_cap)
            desc, big_count = compute_descriptors_bucketed(
                mag, ang, kps_c, o, cfg,
                small_cap=min(caps._table(caps.desc_small_caps, o), o_cap),
                big_cap=big_cap,
                layer_base=1,
            )
            desc_big_counts.append(big_count)
            desc_big_caps.append(big_cap)
        else:
            desc = compute_descriptors_chunked(mag, ang, kps_c, o, cfg,
                                               layer_base=1)
            desc_big_counts.append(jnp.int32(0))
            desc_big_caps.append(1)
        per_kps.append(kps_c)
        per_desc.append(desc)
        cand_counts.append(jnp.sum(cand_valid))
        oriented_counts.append(jnp.sum(kps.valid))
        cand_caps.append(cand_cap)
        oriented_caps.append(o_cap)

    kps = concatenate(tuple(per_kps))
    desc = jnp.concatenate(per_desc, axis=0)
    kps, desc = sort_and_dedup(kps, desc, caps.max_keypoints)
    stats = {
        "cand_counts": jnp.stack(cand_counts),
        "cand_caps": jnp.asarray(cand_caps),
        "loc_counts": jnp.stack(loc_counts),
        "loc_caps": jnp.asarray(loc_caps),
        "oriented_counts": jnp.stack(oriented_counts),
        "oriented_caps": jnp.asarray(oriented_caps),
        "desc_big_counts": jnp.stack(desc_big_counts),
        "desc_big_caps": jnp.asarray(desc_big_caps),
        "final_count": kps.count(),
        "final_cap": jnp.asarray(caps.max_keypoints),
    }
    return kps, desc, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def sift_extract(
    image: jnp.ndarray, cfg: SiftConfig = SiftConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pipeline interface: (xy (K,2) f32, descriptors (K,128), valid)."""
    kps, desc, _ = sift_keypoints_and_descriptors(image, cfg)
    xy = jnp.stack([kps.x, kps.y], axis=-1)
    return xy, desc, kps.valid


@functools.partial(jax.jit, static_argnames=("cfg", "mode"))
def sift_batch(
    batch: jnp.ndarray, cfg: SiftConfig = SiftConfig(), mode: str = "map"
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched SIFT over an (N, H, W, 3) batch inside one jit.

    ``mode="map"`` (lax.map) keeps one image's intermediates live at a
    time — the descriptor/orientation window buffers are the peak-memory
    term; ``mode="vmap"`` batches every stage across images for maximum
    parallelism (higher peak memory).
    """
    if mode == "vmap":
        return jax.vmap(lambda im: sift_extract(im, cfg))(batch)
    return jax.lax.map(lambda im: sift_extract(im, cfg), batch)


@functools.partial(jax.jit, static_argnames=("cfg", "mode"))
def sift_batch_with_stats(
    batch: jnp.ndarray, cfg: SiftConfig = SiftConfig(), mode: str = "map"
) -> Tuple[
    jnp.ndarray, jnp.ndarray, jnp.ndarray,
    Dict[str, jnp.ndarray], Dict[str, jnp.ndarray],
]:
    """`sift_batch` that also returns keypoint metadata + occupancy stats.

    ``meta`` carries (N, K) size/angle/octave — what the knife-edge
    escalation path (models/sift/strict.py) needs to recompute a
    descriptor on host; ``stats`` carries per-stage occupancy counts so
    the pipeline can warn when any fixed capacity is reached on
    user-supplied data (a reached cap means truncation — see
    utils.capacity).  Both stay on device until sliced.
    """

    def one(im):
        kps, desc, stats = sift_keypoints_and_descriptors(im, cfg)
        xy = jnp.stack([kps.x, kps.y], axis=-1)
        meta = {
            "size": kps.size, "angle": kps.angle, "octave": kps.octave,
            "ix": kps.ix, "iy": kps.iy,
            "jx": kps.jx, "jy": kps.jy, "jl": kps.jl,
        }
        return xy, desc, kps.valid, meta, stats

    if mode == "vmap":
        return jax.vmap(one)(batch)
    return jax.lax.map(one, batch)


@dataclasses.dataclass
class KeyPointRecord:
    """cv2.KeyPoint-compatible record for the API-parity surface."""

    pt: Tuple[float, float]
    size: float
    angle: float
    response: float
    octave: int
    class_id: int = -1


def compute_keypoints_and_descriptors(
    image: np.ndarray,
    sigma: float = 1.6,
    num_intervals: int = 3,
    assumed_blur: float = 0.5,
    image_border_width: int = 5,
) -> Tuple[List[KeyPointRecord], np.ndarray]:
    """Reference-signature entry point (sift_impl.py:15-39 parity).

    Accepts a BGR uint8 or grayscale image; returns keypoint records
    (cv2.KeyPoint-compatible fields) and an (N, 128) float32 descriptor
    array, trimmed to the valid count.
    """
    cfg = SiftConfig(
        sigma=sigma,
        num_intervals=num_intervals,
        assumed_blur=assumed_blur,
        image_border_width=image_border_width,
    )
    kps_d, desc_d, _ = jax.jit(
        sift_keypoints_and_descriptors, static_argnames=("cfg",)
    )(jnp.asarray(image), cfg)
    kps = jax.device_get(kps_d)
    desc = np.asarray(jax.device_get(desc_d))
    valid = np.asarray(kps.valid)
    records = [
        KeyPointRecord(
            pt=(float(kps.x[i]), float(kps.y[i])),
            size=float(kps.size[i]),
            angle=float(kps.angle[i]),
            response=float(kps.response[i]),
            octave=int(kps.octave[i]),
        )
        for i in np.nonzero(valid)[0]
    ]
    return records, desc[valid]
