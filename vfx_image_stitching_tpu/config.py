"""Configuration dataclasses mirroring every reference algorithm constant.

The reference keeps all constants as function default kwargs (Harris:
``image_stitching_harris.py:135``; SIFT: ``sift_impl.py:15``; thresholds at
``image_stitching_harris.py:490-494`` and ``image_stitching_sift.py:325``).
Here they live in frozen dataclasses so every stage is explicitly
parameterized and hashable (usable as jit static args).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class HarrisConfig:
    """Harris corner backend constants (image_stitching_harris.py:135)."""

    max_points: int = 200
    k: float = 0.05
    block_size: int = 21          # GaussianBlur ksize for structure tensor
    gauss_sigma: float = 2.0
    thresh_ratio: float = 0.02
    border_margin: int = 8        # keypoints closer than this to the border
    #                               are dropped (image_stitching_harris.py:204)
    patch_size: int = 16          # descriptor patch (image_stitching_harris.py:86)
    desc_blur_ksize: int = 9      # GaussianBlur((9,9), 4.5) on patch magnitudes
    desc_blur_sigma: float = 4.5  # (image_stitching_harris.py:91)
    desc_bins: int = 8
    desc_cells: int = 4
    desc_clip: float = 0.2


@dataclasses.dataclass(frozen=True)
class SiftCapacities:
    """Fixed capacities for the masked, fixed-shape SIFT pipeline.

    The reference uses dynamically sized Python lists; on TPU every stage is
    fixed shape with validity masks.  Values were audited against the four
    reference datasets (out/wind/parrington/grail) with >=2x headroom; the
    audit utility lives in :mod:`vfx_image_stitching_tpu.utils.capacity`.
    """

    # Per-octave capacity tables (index = octave, last entry repeats).
    # Sized from a full audit over every image of the four reference
    # datasets (utils/capacity.py) with >= 1.35x headroom; per-dataset
    # measured maxima are in the comments.
    #
    # raw 26-neighbor extrema candidates  (audit: 2435 / 738 / 211 / 67)
    candidate_caps: Tuple[int, ...] = (4096, 1024, 384, 160, 128)
    # surviving localized candidates      (audit: 1478 / 430 / 122 / 50)
    localized_caps: Tuple[int, ...] = (2048, 640, 224, 128)
    # oriented keypoints (peak expansion) (audit: 1790 / 466 / 154 / 67)
    oriented_caps: Tuple[int, ...] = (2560, 640, 256, 128)
    # Orientation peaks emitted per localized candidate
    # (sift_impl.py:280-292 can emit several; audit max is 5).
    max_orientations: int = 8
    # Final per-image keypoint capacity after dedup/compaction (matching
    # operates on (max_keypoints, 128) descriptor blocks).  Audit max
    # total keypoints/image is ~1900.
    max_keypoints: int = 3072
    # Orientation histogram window half-radius cap (sift_impl.py:254 radius
    # is data dependent; audit max over all dataset images is 17).
    max_radius: int = 20
    # Descriptor sampling window half-width cap (sift_impl.py:386-387
    # half_width is data dependent; audit max is 41, p99 is 38).
    max_half_width: int = 44
    # GEMM chunk for the descriptor one-hot contraction (memory knob).
    # 64 measured fastest on-chip under the r3 code (paired window
    # gathers + live-bounded chunk skipping): walls 0.654/0.681/0.702
    # for 64/128/256, 5/6 interleaved rounds (docs/AB_DESC_CHUNK_r3c.log;
    # r2 had measured 64 == 128 on the older shape).
    desc_chunk: int = 64
    # Size-bucketed descriptor windows: keypoints with half-width <=
    # desc_small_half take a small-window pass (57^2 samples instead of
    # 89^2).  Group caps audited per octave over all datasets
    # (small max: 1271/362/108/51; big max: 518/148/53/20, final-set
    # counts; caps carry pre-dedup + safety margin).
    desc_bucketed: bool = True
    desc_small_half: int = 28
    desc_small_caps: Tuple[int, ...] = (2048, 640, 224, 128)
    desc_big_caps: Tuple[int, ...] = (1024, 256, 128, 128)
    # round descriptor window slices up to the 128-lane width (aligned
    # copies; ~1.4x more masked samples)
    desc_lane_align: bool = False
    # bf16 one-hot operands for the descriptor GEMM (halves the HBM
    # traffic of the hot spot).  Descriptor bins sum hundreds of
    # bf16-rounded contributions, so quantized values can shift by ~1-2
    # (of 255) — measured to leave every dataset's shifts unchanged, but
    # off by default where bit-parity with the f32 path matters.
    desc_bf16: bool = False
    # Pallas block-fetch window gather for the descriptor GEMM path: the
    # vmapped per-keypoint dynamic_slice lowers to a sequential ~2.7 us
    # while-loop iteration (~105 ms/run in the r3 device profile); the
    # kernel fetches each window's 2x2 tile neighborhood in a pipelined
    # grid and rotates it into place on the VPU (bit-exact data
    # movement).  See pallas_kernels.pair_window_gather.  Default off so
    # the CPU test path stays on native XLA; VFX_USE_PALLAS=1 (the chip
    # entry knob, pipeline/stitch._resolve_cfg) turns it on — measured
    # win in docs/CHIP_AB_R3B.json.
    desc_pallas_gather: bool = False

    @staticmethod
    def _table(table: Tuple[int, ...], octave: int) -> int:
        return table[min(octave, len(table) - 1)]

    # Largest image area (px) the default tables were audited against:
    # the audit ran over every image of all four reference datasets
    # (SURVEY.md section 2.4), whose largest images are wind's 708x434.
    # Capacity counts scale ~linearly with image area at photo-like
    # content, so inputs beyond this area scale the tables up; at or
    # below it the audited headroom already covers the count.
    AUDITED_AREA: int = 708 * 434

    def scaled_for_area(self, h: int, w: int) -> "SiftCapacities":
        """Capacity tables scaled for an (h, w) input image.

        The defaults were audited on 384x512 inputs; a larger image has
        proportionally more extrema/keypoints (the reference's dynamic
        lists just grow — sift_impl.py:117-140 appends per pixel), so
        every count capacity scales by the area ratio, rounded up to a
        multiple of 64 to keep lane-friendly shapes.  At or below the
        audited area this is the identity — the benchmark and all
        reference-dataset executables keep their exact shapes.  Window
        caps (max_radius / max_half_width / desc_small_half) are
        per-octave scale properties, not area properties: a larger image
        adds an octave rather than widening windows, so they stay.
        """
        factor = (h * w) / float(self.AUDITED_AREA)
        if factor <= 1.0:
            return self

        def up64(v: int) -> int:
            return ((int(math.ceil(v * factor)) + 63) // 64) * 64

        def table(t: Tuple[int, ...]) -> Tuple[int, ...]:
            return tuple(up64(v) for v in t)

        return dataclasses.replace(
            self,
            candidate_caps=table(self.candidate_caps),
            localized_caps=table(self.localized_caps),
            oriented_caps=table(self.oriented_caps),
            max_keypoints=up64(self.max_keypoints),
            desc_small_caps=table(self.desc_small_caps),
            desc_big_caps=table(self.desc_big_caps),
        )

    def grown_to_fit(self, stats, headroom: float = 1.5) -> "SiftCapacities":
        """Capacities grown to fit measured per-stage occupancy ``stats``.

        ``stats`` is a (host) dict as produced by
        models/sift/extract.sift_keypoints_and_descriptors — per-octave
        ``*_counts``/``*_caps`` arrays plus ``final_count``/``final_cap``
        (leaves may carry an N-image leading axis; the max is taken).
        Area scaling (:meth:`scaled_for_area`) covers photo-statistics
        inputs; this covers CONTENT denser than the audited photo sets
        (e.g. synthetic scenes) where a count hits its capacity: every
        stage at capacity grows to ``max(count * headroom, 2 * cap)``
        rounded up to a lane-friendly multiple of 64.  Counts may
        themselves be clipped at capacity post-compaction, so the
        ``2 * cap`` floor guarantees geometric progress when the caller
        re-runs and re-checks.  Returns ``self`` (identity, same object)
        when nothing is at capacity — the overflow test the pipeline's
        recovery loop keys on.
        """
        import numpy as np

        def up64(v: float) -> int:
            return ((int(math.ceil(v)) + 63) // 64) * 64

        def maxed(key):
            arr = np.asarray(stats[key])
            if arr.ndim <= 1:
                return arr.reshape(-1)
            return arr.reshape(-1, arr.shape[-1]).max(axis=0)

        def grow(table: Tuple[int, ...], count_key: str, cap_key: str):
            counts, caps = maxed(count_key), maxed(cap_key)
            n = max(len(counts), len(table))
            out = [self._table(table, o) for o in range(n)]
            hit = False
            for o in range(len(counts)):
                c, cap = int(counts[o]), int(caps[o])
                if cap > 1 and c >= cap:
                    out[o] = max(out[o], up64(max(c * headroom, cap * 2.0)))
                    hit = True
            return (tuple(out), hit)

        cand, h1 = grow(self.candidate_caps, "cand_counts", "cand_caps")
        loc, h2 = grow(self.localized_caps, "loc_counts", "loc_caps")
        ori, h3 = grow(self.oriented_caps, "oriented_counts", "oriented_caps")
        big, h4 = grow(self.desc_big_caps, "desc_big_counts", "desc_big_caps")
        fin_count = int(np.max(np.asarray(stats["final_count"])))
        fin_cap = int(np.max(np.asarray(stats["final_cap"])))
        max_kp = self.max_keypoints
        h5 = fin_count >= fin_cap
        if h5:
            max_kp = max(max_kp,
                         up64(max(fin_count * headroom, fin_cap * 2.0)))
        if not (h1 or h2 or h3 or h4 or h5):
            return self
        return dataclasses.replace(
            self,
            candidate_caps=cand,
            localized_caps=loc,
            oriented_caps=ori,
            desc_big_caps=big,
            max_keypoints=max_kp,
        )

    def scaled_candidates(self, octave: int) -> int:
        """Candidate capacity for a given octave (shrinks with area)."""
        return self._table(self.candidate_caps, octave)

    def scaled_oriented(self, octave: int) -> int:
        """Oriented-keypoint capacity per octave (shrinks with area)."""
        return self._table(self.oriented_caps, octave)

    def scaled_localized(self, octave: int) -> int:
        """Localized-candidate capacity per octave (shrinks with area)."""
        return self._table(self.localized_caps, octave)


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """From-scratch SIFT constants (sift_impl.py:15, :117, :169, :246, :361)."""

    sigma: float = 1.6
    num_intervals: int = 3
    assumed_blur: float = 0.5
    image_border_width: int = 5
    contrast_threshold: float = 0.04
    eigen_ratio: float = 10.0
    max_localize_iters: int = 5
    # orientation assignment (sift_impl.py:246)
    radius_factor: float = 3.0
    num_bins: int = 36
    peak_ratio: float = 0.8
    scale_factor: float = 1.5
    # descriptors (sift_impl.py:361)
    window_width: int = 4
    desc_bins: int = 8
    scale_multiplier: float = 3.0
    descriptor_max_value: float = 0.2
    float_tolerance: float = 1e-7
    capacities: SiftCapacities = SiftCapacities()
    # Pallas kernels for the orientation/descriptor window histograms
    # (per-keypoint DMA windows + on-chip reduction); the XLA path is the
    # reference fallback and what CPU tests exercise.
    use_pallas: bool = False
    # Newton localization with mover compaction after iteration 1
    # (localize.localize_candidates_split_chunked): 75% of candidates
    # converge/reject at iteration 1 (docs/DEVNOTES.md fused-attribution
    # entry), so iterations 2-5 run only over the compacted movers.
    # Bit-identical outputs (tests/test_sift.py pins equality);
    # VFX_LOCALIZE_SPLIT=0/1 overrides at the pipeline entry.
    localize_split: bool = False
    # Slim-state early-exit Newton loop (localize.
    # localize_candidates_chunked_slim): carries 9 position/flag lanes
    # instead of 22 through the iteration (results re-derived once at
    # the last-compute cell) and stops a chunk as soon as its last real
    # row converges/rejects instead of always running 5 iterations.
    # Contract (pinned by tests/test_sift.py): valid rows bit-identical
    # EXCEPT ``response`` within 4 ulp — its final dot product is
    # re-contracted in a different executable (measured 1 ulp on 2/57
    # oracle rows).  ``response`` feeds the dedup sort key and match
    # tie-breaks, so a knife-edge ulp could in principle reorder a
    # duplicate pair on inputs beyond the verified datasets — the flag
    # stays experimental/off (it was a measured perf regression anyway,
    # docs/PROBE_LOCALIZE_SLIM_r04.json).  Takes precedence over
    # localize_split.  VFX_LOCALIZE_SLIM=0/1 overrides at the pipeline
    # entry.
    localize_slim: bool = False
    # VMEM-resident scalar-Newton localize (pallas_kernels.
    # localize_newton_resident): the whole DoG octave stack lives in
    # VMEM for one Pallas kernel that runs the full Newton loop per
    # candidate on the scalar core with true per-candidate early exit
    # (75% of candidates settle at iteration 1).  Measured -49% on the
    # fused extract prefix (docs/PROBE_LOCALIZE_RESIDENT_r04.json).
    # Only the kernel's INTEGER convergence state is consumed — the
    # scalar-core float solve wobbles <=1 ulp, which flipped a grail
    # knife edge end-to-end (docs/RESIDENT_E2E_r04.json first attempt)
    # — and all float lanes are re-derived in XLA at the last-compute
    # cell.  Contract (pinned by tests/test_sift.py): valid rows
    # bit-identical EXCEPT ``response`` within 4 ulp (same
    # cross-executable dot-product re-contraction as localize_slim;
    # ``response`` only feeds dedup sort keys / tie-breaks, and
    # end-to-end byte parity on all four datasets is verified on chip
    # by scripts/verify_resident_e2e.py).  Takes precedence over
    # localize_slim/localize_split.  Octaves with h < 16 fall back to
    # the plain path (no candidates there anyway).
    # VFX_LOCALIZE_RESIDENT=0/1 overrides at the pipeline entry.
    localize_resident: bool = False

    @property
    def images_per_octave(self) -> int:
        return self.num_intervals + 3


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """NN matching + translation voting (image_stitching_harris.py:219,:242)."""

    # Absolute squared-L2 threshold on the best match distance.  The
    # reference uses 1.0 for unit-norm Harris descriptors
    # (image_stitching_harris.py:494) and 25000 for 0-255 scaled SIFT
    # descriptors (image_stitching_sift.py:325).  No Lowe ratio in the
    # stitching path; a ratio-test option exists for the UI/matching API.
    desc_thresh: float = 1.0
    ransac_thresh: float = 3.0    # squared-distance vote threshold
    lowe_ratio: Optional[float] = None
    # top-k exact re-check width; 1 = trust the matmul distances (exact for
    # integer-valued SIFT descriptors), >1 = refine (float Harris descs)
    refine: int = 8
    # knife-edge precision escalation: threshold/argmin decisions whose
    # margin is below this are re-decided on host with reference-faithful
    # f64 descriptor math (models/sift/strict.py).  0 disables.  1024 =
    # two worst-case +-1 descriptor-component flips (2 * (2*255 + 1)).
    borderline_margin: float = 0.0


@dataclasses.dataclass(frozen=True)
class StitchConfig:
    """End-to-end pipeline configuration (drives run_panorama parity)."""

    backend: str = "sift"                # "sift" | "harris"
    harris: HarrisConfig = HarrisConfig()
    sift: SiftConfig = SiftConfig()
    crop_margin: int = 15                # rectangle_crop extra_margin default
    black_threshold: int = 0             # rectangle_crop threshold
    save_steps: bool = False             # dump per-step mosaics (regenerates
    #                                      the pano_step_* goldens)
    profile_dir: Optional[str] = None    # jax.profiler trace output

    def match(self) -> MatchConfig:
        if self.backend == "harris":
            return MatchConfig(desc_thresh=1.0, refine=8)
        return MatchConfig(
            desc_thresh=25000.0, refine=1, borderline_margin=1024.0
        )


DEFAULT_CROP_MARGINS = {
    # Margins used by the author to produce the Result/ goldens
    # (README.md:52-54, report p.16).
    "out": 30,
    "parrington": 15,
    "grail": 17,
    "wind": 24,
}
