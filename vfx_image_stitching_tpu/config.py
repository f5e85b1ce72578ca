"""Configuration dataclasses mirroring every reference algorithm constant.

The reference keeps all constants as function default kwargs (Harris:
``image_stitching_harris.py:135``; SIFT: ``sift_impl.py:15``; thresholds at
``image_stitching_harris.py:490-494`` and ``image_stitching_sift.py:325``).
Here they live in frozen dataclasses so every stage is explicitly
parameterized and hashable (usable as jit static args).
"""

from __future__ import annotations

import dataclasses
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
    # Valid-row outputs bit-identical to the plain path (pinned by
    # tests/test_sift.py); takes precedence over localize_split.
    # VFX_LOCALIZE_SLIM=0/1 overrides at the pipeline entry.
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
    # cell.  Valid-row bit-identity pinned by tests/test_sift.py;
    # end-to-end byte parity on all four datasets by
    # scripts/verify_resident_e2e.py.  Takes precedence over
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
