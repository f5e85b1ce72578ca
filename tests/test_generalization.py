"""Shape-generalization stress suite: the pipeline past the four homework
datasets.

Every capacity and shape assumption in the fixed-shape SIFT/Harris
pipeline was historically validated on exactly the four reference folders
(384x512 / 428x571 / 708x434, PARITY.md deviation 4).  This suite
synthesizes panorama chains at NOVEL shapes — different sizes, odd
dimensions, and a size that changes the SIFT octave count — and checks

* full-pipeline parity against the reference scripts (loaded from
  /root/reference by file path, conftest.load_reference_module) on the
  same synthetic inputs: exact shifts and byte-identical panoramas, and
* capacity non-overflow via utils.capacity.audit_sift_capacities at the
  capacities the pipeline itself would resolve for that image size.

The oracle driver below transcribes the non-interactive core of the
reference's ``run_panorama`` (image_stitching_harris.py:425-548 /
image_stitching_sift.py:254-389: load -> cylindrical projection ->
pairwise shifts -> drift correction -> sequential blend -> crop) while
calling the REFERENCE module's own functions for every algorithmic stage.
"""

import os

import numpy as np
import pytest

from tests.conftest import (
    REFERENCE_DIR,
    load_reference_module,
    requires_cv2,
    requires_reference,
)


# ---------------------------------------------------------------------------
# synthetic chains
# ---------------------------------------------------------------------------

def make_scene(h: int, total_w: int, seed: int) -> np.ndarray:
    """Photo-like BGR scene: smooth background + high-contrast blocks.

    Bilinear-upsampled coarse noise gives the smooth shading of a photo;
    sprinkled rectangles give Harris corners and SIFT extrema.  Content
    density is photo-like on purpose: the capacity tables model photo
    statistics (config.SiftCapacities), not adversarial white noise.
    """
    import cv2

    rng = np.random.default_rng(seed)
    coarse = rng.integers(
        30, 226, ((h + 7) // 8 + 1, (total_w + 7) // 8 + 1, 3)
    ).astype(np.uint8)
    scene = cv2.resize(coarse, (total_w, h), interpolation=cv2.INTER_LINEAR)
    for _ in range(max(20, h * total_w // 4000)):
        y0 = int(rng.integers(0, h - 12))
        x0 = int(rng.integers(0, total_w - 12))
        hh = int(rng.integers(4, 12))
        ww = int(rng.integers(4, 12))
        scene[y0:y0 + hh, x0:x0 + ww] = rng.integers(
            0, 256, (3,)
        ).astype(np.uint8)
    return scene


def synth_chain(
    folder: str, n: int, h: int, w: int, seed: int, focal: float,
    overlap_frac: float = 0.65,
) -> None:
    """Write an n-image chain of (h, w) crops + pano.txt into ``folder``.

    Crops run right-to-left across one scene so pairwise dx is negative —
    the pan direction of every reference dataset (the reference blend
    only grows the mosaic on its dx<0 branch).  PNG keeps both sides'
    inputs byte-identical (no codec in the comparison).
    """
    import cv2

    overlap = int(w * overlap_frac)
    step = w - overlap
    scene = make_scene(h, w + (n - 1) * step + 8, seed)
    lines = []
    for i in range(n):
        x0 = (n - 1 - i) * step
        fn = f"im{i:02d}.png"
        cv2.imwrite(os.path.join(folder, fn), scene[:, x0:x0 + w])
        # slightly distinct focals per image, as in the reference datasets
        lines += [fn, f"{focal + i * 0.37:.3f}"]
    with open(os.path.join(folder, "pano.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# reference oracle driver (non-interactive run_panorama core)
# ---------------------------------------------------------------------------

def reference_driver(folder: str, ref, backend: str):
    """run_panorama's compute core using the reference module's functions.

    Transcribes image_stitching_harris.py:441-533 (= sift:270-365):
    read pano.txt, load + cylindrical projection, pairwise shifts with
    height equalization, drift correction, sequential blend.  Returns
    (shifts_after_drift, mosaic_before_crop).
    """
    import cv2

    paths, focals = ref.read_pano_data(os.path.join(folder, "pano.txt"))
    cyl = []
    for p, f in zip(paths, focals):
        fp = p if os.path.exists(p) else os.path.join(
            folder, os.path.basename(p))
        cyl.append(ref.cylindrical_projection(cv2.imread(fp), f))

    shifts, pairs = [], []
    for i in range(len(cyl) - 1):
        dy = cyl[i].shape[0] - cyl[i + 1].shape[0]
        if dy != 0:
            cyl[i + 1] = ref.pad_image(cyl[i + 1], 0, dy)
        if backend == "harris":
            s, p = ref.compute_shift_harris(
                cyl[i], cyl[i + 1], ransac_thr=3, desc_thresh=1.0)
        else:
            s, p = ref.compute_shift_sift(
                cyl[i], cyl[i + 1], ransac_thr=3, desc_thresh=25000)
        shifts.append(s)
        pairs.append(p)

    # drift correction (image_stitching_harris.py:502-520)
    n = len(cyl)
    total_dy = sum(dy for _, dy in shifts)
    average_drift = total_dy / (n - 1) if n > 1 else 0
    new_shifts = [(dx, dy - average_drift) for dx, dy in shifts]

    # sequential blend (image_stitching_harris.py:523-534)
    mosaic = cyl[0].copy()
    for i in range(1, n):
        dy = mosaic.shape[0] - cyl[i].shape[0]
        img = ref.pad_image(cyl[i], 0, dy) if dy != 0 else cyl[i]
        mosaic = ref.blend_two_images(new_shifts[i - 1], pairs[i - 1],
                                      mosaic, img)
    return new_shifts, mosaic


def _assert_pipeline_matches_reference(tmp_path, h, w, n, focal, backend,
                                       margin=8, seed=None):
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = str(tmp_path / f"synth_{backend}_{h}x{w}")
    os.makedirs(folder)
    synth_chain(folder, n=n, h=h, w=w, seed=seed if seed is not None else h,
                focal=focal)

    name = ("image_stitching_harris" if backend == "harris"
            else "image_stitching_sift")
    ref = load_reference_module(name)
    ref_shifts, ref_mosaic = reference_driver(folder, ref, backend)
    ref_pano = ref.rectangle_crop(ref_mosaic, 0, margin)

    res = stitch_panorama(folder, backend=backend, crop_margin=margin,
                          save_path=None)
    # the driver's overflow-recovery loop must leave no stage at
    # capacity (None on runs that never overflowed)
    assert res.capacity_stats is None, res.capacity_stats

    # reference_driver returns drift-CORRECTED shifts; the raw pairwise
    # shifts live in res.shifts, the corrected ones in corrected_shifts.
    # SIFT keypoint coordinates carry a float tail from the pyramid (the
    # cv2-chain emulation agrees to ~1e-4, not bit-exactly — PARITY.md),
    # so shift parity is placement equivalence (|delta| < 0.5, the same
    # contract scripts/verify_parity.py pins on the golden datasets);
    # Harris corners are integers, so Harris shifts must agree exactly.
    # The byte-identical panorama assert below is the end-to-end check.
    tol = 0.0 if backend == "harris" else 0.5
    ours_shifts = res.corrected_shifts
    assert len(ours_shifts) == len(ref_shifts)
    for (ax, ay), (bx, by) in zip(ours_shifts, ref_shifts):
        assert abs(float(ax) - float(bx)) <= tol, (ours_shifts, ref_shifts)
        assert abs(float(ay) - float(by)) <= tol, (ours_shifts, ref_shifts)
    ours = np.asarray(res.panorama)
    assert ours.shape == ref_pano.shape, (ours.shape, ref_pano.shape)
    if backend == "harris":
        # integer corner coordinates -> bit-exact shifts -> byte-exact
        assert np.array_equal(ours, ref_pano)
    else:
        # SIFT winning-pair coordinates carry the pyramid's ~1e-4 float
        # tail (cv2-chain emulation, PARITY.md), and the reference blend
        # feeds them raw into its alpha denominator
        # (image_stitching_sift.py blend_two_images: overlap_range).
        # Where overlap content is identical, (1-a)*v + a*v sits exactly
        # on an integer and uint8 TRUNCATION flips on alpha's last bits
        # — so parity up to that tail is |diff| <= 1.  Feeding OUR
        # shifts/pairs through the reference blend reproduces our bytes
        # exactly (the compose itself is reference-exact; isolated in
        # round 5), so anything beyond +-1 here is a real bug.
        d = ours.astype(np.int32) - ref_pano.astype(np.int32)
        assert np.abs(d).max() <= 1, np.abs(d).max()
        frac = np.count_nonzero(d.any(axis=-1)) / d[..., 0].size
        assert frac < 0.15, frac


# ---------------------------------------------------------------------------
# full-pipeline parity at novel shapes
# ---------------------------------------------------------------------------

@requires_reference
@requires_cv2
@pytest.mark.parametrize("h,w,focal", [
    (300, 400, 500.0),   # novel size, even dims
    (231, 317, 400.0),   # odd dims in both axes
])
def test_harris_full_pipeline_novel_shapes(tmp_path, h, w, focal):
    _assert_pipeline_matches_reference(
        tmp_path, h, w, n=3, focal=focal, backend="harris")


@requires_reference
@requires_cv2
def test_sift_full_pipeline_novel_shape_small(tmp_path):
    """96x128 changes the octave count vs every reference dataset
    (round(log2(min(192, 256))) - 1 = 7 octaves vs 9)."""
    _assert_pipeline_matches_reference(
        tmp_path, 96, 128, n=3, focal=300.0, backend="sift")


@requires_reference
@requires_cv2
@pytest.mark.slow
def test_sift_full_pipeline_novel_shape_odd(tmp_path):
    """Odd dimensions at a second octave count (115x153 -> 8 octaves);
    odd heights make every pyramid/DoG level's shape odd too."""
    _assert_pipeline_matches_reference(
        tmp_path, 115, 153, n=2, focal=350.0, backend="sift")


# ---------------------------------------------------------------------------
# capacity audit at novel shapes
# ---------------------------------------------------------------------------

def _audit_at_shape(h, w, seed, autogrow=False, n_imgs=2):
    import dataclasses

    import cv2

    from vfx_image_stitching_tpu.config import SiftCapacities, SiftConfig
    from vfx_image_stitching_tpu.utils.capacity import audit_sift_capacities

    scene = make_scene(h, w * n_imgs, seed)
    imgs = [scene[:, i * w:(i + 1) * w] for i in range(n_imgs)]
    caps = SiftCapacities().scaled_for_area(h, w)
    cfg = dataclasses.replace(SiftConfig(), capacities=caps)
    return audit_sift_capacities(imgs, cfg, autogrow=autogrow)


@requires_cv2
@pytest.mark.parametrize("h,w", [(300, 400), (231, 317), (97, 129)])
def test_capacity_audit_novel_shapes(h, w):
    """Autogrow must converge at every novel shape: the synthetic block
    content is DENSER than the audited photo statistics (at 300x400 it
    overflows desc_big octave 1: 324 keypoints vs the 256 cap), which is
    exactly the case the grown_to_fit recovery path exists for."""
    agg = _audit_at_shape(h, w, seed=h * 7 + w, autogrow=True)
    # converged capacities fit with real occupancy headroom
    assert (agg["cand_counts"] < agg["cand_caps"]).all()
    assert (agg["desc_big_counts"] < agg["desc_big_caps"]).all()


def test_grown_to_fit_growth_rules():
    """grown_to_fit grows exactly the stages at capacity (lane-aligned,
    geometric floor) and is the identity object when everything fits."""
    import numpy as np

    from vfx_image_stitching_tpu.config import SiftCapacities

    caps = SiftCapacities()
    fits = {
        "cand_counts": np.array([100, 50]), "cand_caps": np.array([4096, 1024]),
        "loc_counts": np.array([10, 5]), "loc_caps": np.array([2048, 640]),
        "oriented_counts": np.array([10, 5]),
        "oriented_caps": np.array([2560, 640]),
        "desc_big_counts": np.array([10, 5]),
        "desc_big_caps": np.array([1024, 256]),
        "final_count": 100, "final_cap": 3072,
    }
    assert caps.grown_to_fit(fits) is caps

    over = dict(fits)
    # true count above cap: sized from the count with headroom
    over["desc_big_counts"] = np.array([10, 324])
    grown = caps.grown_to_fit(over)
    assert grown is not caps
    assert grown.desc_big_caps[1] >= int(324 * 1.5)
    assert grown.desc_big_caps[1] % 64 == 0
    # untouched tables unchanged
    assert grown.candidate_caps == caps.candidate_caps
    assert grown.max_keypoints == caps.max_keypoints

    # clipped count (== cap): the 2x floor guarantees progress
    clipped = dict(fits)
    clipped["oriented_counts"] = np.array([2560, 5])
    g2 = caps.grown_to_fit(clipped)
    assert g2.oriented_caps[0] >= 2 * 2560

    # N-image leading axis: max over images
    batched = dict(fits)
    batched["desc_big_counts"] = np.array([[10, 5], [10, 300]])
    batched["desc_big_caps"] = np.array([[1024, 256], [1024, 256]])
    g3 = caps.grown_to_fit(batched)
    assert g3.desc_big_caps[1] >= int(300 * 1.5)

    # final keypoint cap grows too
    fin = dict(fits)
    fin["final_count"] = np.array([3072, 10])
    g4 = caps.grown_to_fit(fin)
    assert g4.max_keypoints >= 2 * 3072


@requires_reference
@requires_cv2
@pytest.mark.slow
def test_sift_pipeline_overflow_recovery(tmp_path):
    """Full-pipeline SIFT at the overflowing shape/content (300x400
    blocks): the driver's recovery loop must re-run with grown
    capacities and still match the reference oracle — no silent
    keypoint truncation."""
    _assert_pipeline_matches_reference(
        tmp_path, 300, 400, n=2, focal=500.0, backend="sift",
        seed=300 * 7 + 400)


@requires_cv2
@pytest.mark.slow
def test_capacity_audit_large_image():
    """480x640 sits just under the audited max area (wind's 708x434).
    The synthetic block content is denser per-pixel than the photo
    statistics the default tables model, so the audit may overflow —
    autogrow must converge (the same recovery the pipeline runs).
    Single image: every autogrow round recompiles the extraction at the
    grown shapes, which dominates on small CI hosts."""
    agg = _audit_at_shape(480, 640, seed=5, autogrow=True, n_imgs=1)
    assert (agg["desc_big_counts"] < agg["desc_big_caps"]).all()


@requires_cv2
@pytest.mark.slow
def test_capacity_audit_beyond_audited_area():
    """560x720 exceeds the audited area, engaging the area-scaled
    capacity tables.  The real extraction costs several compile rounds
    (autogrow re-specializes shapes), so it runs only with
    VFX_HEAVY_TESTS=1; the scaling logic itself is always asserted."""
    from vfx_image_stitching_tpu.config import SiftCapacities

    caps = SiftCapacities()
    scaled = caps.scaled_for_area(560, 720)
    assert scaled != caps
    assert scaled.candidate_caps[0] > caps.candidate_caps[0]
    if os.environ.get("VFX_HEAVY_TESTS") != "1":
        pytest.skip("set VFX_HEAVY_TESTS=1 for the real 560x720 "
                    "extraction audit")
    agg = _audit_at_shape(560, 720, seed=9, autogrow=True, n_imgs=1)
    assert (agg["cand_counts"] < agg["cand_caps"]).all()


def test_scaled_for_area_reference_shapes_are_identity():
    """At every reference-dataset shape the scaled capacities are
    unchanged, so the benchmark executables (and every reference-dataset
    test) compile to identical shapes."""
    from vfx_image_stitching_tpu.config import SiftCapacities

    caps = SiftCapacities()
    for h, w in [(384, 512), (428, 571), (708, 434)]:
        assert caps.scaled_for_area(h, w) == caps
    # smaller images never shrink capacity (only octave tails truncate)
    assert caps.scaled_for_area(96, 128) == caps
    up = caps.scaled_for_area(600, 800)
    assert up.candidate_caps[0] > caps.candidate_caps[0]
    assert up.max_keypoints > caps.max_keypoints
    # all count caps stay lane-aligned
    assert all(v % 64 == 0 for v in up.candidate_caps + up.localized_caps
               + up.oriented_caps + up.desc_small_caps + up.desc_big_caps)
    assert up.max_keypoints % 64 == 0
    # window caps are per-octave properties, not area properties
    assert up.max_radius == caps.max_radius
    assert up.max_half_width == caps.max_half_width
