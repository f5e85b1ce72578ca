"""End-to-end Harris pipeline regression on the reference datasets.

Expected shifts/pairs were produced by running the reference scripts in
this environment (they reproduce the author's parrington golden shape
exactly); asserting equality pins full-pipeline parity without paying the
reference's multi-second oracle cost at test time.
"""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR

# reference (this-environment) results for out/: shift & winning pair
OUT_SHIFT = (-97.0, 4.0)
OUT_PAIR = ((152.0, 55.0), (249.0, 51.0))

# reference parrington pairwise shifts (18 images -> 17 pairs)
PARRINGTON_SHIFTS = [
    (-246.0, -4.0), (-242.0, -4.0), (-250.0, -5.0), (-241.0, -4.0),
    (-250.0, -4.0), (-242.0, -4.0), (-246.0, -5.0), (-246.0, -3.0),
    (-240.0, -5.0), (-249.0, -4.0), (-245.0, -5.0), (-240.0, -4.0),
    (-251.0, -5.0), (-245.0, -5.0), (-241.0, -4.0), (-254.0, -4.0),
    (-241.0, -4.0),
]


@requires_reference
@requires_cv2
def test_out_harris_end_to_end():
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    res = stitch_panorama(
        os.path.join(REFERENCE_DIR, "out"),
        backend="harris",
        crop_margin=30,
        save_path=None,
    )
    assert res.shifts == [OUT_SHIFT]
    assert res.pairs == [OUT_PAIR]
    assert res.mosaic.shape == (571, 525, 3)
    assert res.panorama.shape == (511, 497, 3)


@requires_reference
@requires_cv2
def test_wind_single_image_dataset():
    """wind/pano.txt drops wind02 (no focal) -> 1-image 'panorama'."""
    import cv2

    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama
    from vfx_image_stitching_tpu.utils.metrics import aligned_rmse

    res = stitch_panorama(
        os.path.join(REFERENCE_DIR, "wind"),
        backend="harris",
        crop_margin=24,
        save_path=None,
    )
    assert res.shifts == []
    golden = cv2.imread(
        os.path.join(REFERENCE_DIR, "Result", "harris_wind_result.jpg")
    )
    assert res.panorama.shape == golden.shape == (386, 654, 3)
    rmse, off = aligned_rmse(res.panorama, golden)
    assert off == (0, 0) and rmse < 3.0


@requires_reference
@requires_cv2
def test_stitch_many_small_datasets():
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many

    results = stitch_many(
        [os.path.join(REFERENCE_DIR, "wind"), os.path.join(REFERENCE_DIR, "out")],
        backend="harris",
    )
    assert set(results) == {"wind", "out"}
    assert results["wind"].panorama.shape == (386, 654, 3)
    assert results["out"].shifts == [OUT_SHIFT]


@requires_reference
@requires_cv2
@pytest.mark.slow
def test_parrington_harris_end_to_end_vs_golden():
    import cv2

    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    res = stitch_panorama(
        os.path.join(REFERENCE_DIR, "parrington"),
        backend="harris",
        crop_margin=15,
        save_path=None,
        return_steps=True,
    )
    assert res.shifts == PARRINGTON_SHIFTS
    golden = cv2.imread(
        os.path.join(REFERENCE_DIR, "Result", "harris_prtn_result.jpg")
    )
    assert res.panorama.shape == golden.shape
    d = res.panorama.astype(np.float64) - golden.astype(np.float64)
    rmse = float(np.sqrt((d**2).mean()))
    assert rmse < 3.0  # JPEG-noise level ("blend tolerance")

    # per-step mosaics vs the author's pano_step goldens.  The author's
    # run used an older OpenCV whose Harris shifts differ by ~1px on a
    # couple of early pairs, so step canvases can differ by a few pixels;
    # aligned RMSE over the overlap is the right comparison.
    from vfx_image_stitching_tpu.utils.metrics import aligned_rmse

    assert len(res.steps) == 17
    for step_no in (1, 8, 17):
        g = cv2.imread(
            os.path.join(REFERENCE_DIR, "pano_step_parrington",
                         f"pano{step_no}.jpg")
        )
        step = res.steps[step_no - 1]
        srmse, _off = aligned_rmse(step, g, max_offset=6)
        assert srmse < 20.0, (step_no, step.shape, g.shape, srmse)


def test_stitch_many_matches_stitch_panorama(tmp_path, reference_dir):
    """Pipelined multi-dataset run == per-dataset runs, bit for bit."""
    import os

    import cv2
    import numpy as np

    from vfx_image_stitching_tpu.pipeline.multi import stitch_many
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folders = []
    src = cv2.imread(os.path.join(reference_dir, "out", "out00.jpg"))
    src2 = cv2.imread(os.path.join(reference_dir, "out", "out01.jpg"))
    for name, off in (("dsa", 0), ("dsb", 16)):
        d = tmp_path / name
        d.mkdir()
        cv2.imwrite(str(d / "a.jpg"), src[off : off + 120, 40:180])
        cv2.imwrite(str(d / "b.jpg"), src2[off : off + 120, 40:180])
        (d / "pano.txt").write_text("a.jpg\n455.0\nb.jpg\n455.5\n")
        folders.append(str(d))

    multi = stitch_many(folders, backend="harris", margins={"dsa": 2, "dsb": 2})
    for f in folders:
        name = os.path.basename(f)
        single = stitch_panorama(f, backend="harris", crop_margin=2)
        assert multi[name].shifts == single.shifts
        np.testing.assert_array_equal(multi[name].panorama, single.panorama)


@requires_reference
@requires_cv2
def test_gray_first_path_equals_default(monkeypatch):
    """VFX_GRAY_FIRST=1 (gray-critical-path loader + compose-time RGB
    projection) must be pixel-identical to the default RGB path — the
    fixed-point BGR2GRAY commutes exactly with the cylindrical gather.

    Both runs pin VFX_HOST_COMPOSE=0: under host compose (the default)
    gray-first is already on, and this test exists to cover the
    DEVICE-compose pairing — the compose_cyl RGB-projection closure and
    the upload_rgb=True loader leg."""
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    folder = os.path.join(REFERENCE_DIR, "out")
    monkeypatch.setenv("VFX_HOST_COMPOSE", "0")
    base = stitch_panorama(folder, backend="harris", crop_margin=30)
    monkeypatch.setenv("VFX_GRAY_FIRST", "1")
    gray = stitch_panorama(folder, backend="harris", crop_margin=30)
    assert gray.shifts == base.shifts
    assert gray.pairs == base.pairs
    np.testing.assert_array_equal(gray.panorama, base.panorama)
    np.testing.assert_array_equal(gray.mosaic, base.mosaic)
