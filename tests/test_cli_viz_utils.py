"""CLI, visualization (headless), and utility tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR, REPO_ROOT
from vfx_image_stitching_tpu.utils.metrics import aligned_rmse
from vfx_image_stitching_tpu.utils.profiling import PhaseTimer


def test_aligned_rmse_identical():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    rmse, off = aligned_rmse(img, img)
    assert rmse == 0.0 and off == (0, 0)


def test_aligned_rmse_finds_shift():
    rng = np.random.default_rng(1)
    big = rng.integers(0, 256, (44, 64, 3), dtype=np.uint8)
    a = big[2:42, 3:63]
    b = big[0:40, 0:60]
    rmse, off = aligned_rmse(a, b, max_offset=4)
    assert rmse == 0.0
    assert off == (-2, -3)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    total = t.total()
    assert set(t.phases) == {"a", "b", "total"}
    assert total >= t.phases["a"]


@requires_reference
@requires_cv2
def test_cli_harris_out(tmp_path):
    out = tmp_path / "pano.jpg"
    env = dict(os.environ)
    # force a pure-CPU subprocess: drop any TPU-plugin sitecustomize dirs
    # from PYTHONPATH and pin the platform
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO_ROOT] + keep)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable, "-m", "vfx_image_stitching_tpu.pipeline.cli",
            os.path.join(REFERENCE_DIR, "out"),
            "--backend", "harris", "--margin", "30", "--out", str(out),
        ],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()


@requires_reference
@requires_cv2
def test_headless_harris_demo(tmp_path):
    from vfx_image_stitching_tpu.viz import render_harris_demo

    out = render_harris_demo(
        os.path.join(REFERENCE_DIR, "out", "out00.jpg"),
        os.path.join(REFERENCE_DIR, "out", "out01.jpg"),
        str(tmp_path / "demo.png"),
    )
    assert os.path.exists(out)


@requires_reference
@requires_cv2
def test_profile_trace_writes_artifacts(tmp_path):
    from vfx_image_stitching_tpu.config import StitchConfig
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    cfg = StitchConfig(backend="harris", profile_dir=str(tmp_path / "trace"))
    stitch_panorama(
        os.path.join(REFERENCE_DIR, "wind"), backend="harris",
        crop_margin=24, cfg=cfg, save_path=None,
    )
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(tmp_path / "trace") for f in fs
    ]
    assert files, "profiler trace directory is empty"


def test_oracle_fixture_wellformed():
    with open(os.path.join(REPO_ROOT, "tests", "data",
                           "oracle_sift_shifts.json")) as f:
        data = json.load(f)
    assert set(data) == {"out", "parrington", "grail"}
    assert len(data["parrington"]["shifts"]) == 17
    assert len(data["grail"]["pairs"]) == 17


def test_capacity_overflow_report():
    import numpy as np

    from vfx_image_stitching_tpu.utils.capacity import capacity_overflow_report

    ok = {
        "cand_counts": np.array([[10, 5], [3, 2]]),
        "cand_caps": np.array([64, 32]),
        "final_count": np.array([7, 9]),
        "final_cap": np.array(128),
    }
    assert capacity_overflow_report(ok) == []

    bad = dict(ok, final_count=np.array([7, 128]))
    msgs = capacity_overflow_report(bad)
    assert len(msgs) == 1 and "final keypoints" in msgs[0]


def test_root_shims_reference_surface():
    """Every reference root script has a same-named working counterpart.

    The reference exposes 5 root-level entry files; a switching user's
    ``import sift_impl`` and ``python {sift,harris}_visualizeUI.py``
    must keep working (sift_visualizeUI.py:104-115 imports the stage
    functions from the root module).
    """
    import importlib
    import py_compile

    sift_impl = importlib.import_module("sift_impl")
    for name in (
        "compute_keypoints_and_descriptors",
        "generate_base_image",
        "compute_number_of_octaves",
        "generate_gaussian_kernels",
        "generate_gaussian_images",
        "generate_DoG_images",
        "find_scale_space_extrema",
        "localize_extremum_via_quadratic_fit",
        "compute_keypoints_with_orientations",
        "compare_keypoints",
        "remove_duplicate_keypoints",
        "convert_keypoints_to_input_image_size",
        "unpack_octave",
        "generate_descriptors",
        "is_pixel_an_extremum",
    ):
        assert callable(getattr(sift_impl, name)), name

    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for script in (
        "image_stitching_harris.py",
        "image_stitching_sift.py",
        "sift_visualizeUI.py",
        "harris_visualizeUI.py",
    ):
        py_compile.compile(os.path.join(root, script), doraise=True)


def _load_root_shim(name: str):
    """Load a repo-root shim by file path under a private module name, so
    the reference module of the same name (loaded by other tests'
    sys.path-based fixtures) can't shadow it in sys.modules."""
    import importlib.util

    path = os.path.join(REPO_ROOT, name + ".py")
    spec = importlib.util.spec_from_file_location("_shim_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_reference_oracle_loader_independent():
    """Oracle loading must not be poisoned by our same-named root shims.

    ``import sift_impl`` after the repo root is on sys.path caches OUR
    shim; a naive oracle fixture would then compare us against ourselves.
    load_reference_module must return the file under the reference dir
    regardless.
    """
    import importlib

    from tests.conftest import load_reference_module

    ours = importlib.import_module("sift_impl")
    assert ours.__file__.startswith(REPO_ROOT)
    ref = load_reference_module("sift_impl")
    assert ref.__file__.startswith(REFERENCE_DIR)
    assert ref is not ours
    ref_sift_script = load_reference_module("image_stitching_sift")
    assert ref_sift_script.__file__.startswith(REFERENCE_DIR)
    # the reference script's internal sift_impl binding is the reference's
    assert ref_sift_script.compute_keypoints_and_descriptors.__module__ \
        == "_ref_sift_impl"
    # and the cached top-level name is still ours (loader restored it)
    import sift_impl as again

    assert again is ours


def test_root_shims_module_level_functions():
    """The two stitcher shims re-export the reference's full module-level
    library (image_stitching_harris.py:10-420, image_stitching_sift.py:
    12-247), and the UI shims its helper functions (sift_visualizeUI.py:
    21-86, harris_visualizeUI.py:15-221)."""
    harris = _load_root_shim("image_stitching_harris")
    for name in (
        "read_pano_data", "conv2d", "calc_orientation", "gen_descriptor",
        "HarrisCorner", "compute_keypoints_and_descriptors_harris",
        "simple_match", "ransac", "compute_shift_harris",
        "cylindrical_projection", "pad_image", "blend_two_images",
        "rectangle_crop", "run_panorama",
    ):
        assert callable(getattr(harris, name)), name

    sift = _load_root_shim("image_stitching_sift")
    for name in (
        "read_pano_data", "compute_shift_sift", "ransac",
        "cylindrical_projection", "pad_image", "blend_two_images",
        "rectangle_crop", "run_panorama",
    ):
        assert callable(getattr(sift, name)), name

    sift_ui = _load_root_shim("sift_visualizeUI")
    for name in ("cvimg_to_qpixmap", "draw_feature_points_return_disp"):
        assert callable(getattr(sift_ui, name)), name
    assert hasattr(sift_ui, "SIFTVisualizer")  # None without PyQt5

    harris_ui = _load_root_shim("harris_visualizeUI")
    for name in (
        "conv2d", "HarrisCorner", "calc_orientation", "gen_descriptor",
        "compute_keypoints_and_descriptors_harris", "simple_match",
        "convertCV2Qt", "draw_harris_corners_on_image",
        "draw_matches_side_by_side",
    ):
        assert callable(getattr(harris_ui, name)), name
    assert hasattr(harris_ui, "HarrisDemoWindow")


def test_root_shim_harris_functions_smoke():
    """Smoke-run the re-exported Harris library end-to-end on a synthetic
    image: HarrisCorner -> calc_orientation -> gen_descriptor must agree
    with the batched compute_keypoints_and_descriptors_harris, and conv2d
    must match a direct edge-padded shifted-add oracle."""
    mod = _load_root_shim("image_stitching_harris")
    rng = np.random.default_rng(7)

    # conv2d vs a tiny transcription oracle (image_stitching_harris.py:49-61)
    img = rng.normal(size=(12, 15)).astype(np.float32)
    kernel = np.array([[0, 1, 0], [1, 0, -1], [0, -1, 0]], np.float32)
    pad = np.pad(img, 1, "edge").astype(np.float64)
    want = np.zeros_like(img, dtype=np.float64)
    for i in range(3):
        for j in range(3):
            want += pad[i : i + 12, j : j + 15] * kernel[i, j]
    np.testing.assert_allclose(mod.conv2d(img, kernel), want, atol=1e-4)

    # HarrisCorner -> gen_descriptor chain consistency with the batched path
    image = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    image[20:28, 30:38] = 255  # a strong corner-rich block
    cands, ix, iy = mod.HarrisCorner(image, max_points=50)
    assert cands and all(len(c) == 3 for c in cands)
    resp = [c[2] for c in cands]
    assert resp == sorted(resp, reverse=True)
    m, theta = mod.calc_orientation(ix, iy)
    assert m.shape == image.shape[:2] and theta.min() >= 0 and theta.max() < 360

    kps, descs = mod.compute_keypoints_and_descriptors_harris(image, 50)
    in_border = [
        (y, x) for (y, x, _r) in cands
        if 8 <= y < image.shape[0] - 8 and 8 <= x < image.shape[1] - 8
    ]
    assert [k for k in kps] == [(x, y) for (y, x) in in_border]
    if in_border:
        y0, x0 = in_border[0]
        d0 = mod.gen_descriptor(y0, x0, m, theta)
        assert d0.shape == (128,)
        np.testing.assert_allclose(d0, descs[0], atol=1e-5)

    # matching + ransac + blend through the re-exported names
    (dx, dy), pair = mod.compute_shift_harris(image, image, 3, 1.0)
    assert (dx, dy) == (0, 0) and pair is not None


def test_ui_draw_helpers_smoke():
    """draw_harris_corners_on_image / draw_matches_side_by_side /
    draw_feature_points_return_disp produce the reference's overlays."""
    harris_ui = _load_root_shim("harris_visualizeUI")
    rng = np.random.default_rng(3)
    a = rng.integers(0, 200, (30, 40, 3), dtype=np.uint8)
    b = rng.integers(0, 200, (26, 35, 3), dtype=np.uint8)

    out = harris_ui.draw_harris_corners_on_image(a, [(10, 12), (0, 0)])
    assert out.shape == a.shape
    assert tuple(out[12, 10]) == (0, 0, 255)  # red BGR dot at (x=10, y=12)
    assert tuple(out[0, 0]) == (0, 0, 255)  # clipped at the border
    assert not np.shares_memory(out, a)

    merged = harris_ui.draw_matches_side_by_side(
        a, [], b, [], [((5, 6), (7, 8))]
    )
    assert merged.shape == (30, 75, 3)
    assert tuple(merged[6, 5]) == (0, 0, 255)  # red endpoint in A
    assert tuple(merged[8, 7 + 40]) == (255, 0, 0)  # blue endpoint in B

    sift_ui = _load_root_shim("sift_visualizeUI")
    from vfx_image_stitching_tpu.models.sift.extract import KeyPointRecord

    kp = KeyPointRecord(pt=(10.0, 12.0), size=3.0, angle=45.0,
                        response=1.0, octave=0)
    disp = sift_ui.draw_feature_points_return_disp(a, [kp])
    assert disp.ndim == 3 and disp.shape[2] == 3 and disp.dtype == np.uint8
