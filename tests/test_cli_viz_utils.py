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
