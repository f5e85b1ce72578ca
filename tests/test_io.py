"""pano.txt parser and dataset loading tests (reference parity)."""

import os
import textwrap

import numpy as np
import pytest

from vfx_image_stitching_tpu.io import (
    read_pano_data,
    resolve_image_path,
    load_dataset,
    stack_dataset,
)
from tests.conftest import requires_reference, requires_cv2


def test_parser_basic(tmp_path):
    p = tmp_path / "pano.txt"
    p.write_text(
        textwrap.dedent(
            """\
            C:\\Users\\x\\img01.jpg
            428 571

            1 0 285
            0 1 213.5
            0 0 1

            454.417

            C:\\Users\\x\\img00.jpg
            428 571
            455.478
            """
        )
    )
    imgs, focals = read_pano_data(str(p))
    assert imgs == ["C:\\Users\\x\\img01.jpg", "C:\\Users\\x\\img00.jpg"]
    assert focals == [454.417, 455.478]


def test_parser_drops_image_without_focal(tmp_path):
    """wind/pano.txt quirk: image line w/o focal before next image dropped."""
    p = tmp_path / "pano.txt"
    p.write_text("a.jpg\n1 0 285\nb.jpg\n683.126\n")
    imgs, focals = read_pano_data(str(p))
    assert imgs == ["b.jpg"]
    assert focals == [683.126]


def test_parser_matrix_lines_skipped(tmp_path):
    p = tmp_path / "pano.txt"
    p.write_text("a.png\n0.9999 1e-9 0.01\nnotafloat\n707.0\n")
    imgs, focals = read_pano_data(str(p))
    assert imgs == ["a.png"]
    assert focals == [707.0]


@requires_reference
def test_parser_on_reference_datasets(reference_dir):
    expect = {"out": 2, "wind": 1, "parrington": 18, "grail": 18}
    for name, n in expect.items():
        imgs, focals = read_pano_data(os.path.join(reference_dir, name, "pano.txt"))
        assert len(imgs) == n, name
        assert len(focals) == n, name
    # wind keeps only wind01 (wind02 has no focal)
    imgs, focals = read_pano_data(os.path.join(reference_dir, "wind", "pano.txt"))
    assert imgs[0].lower().endswith("wind01.jpg")
    assert focals[0] == pytest.approx(683.126)


def test_resolve_windows_path_fallback(tmp_path):
    target = tmp_path / "out00.jpg"
    target.write_bytes(b"x")
    got = resolve_image_path("C:\\Users\\853uj\\out\\out00.jpg", str(tmp_path))
    assert got == os.path.join(str(tmp_path), "out00.jpg")


@requires_reference
@requires_cv2
def test_load_dataset_out(reference_dir):
    images, focals, paths = load_dataset(os.path.join(reference_dir, "out"))
    assert len(images) == 2 and all(im is not None for im in images)
    batch, valid = stack_dataset(images)
    assert batch.shape == (2, 571, 428, 3)  # out imgs are 571 high x 428 wide
    assert batch.dtype == np.uint8
    assert valid.all()


def test_pick_group_size():
    from vfx_image_stitching_tpu.io import pick_group_size

    assert pick_group_size(18) == 6
    assert pick_group_size(12) == 6
    assert pick_group_size(10) == 5
    assert pick_group_size(2) == 2
    assert pick_group_size(1) == 1
    assert pick_group_size(7) == 7    # prime: one monolithic group
    assert pick_group_size(16) == 4   # largest divisor <= 6


@requires_cv2
def test_load_dataset_device_grouped(tmp_path):
    import cv2

    from vfx_image_stitching_tpu.io import (
        load_dataset_device,
        load_dataset_device_grouped,
    )

    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        name = f"im{i}.jpg"
        cv2.imwrite(str(tmp_path / name), img)
        names.append(name)
    (tmp_path / "pano.txt").write_text(
        "".join(f"{n}\n{450.0 + i}\n" for i, n in enumerate(names))
    )

    batches, valid, focals, shape, host = load_dataset_device_grouped(
        str(tmp_path), group_target=2
    )
    assert [b.shape for b in batches] == [(2, 24, 32, 3)] * 2
    assert valid.all() and shape == (24, 32, 3)
    assert len(host) == 4 and all(h is not None for h in host)

    # small-first-group schedule: the serial head of a warm run is the
    # first group's upload, so it stays tiny; the rest tiles evenly
    batches3, *_ = load_dataset_device_grouped(
        str(tmp_path), group_target=8, first_target=3
    )
    assert [b.shape[0] for b in batches3] == [3, 1]
    batches1, *_ = load_dataset_device_grouped(
        str(tmp_path), group_target=8, first_target=0   # disabled
    )
    assert [b.shape[0] for b in batches1] == [4]

    mono = load_dataset_device(str(tmp_path))[0]
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for b in batches]), np.asarray(mono)
    )


def test_gray_group_upload_equals_single_stack(monkeypatch):
    """VFX_GRAY_GROUP_UPLOAD=1 produces identical per-group gray batches."""
    import numpy as np

    from vfx_image_stitching_tpu.io import load_dataset_device_split

    folder = "/root/reference/parrington"
    if not os.path.isdir(folder):
        import pytest

        pytest.skip("reference datasets unavailable")
    monkeypatch.setenv("VFX_GRAY_GROUP_UPLOAD", "0")  # single-stack leg
    base = load_dataset_device_split(folder, upload_rgb=False)
    monkeypatch.setenv("VFX_GRAY_GROUP_UPLOAD", "1")
    eager = load_dataset_device_split(folder, upload_rgb=False)
    assert len(base[0]) == len(eager[0])
    for a, b in zip(base[0], eager[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert list(base[2]) == list(eager[2])  # valid masks
    assert base[3] == eager[3]              # focals


@requires_reference
def test_host_project_loader_matches_device_projection():
    """host_project=True uploads are bit-equal to projecting on device."""
    from vfx_image_stitching_tpu.geometry import cylindrical_project_batch
    from vfx_image_stitching_tpu.io import load_dataset_device_split
    from tests.conftest import REFERENCE_DIR

    folder = os.path.join(REFERENCE_DIR, "out")
    plain = load_dataset_device_split(folder, host_project=False)
    proj = load_dataset_device_split(folder, host_project=True)
    focals = plain[3]
    idx = 0
    for b_plain, b_proj in zip(plain[0], proj[0]):
        g = int(b_plain.shape[0])
        expect = cylindrical_project_batch(
            b_plain, tuple(focals[idx : idx + g])
        )
        idx += g
        np.testing.assert_array_equal(np.asarray(expect), np.asarray(b_proj))
