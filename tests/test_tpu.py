"""Real-chip tests: compiled Mosaic Pallas kernels + one on-chip stitch.

Run: ``VFX_TEST_TPU=1 python -m pytest tests -m tpu -q``

The CPU suite exercises the Pallas kernels only in interpret mode
(pallas_kernels.py forces ``interpret=True`` off-TPU), so these are the
tests that pin the actual Mosaic lowering.  Shapes are kept small: the
dev harness reaches the chip through a slow tunnel and remote compiles
are minutes, so everything rides one process + the persistent cache.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

REFERENCE_DIR = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")


def test_orientation_kernel_compiled_vs_oracle():
    """Mosaic-compiled orientation histograms == the NumPy oracle."""
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        orientation_histograms,
    )

    rng = np.random.default_rng(0)
    h, w, half, k = 150, 170, 20, 11
    mag = rng.random((6, h, w)).astype(np.float32) * 100
    ang = rng.random((6, h, w)).astype(np.float32) * 360
    layer = rng.integers(0, 6, k)
    cy = rng.integers(-5, h + 5, k)
    cx = rng.integers(-5, w + 5, k)
    radius = rng.integers(2, half + 1, k)
    wf = (-0.5 / (rng.random(k).astype(np.float32) * 4 + 1) ** 2).astype(
        np.float32
    )
    valid = rng.random(k) > 0.2

    out = np.asarray(
        orientation_histograms(
            jnp.asarray(mag), jnp.asarray(ang),
            jnp.asarray(layer), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(radius), jnp.asarray(wf), jnp.asarray(valid),
            half, h, w, 36,
        )
    )
    for i in range(k):
        hist = np.zeros(36)
        if valid[i]:
            for dy in range(-radius[i], radius[i] + 1):
                for dx in range(-radius[i], radius[i] + 1):
                    yy, xx = cy[i] + dy, cx[i] + dx
                    if 1 <= yy <= h - 2 and 1 <= xx <= w - 2:
                        m = mag[layer[i], yy, xx]
                        a = ang[layer[i], yy, xx]
                        wgt = np.exp(
                            np.float32(wf[i]) * np.float32(dy * dy + dx * dx)
                        )
                        b = int(np.rint(a * 36 / 360.0)) % 36
                        hist[b] += np.float32(wgt * m)
        np.testing.assert_allclose(
            out[i], hist, rtol=2e-5, atol=2e-3, err_msg=str(i)
        )


def test_descriptor_kernel_compiled_vs_xla():
    """Mosaic-compiled tiled descriptor kernel vs the XLA two-hot GEMM."""
    from vfx_image_stitching_tpu.config import SiftConfig
    from vfx_image_stitching_tpu.models.sift.descriptor import (
        compute_descriptors,
        compute_descriptors_pallas,
    )
    from vfx_image_stitching_tpu.models.sift.keypoints import Keypoints

    rng = np.random.default_rng(1)
    h, w, k = 96, 120, 8
    mag = rng.random((6, h, w)).astype(np.float32) * 100
    ang = rng.random((6, h, w)).astype(np.float32) * 360
    cfg = SiftConfig()
    kps = Keypoints(
        x=jnp.asarray(rng.random(k) * w * 2, jnp.float32),
        y=jnp.asarray(rng.random(k) * h * 2, jnp.float32),
        size=jnp.asarray(rng.random(k) * 4 + 1, jnp.float32),
        angle=jnp.asarray(rng.random(k) * 360, jnp.float32),
        response=jnp.ones(k, jnp.float32),
        octave=jnp.asarray(
            0 + (rng.integers(1, 4, k) << 8) + (128 << 16), jnp.int32
        ),
        valid=jnp.asarray([True] * 6 + [False] * 2),
        ix=jnp.zeros(k, jnp.int32),
        iy=jnp.zeros(k, jnp.int32),
        jx=jnp.zeros(k, jnp.int32),
        jy=jnp.zeros(k, jnp.int32),
        jl=jnp.zeros(k, jnp.int32),
    )
    a = np.asarray(
        compute_descriptors(jnp.asarray(mag), jnp.asarray(ang), kps, 1, cfg)
    )
    b = np.asarray(
        compute_descriptors_pallas(
            jnp.asarray(mag), jnp.asarray(ang), kps, 1, cfg
        )
    )
    v = np.asarray(kps.valid)
    assert np.abs(a[v] - b[v]).max() <= 1.0  # rint boundary only
    assert (a[v] != b[v]).mean() < 0.02


def test_harris_extractor_on_chip():
    """Harris keypoints+descriptors computed on the chip == CPU-path values
    (the corner set is integer-exact; descriptors to f32 tolerance)."""
    import cv2

    from vfx_image_stitching_tpu.models.harris import (
        harris_keypoints_and_descriptors,
    )

    img = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out00.jpg"))
    img = img[:128, :160].copy()
    xy, d, v = map(np.asarray, harris_keypoints_and_descriptors(jnp.asarray(img)))
    assert v.any()
    assert np.isfinite(d[v]).all()
    # device placement sanity: the computation really ran on the TPU
    assert jax.default_backend() == "tpu"


def test_small_end_to_end_stitch_on_chip():
    """2-image out stitch (cropped) end-to-end on the chip, vs shapes."""
    import cv2

    import __graft_entry__ as ge
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    src = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out00.jpg"))
    src2 = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out01.jpg"))
    tmp = "/tmp/vfx_tpu_test_ds"
    os.makedirs(tmp, exist_ok=True)
    cv2.imwrite(os.path.join(tmp, "a.jpg"), src[:120, 40:180])
    cv2.imwrite(os.path.join(tmp, "b.jpg"), src2[:120, 40:180])
    with open(os.path.join(tmp, "pano.txt"), "w") as f:
        f.write("a.jpg\n455.0\nb.jpg\n455.5\n")

    res = stitch_panorama(
        tmp, backend="sift", crop_margin=2, save_path=None,
        cfg=ge._small_sift_config(),
    )
    # the CPU suite produces (116, 138, 3) for this dataset/config; allow
    # a couple of pixels for borderline shift/crop differences on-chip
    assert res.panorama.ndim == 3 and res.panorama.shape[2] == 3
    assert abs(res.panorama.shape[0] - 116) <= 4
    assert abs(res.panorama.shape[1] - 138) <= 4
