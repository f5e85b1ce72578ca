"""Core ops vs cv2/NumPy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from vfx_image_stitching_tpu.ops import (
    bgr_to_gray_u8,
    cv2_auto_ksize,
    gaussian_kernel1d,
    gaussian_blur,
    conv2d_edge,
    reference_gradients,
    calc_orientation,
    upsample2x_linear,
    downsample2x_nearest,
)
from vfx_image_stitching_tpu.ops.gradients import HX, HY
from tests.conftest import requires_cv2


@requires_cv2
def test_bgr_to_gray_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    ours = np.asarray(bgr_to_gray_u8(jnp.asarray(img)))
    theirs = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, theirs)


@requires_cv2
@pytest.mark.parametrize("sigma", [1.2489995, 1.6, 1.2262735, 2.0, 4.5])
def test_auto_ksize_matches_cv2(sigma):
    import cv2

    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 32)).astype(np.float32)
    auto = cv2.GaussianBlur(x, (0, 0), sigmaX=sigma, sigmaY=sigma)
    manual = cv2.GaussianBlur(
        x, (cv2_auto_ksize(sigma),) * 2, sigmaX=sigma, sigmaY=sigma
    )
    np.testing.assert_array_equal(auto, manual)


@requires_cv2
@pytest.mark.parametrize(
    "ksize,sigma", [(11, 1.2489995), (21, 2.0), (9, 4.5), (15, 1.6), (0, 1.6)]
)
def test_gaussian_blur_matches_cv2(ksize, sigma):
    import cv2

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((40, 56)) * 50).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma, ksize or None))
    theirs = cv2.GaussianBlur(x, (ksize, ksize), sigmaX=sigma, sigmaY=sigma)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=2e-4)


@requires_cv2
def test_gaussian_kernel_matches_cv2():
    import cv2

    for ks, sigma in [(11, 1.2489995), (21, 2.0), (37, 4.5)]:
        ours = gaussian_kernel1d(ks, sigma)
        theirs = cv2.getGaussianKernel(ks, sigma).ravel()
        np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_gaussian_blur_batched_matches_single():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 24, 32)).astype(np.float32)
    batched = np.asarray(gaussian_blur(jnp.asarray(x), 1.6))
    singles = np.stack(
        [np.asarray(gaussian_blur(jnp.asarray(x[i]), 1.6)) for i in range(3)]
    )
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def _conv2d_oracle(img, kernel):
    """Transcription of the reference conv2d semantics (edge pad, f64)."""
    h, w = img.shape
    m, n = kernel.shape
    pad_img = np.pad(img, (m // 2, n // 2), "edge").astype(np.float64)
    result = np.zeros_like(img, dtype=np.float64)
    for i in range(m):
        for j in range(n):
            result += pad_img[i : i + h, j : j + w] * kernel[i, j]
    return result


def test_conv2d_edge_matches_oracle():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (20, 26)).astype(np.float32)
    for k in (HX, HY):
        ours = np.asarray(conv2d_edge(jnp.asarray(img), k))
        oracle = _conv2d_oracle(img, k)
        np.testing.assert_allclose(ours, oracle, atol=1e-3)


def test_gradient_sign_convention():
    """Hx computes I(x-1) - I(x+1): a rightward ramp has negative Ix."""
    img = np.tile(np.arange(8, dtype=np.float32), (8, 1))
    ix, iy = reference_gradients(jnp.asarray(img))
    assert np.asarray(ix)[4, 4] == -2.0  # I(x-1)-I(x+1) = -2 on unit ramp
    assert np.allclose(np.asarray(iy)[1:-1], 0.0)


def test_calc_orientation_range():
    rng = np.random.default_rng(5)
    ix = rng.standard_normal((10, 10)).astype(np.float32)
    iy = rng.standard_normal((10, 10)).astype(np.float32)
    m, t = calc_orientation(jnp.asarray(ix), jnp.asarray(iy))
    m, t = np.asarray(m), np.asarray(t)
    np.testing.assert_allclose(m, np.hypot(ix, iy), atol=1e-5)
    assert (t >= 0).all() and (t < 360).all()
    oracle = (np.degrees(np.arctan2(iy, ix)) + 360) % 360
    np.testing.assert_allclose(t, oracle, atol=1e-3)


@requires_cv2
def test_upsample2x_matches_cv2():
    import cv2

    rng = np.random.default_rng(6)
    x = (rng.standard_normal((15, 21)) * 60).astype(np.float32)
    ours = np.asarray(upsample2x_linear(jnp.asarray(x)))
    theirs = cv2.resize(x, (0, 0), fx=2, fy=2, interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@requires_cv2
def test_downsample2x_matches_cv2():
    import cv2

    rng = np.random.default_rng(7)
    x = rng.standard_normal((11, 14)).astype(np.float32)
    ours = np.asarray(downsample2x_nearest(jnp.asarray(x)))
    theirs = cv2.resize(x, (7, 5), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, theirs)


def test_reflect101_pad_matches_jnp_pad():
    """The concat-of-flips fast path must equal jnp.pad(mode='reflect')
    element-for-element, on both axes, including the pad >= dim
    multi-reflection fallback."""
    import numpy as np
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.ops.gaussian import _reflect101_pad

    rng = np.random.default_rng(0)
    for n_r, n_c in ((7, 9), (3, 4), (16, 5)):
        x = jnp.asarray(rng.random((n_r, n_c)).astype(np.float32))
        for axis in (0, 1):
            n = x.shape[axis]
            for pad in (1, 2, n - 1, n, n + 3):
                cfg = [(0, 0), (0, 0)]
                cfg[axis] = (pad, pad)
                want = jnp.pad(x, cfg, mode="reflect")
                got = _reflect101_pad(x, pad, axis)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"axis={axis} pad={pad} shape={x.shape}",
                )


def test_edge_pad_axis_matches_jnp_pad():
    import numpy as np
    import jax.numpy as jnp

    from vfx_image_stitching_tpu.ops.gaussian import edge_pad_axis

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((5, 7)).astype(np.float32))
    for axis in (0, 1):
        for pad in (0, 1, 3, 8):
            cfg = [(0, 0), (0, 0)]
            cfg[axis] = (pad, pad)
            want = jnp.pad(x, cfg, mode="edge")
            got = edge_pad_axis(x, pad, axis)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want),
                err_msg=f"axis={axis} pad={pad}",
            )
