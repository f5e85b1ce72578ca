"""Compositing planner + device blend vs the sequential oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from vfx_image_stitching_tpu.compose import (
    plan_compose,
    compose_mosaic,
    rectangle_crop,
)
from tests import oracles


def _rand_images(rng, n, h, w):
    """Random images with guaranteed nonzero content (occupancy = nonzero)."""
    return rng.integers(10, 256, (n, h, w, 3), dtype=np.uint8)


def _run_both(images, shifts, pairs, valid=None):
    n, h, w = images.shape[:3]
    valid = valid if valid is not None else [True] * n
    cyl_list = [images[i] if valid[i] else None for i in range(n)]
    oracle = oracles.compose_sequence(cyl_list, shifts, pairs)
    plan = plan_compose(h, w, n, valid, shifts, pairs)
    ours = np.asarray(compose_mosaic(jnp.asarray(images), plan))
    return oracle, ours


def _assert_blend_parity(ours, oracle, max_abs=1, max_frac=0.03):
    """Blend parity up to f32-vs-f64 alpha rounding.

    The reference blends with float64 alpha before the uint8 truncation
    (NumPy upcasts Python-float alpha); the device blends in f32.  Where
    the f64 result lands within an ulp of an integer, the floor can flip
    by one — geometry must still be identical and flips rare.
    """
    assert oracle.shape == ours.shape
    d = ours.astype(np.int32) - oracle.astype(np.int32)
    assert np.abs(d).max() <= max_abs
    frac = np.count_nonzero(d.any(-1)) / d[..., 0].size
    assert frac <= max_frac


@pytest.mark.parametrize("seed", range(4))
def test_two_image_blend_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    h, w = 40, 56
    images = _rand_images(rng, 2, h, w)
    dx = int(rng.integers(8, 30)) * (1 if seed % 2 == 0 else -1)
    dy = float(rng.integers(-6, 7)) + 0.3  # float dy exercises rounding
    xa, ya = int(rng.integers(10, w - 10)), int(rng.integers(5, h - 5))
    pair = ((xa, ya), (xa - dx, ya - int(dy)))
    oracle, ours = _run_both(images, [(dx, dy)], [pair])
    _assert_blend_parity(ours, oracle)


def test_two_image_blend_exact_with_dyadic_overlap():
    """overlap_range = 64 makes every alpha dyadic -> f32 blend is exact."""
    rng = np.random.default_rng(11)
    h, w = 32, 56
    images = _rand_images(rng, 2, h, w)
    xa, xb = 10, 18          # xb - xa + w = 64
    pair = ((xa, 9), (xb, 9))
    oracle, ours = _run_both(images, [(20, 2.0)], [pair])
    np.testing.assert_array_equal(ours, oracle)


def test_multi_step_chain_matches_oracle():
    rng = np.random.default_rng(42)
    h, w = 36, 48
    n = 5
    images = _rand_images(rng, n, h, w)
    shifts, pairs = [], []
    for i in range(n - 1):
        dx = -int(rng.integers(12, 24))  # leftward chain like parrington
        dy = float(rng.integers(-3, 4)) - 0.37
        xa = int(rng.integers(5, 20))
        xb = xa - dx
        pairs.append(((xa, 7.0), (xb, 9.0)))
        shifts.append((dx, dy))
    oracle, ours = _run_both(images, shifts, pairs)
    _assert_blend_parity(ours, oracle, max_abs=2, max_frac=0.06)


def test_chain_with_unreadable_image_skipped():
    rng = np.random.default_rng(7)
    h, w = 30, 40
    n = 4
    images = _rand_images(rng, n, h, w)
    valid = [True, True, False, True]
    shifts = [(15, 1.0), (0.0, 0.0), (18, -2.0)]
    pairs = [((20, 5), (5, 4)), ((0.0, 0.0), (0.0, 0.0)), ((25, 8), (7, 10))]
    oracle, ours = _run_both(images, shifts, pairs, valid)
    _assert_blend_parity(ours, oracle, max_abs=2, max_frac=0.06)


def test_step_capture_matches_oracle_steps():
    rng = np.random.default_rng(3)
    h, w = 24, 32
    n = 3
    images = _rand_images(rng, n, h, w)
    shifts = [(12, 0.6), (14, -1.2)]
    pairs = [((10, 5), (-2, 4)), ((11, 6), (-3, 8))]
    plan = plan_compose(h, w, n, [True] * n, shifts, pairs)
    _, steps = compose_mosaic(jnp.asarray(images), plan, return_steps=True)

    mosaic = images[0].copy()
    for i in range(1, n):
        img = images[i]
        diff_y = mosaic.shape[0] - img.shape[0]
        if diff_y:
            img = oracles.pad_image(img, 0, diff_y)
        mosaic = oracles.blend_two_images(shifts[i - 1], pairs[i - 1], mosaic, img)
        _assert_blend_parity(steps[i - 1], mosaic, max_abs=2, max_frac=0.06)


def test_zero_overlap_range_alpha_zero():
    rng = np.random.default_rng(5)
    images = _rand_images(rng, 2, 20, 30)
    # pair engineered so overlap_range == 0: xb - xa + w == 0
    pair = ((30.0, 5.0), (0.0, 5.0))
    shifts = [(5, 0.0)]
    oracle, ours = _run_both(images, shifts, [pair])
    _assert_blend_parity(ours, oracle)


def _gray_fixed15(img):
    b, g, r = (img[..., i].astype(np.int64) for i in range(3))
    return ((b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15).astype(np.uint8)


@pytest.mark.parametrize("margin", [0, 3, 15])
def test_rectangle_crop_matches_oracle(margin):
    rng = np.random.default_rng(margin)
    img = np.zeros((50, 70, 3), np.uint8)
    img[8:44, 5:61] = rng.integers(1, 256, (36, 56, 3), dtype=np.uint8)
    ours = rectangle_crop(img, 0, margin)
    oracle = oracles.rectangle_crop(img, 0, margin, _gray_fixed15)
    np.testing.assert_array_equal(ours, oracle)


def test_rectangle_crop_all_black_returns_input():
    img = np.zeros((20, 20, 3), np.uint8)
    np.testing.assert_array_equal(rectangle_crop(img, 0, 5), img)


def test_rectangle_crop_degenerate_margin_returns_input():
    img = np.zeros((20, 20, 3), np.uint8)
    img[9:11, 9:11] = 200
    np.testing.assert_array_equal(rectangle_crop(img, 0, 15), img)


@pytest.mark.parametrize("n_strips", [1, 3, 4, 7])
def test_mosaic_strips_pull_matches_single_buffer(n_strips):
    """Strip-split pull == the single-buffer pull, byte for byte."""
    from vfx_image_stitching_tpu.compose.crop import (
        mosaic_with_bounds,
        mosaic_with_bounds_strips,
        pull_strips,
        unpack_mosaic_bounds,
    )

    rng = np.random.default_rng(n_strips)
    img = np.zeros((37, 21, 3), np.uint8)
    img[5:30, 2:18] = rng.integers(1, 256, (25, 16, 3), dtype=np.uint8)
    one = np.asarray(mosaic_with_bounds(jnp.asarray(img), jnp.uint8(0)))
    buf = pull_strips(
        mosaic_with_bounds_strips(jnp.asarray(img), jnp.uint8(0), n_strips)
    )
    np.testing.assert_array_equal(buf, one)
    mosaic, bounds = unpack_mosaic_bounds(buf)
    np.testing.assert_array_equal(mosaic, img)
    assert bounds == (5, 29, 2, 17, True)
