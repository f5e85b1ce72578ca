"""Two-level t-th-set-bit selection == the flat searchsorted path."""

import numpy as np
import jax.numpy as jnp

from vfx_image_stitching_tpu.models.sift.extrema import (
    _select_nth_set_bits_flat,
    _select_nth_set_bits_twolevel,
)


def test_twolevel_selection_identical():
    rng = np.random.default_rng(0)
    cases = [
        (1000, 0.5), (2**17, 0.001), (2**17 + 37, 0.01),
        (300, 0.0), (257, 1.0), (128 * 7, 0.02), (64, 0.3),
    ]
    for n, p in cases:
        mask = jnp.asarray(rng.random(n) < p)
        for cap in (16, 500, n):
            t = jnp.arange(1, cap + 1, dtype=jnp.int32)
            s1, v1 = _select_nth_set_bits_flat(mask, t)
            s2, v2 = _select_nth_set_bits_twolevel(mask, t)
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_twolevel_block_boundary_runs():
    """Set bits straddling block boundaries in runs are selected in order."""
    n = 128 * 5 + 17
    mask = np.zeros(n, bool)
    mask[120:140] = True          # straddles the first block boundary
    mask[255:258] = True          # straddles 2nd
    mask[-1] = True
    m = jnp.asarray(mask)
    t = jnp.arange(1, 33, dtype=jnp.int32)
    s1, v1 = _select_nth_set_bits_flat(m, t)
    s2, v2 = _select_nth_set_bits_twolevel(m, t)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert np.asarray(s1)[np.asarray(v1)].tolist() == np.nonzero(mask)[0][:int(np.asarray(v1).sum())].tolist()


def test_separable_window_matches_reduce_window(monkeypatch):
    """_sep3 shifted-elementwise == lax.reduce_window (3,3,3) VALID."""
    from vfx_image_stitching_tpu.models.sift import extrema as EX

    rng = np.random.default_rng(1)
    for shape in [(5, 64, 80), (5, 33, 47), (5, 7, 9)]:
        dog = jnp.asarray(rng.normal(0, 50, shape), jnp.float32)
        res = {}
        for knob in ("0", "1"):
            monkeypatch.setenv("VFX_EXTREMA_SEP", knob)
            res[knob] = np.asarray(EX.extrema_mask(dog, 5, 2.0))
        np.testing.assert_array_equal(res["0"], res["1"])
    # tie-heavy integer values: equal neighbors exercise the non-strict
    # comparisons both ways
    dog = jnp.asarray(rng.integers(-3, 4, (5, 40, 40)), jnp.float32)
    res = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("VFX_EXTREMA_SEP", knob)
        res[knob] = np.asarray(EX.extrema_mask(dog, 2, 0.5))
    np.testing.assert_array_equal(res["0"], res["1"])
