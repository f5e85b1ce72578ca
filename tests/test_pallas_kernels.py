"""Pallas orientation-histogram kernel vs a NumPy oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
    orientation_histograms,
)


def _stacks(rng, h, w):
    mag = rng.random((6, h, w)).astype(np.float32) * 100
    ang = rng.random((6, h, w)).astype(np.float32) * 360
    return mag, ang


def test_orientation_histograms_vs_oracle():
    rng = np.random.default_rng(0)
    h, w = 150, 170
    half = 20
    mag = rng.random((6, h, w)).astype(np.float32) * 100
    ang = rng.random((6, h, w)).astype(np.float32) * 360
    k = 11  # odd on purpose: exercises the pad-to-8 path
    layer = rng.integers(0, 6, k)
    cy = rng.integers(-5, h + 5, k)   # includes out-of-image centers
    cx = rng.integers(-5, w + 5, k)
    radius = rng.integers(2, half + 1, k)
    wf = (-0.5 / (rng.random(k).astype(np.float32) * 4 + 1) ** 2).astype(np.float32)
    valid = rng.random(k) > 0.2

    out = np.asarray(
        orientation_histograms(
            jnp.asarray(mag), jnp.asarray(ang),
            jnp.asarray(layer), jnp.asarray(cy), jnp.asarray(cx),
            jnp.asarray(radius), jnp.asarray(wf), jnp.asarray(valid),
            half, h, w, 36,
        )
    )
    assert out.shape == (k, 36)

    for i in range(k):
        hist = np.zeros(36)
        if valid[i]:
            for dy in range(-radius[i], radius[i] + 1):
                for dx in range(-radius[i], radius[i] + 1):
                    yy, xx = cy[i] + dy, cx[i] + dx
                    if 1 <= yy <= h - 2 and 1 <= xx <= w - 2:
                        m = mag[layer[i], yy, xx]
                        a = ang[layer[i], yy, xx]
                        wgt = np.exp(np.float32(wf[i]) * np.float32(dy * dy + dx * dx))
                        b = int(np.rint(a * 36 / 360.0)) % 36
                        hist[b] += np.float32(wgt * m)
        np.testing.assert_allclose(out[i], hist, rtol=2e-5, atol=2e-3, err_msg=str(i))


def test_descriptor_variants_match():
    """Bucketed and lane-aligned descriptor paths == the plain GEMM path."""
    import jax

    from vfx_image_stitching_tpu.config import SiftCapacities, SiftConfig
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 255, (72, 96)).astype(np.float32)
    fn = jax.jit(sift_keypoints_and_descriptors, static_argnames=("cfg",))
    base_caps = dict(
        candidate_caps=(256, 128), localized_caps=(128,),
        oriented_caps=(128,), max_keypoints=256,
    )
    ref_k, ref_d, _ = fn(
        jnp.asarray(gray),
        SiftConfig(capacities=SiftCapacities(desc_bucketed=False, **base_caps)),
    )
    vref = np.asarray(ref_k.valid)
    for caps in [
        SiftCapacities(desc_bucketed=True, **base_caps),
        SiftCapacities(desc_bucketed=False, desc_lane_align=True, **base_caps),
    ]:
        k2, d2, _ = fn(jnp.asarray(gray), SiftConfig(capacities=caps))
        v2 = np.asarray(k2.valid)
        assert v2.sum() == vref.sum()
        np.testing.assert_array_equal(
            np.asarray(ref_d)[vref], np.asarray(d2)[v2]
        )


def test_descriptor_kernel_matches_xla_path():
    """Tiled Pallas descriptor kernel vs the XLA two-hot GEMM, K=8.

    (Full-pipeline parity of both kernels runs on TPU via
    scripts/verify_parity.py — interpret-mode grids over full keypoint
    capacities are too slow for the CPU suite.)
    """
    from vfx_image_stitching_tpu.config import SiftConfig
    from vfx_image_stitching_tpu.models.sift.keypoints import Keypoints
    from vfx_image_stitching_tpu.models.sift.descriptor import (
        compute_descriptors,
        compute_descriptors_pallas,
    )

    rng = np.random.default_rng(1)
    h, w = 96, 120
    mag, ang = _stacks(rng, h, w)
    k = 8
    cfg = SiftConfig()
    kps = Keypoints(
        x=jnp.asarray(rng.random(k) * w * 2, jnp.float32),
        y=jnp.asarray(rng.random(k) * h * 2, jnp.float32),
        size=jnp.asarray(rng.random(k) * 4 + 1, jnp.float32),
        angle=jnp.asarray(rng.random(k) * 360, jnp.float32),
        response=jnp.ones(k, jnp.float32),
        # packed octave for converted kps of octave 1: octv=0, layer 1..3
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


def test_pair_window_gather_bit_exact():
    """Pallas block-fetch gather == the dynamic_slice path, bit for bit."""
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        pair_window_gather,
    )
    from vfx_image_stitching_tpu.models.sift.orientation import (
        _window_gather_pair,
        combine_mag_ang,
    )

    rng = np.random.default_rng(1)
    for half, h, w in ((28, 200, 300), (44, 97, 120), (10, 64, 500)):
        mag, ang = _stacks(rng, h, w)
        k = 13
        layer = rng.integers(0, 6, k).astype(np.int32)
        cy = rng.integers(-5, h + 5, k).astype(np.int32)
        cx = rng.integers(-5, w + 5, k).astype(np.int32)
        mw, aw, sy, sx = pair_window_gather(
            jnp.asarray(mag), jnp.asarray(ang), jnp.asarray(layer),
            jnp.asarray(cy), jnp.asarray(cx), half,
        )
        ma = combine_mag_ang(jnp.asarray(mag), jnp.asarray(ang))
        mw2, aw2, rows, cols = _window_gather_pair(
            ma, jnp.asarray(layer), jnp.asarray(cy), jnp.asarray(cx), half
        )
        np.testing.assert_array_equal(np.asarray(mw), np.asarray(mw2))
        np.testing.assert_array_equal(np.asarray(aw), np.asarray(aw2))
        np.testing.assert_array_equal(np.asarray(sy), np.asarray(rows[:, 0]))
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(cols[:, 0]))


def test_descriptor_pallas_gather_variant_matches():
    """Full extract with desc_pallas_gather on/off: identical descriptors."""
    import dataclasses

    from vfx_image_stitching_tpu.config import SiftConfig, SiftCapacities
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )

    rng = np.random.default_rng(2)
    img = (rng.random((80, 96)) * 255).astype(np.float32)
    small = SiftCapacities(
        candidate_caps=(512, 256, 128, 64),
        localized_caps=(256, 128, 64, 64),
        oriented_caps=(256, 128, 64, 64),
        max_keypoints=512,
    )
    base = SiftConfig(capacities=small)
    kps_a, desc_a, _ = sift_keypoints_and_descriptors(jnp.asarray(img), base)
    cfg_b = dataclasses.replace(
        base,
        capacities=dataclasses.replace(small, desc_pallas_gather=True),
    )
    kps_b, desc_b, _ = sift_keypoints_and_descriptors(jnp.asarray(img), cfg_b)
    np.testing.assert_array_equal(np.asarray(kps_a.valid), np.asarray(kps_b.valid))
    np.testing.assert_array_equal(np.asarray(desc_a), np.asarray(desc_b))


def test_orientation_v2_matches_v1():
    """Roll-into-place orientation kernel == v1 within reduction-order ulps.

    (On chip, full-extract agreement was verified: identical keypoint
    sets on 6 real images, descriptors +-1 on 2e-6 of entries — the
    documented rint-boundary deviation class.)
    """
    from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
        orientation_histograms_v2,
    )

    rng = np.random.default_rng(3)
    h, w = 150, 170
    half = 17
    mag, ang = _stacks(rng, h, w)
    k = 21
    layer = rng.integers(0, 6, k)
    cy = rng.integers(-5, h + 5, k)
    cx = rng.integers(-5, w + 5, k)
    radius = rng.integers(2, half + 1, k)
    wf = (-0.5 / (rng.random(k).astype(np.float32) * 4 + 1) ** 2).astype(
        np.float32
    )
    valid = rng.random(k) > 0.2
    args = (
        jnp.asarray(mag), jnp.asarray(ang), jnp.asarray(layer),
        jnp.asarray(cy), jnp.asarray(cx), jnp.asarray(radius),
        jnp.asarray(wf), jnp.asarray(valid), half, h, w, 36,
    )
    a = np.asarray(orientation_histograms(*args))
    b = np.asarray(orientation_histograms_v2(*args))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-3)
