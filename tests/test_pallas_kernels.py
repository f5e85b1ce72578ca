"""Pallas orientation-histogram kernel vs a NumPy oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from vfx_image_stitching_tpu.models.sift.pallas_kernels import (
    orientation_histograms,
)


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


def test_full_pipeline_parity_pallas_vs_xla():
    """End-to-end keypoints+descriptors identical under both paths."""
    import jax

    from vfx_image_stitching_tpu.config import SiftConfig
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )

    rng = np.random.default_rng(1)
    gray = rng.integers(0, 255, (72, 96)).astype(np.float32)
    fn = jax.jit(sift_keypoints_and_descriptors, static_argnames=("cfg",))
    k1, d1, _ = fn(jnp.asarray(gray), SiftConfig(use_pallas=False))
    k2, d2, _ = fn(jnp.asarray(gray), SiftConfig(use_pallas=True))
    v1 = np.asarray(k1.valid)
    v2 = np.asarray(k2.valid)
    assert v1.sum() == v2.sum()
    for a, b in zip(k1[:-1], k2[:-1]):
        np.testing.assert_allclose(
            np.asarray(a)[v1], np.asarray(b)[v2], atol=1e-4
        )
    np.testing.assert_array_equal(np.asarray(d1)[v1], np.asarray(d2)[v2])
