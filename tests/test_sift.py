"""SIFT backend parity vs the reference implementation run as oracle.

Runs on a small crop of a real image: the reference's Python loops stay
fast and the jit compile stays bounded while every stage (pyramid,
extrema, localization, orientation, descriptors, dedup) is exercised.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftConfig
from tests.conftest import requires_reference, requires_cv2, REFERENCE_DIR


@pytest.fixture(scope="module")
def ref_sift():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    from tests.conftest import load_reference_module

    return load_reference_module("sift_impl")


@pytest.fixture(scope="module")
def crop_gray():
    import cv2

    img = cv2.imread(os.path.join(REFERENCE_DIR, "out", "out00.jpg"))
    crop = np.ascontiguousarray(img[150:278, 100:268])
    return cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY).astype("float32")


@pytest.fixture(scope="module")
def ours(crop_gray):
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )

    kps, desc, stats = jax.jit(
        sift_keypoints_and_descriptors, static_argnames=("cfg",)
    )(jnp.asarray(crop_gray), SiftConfig())
    return jax.device_get(kps), np.asarray(desc), jax.device_get(stats)


@pytest.fixture(scope="module")
def theirs(ref_sift, crop_gray):
    return ref_sift.compute_keypoints_and_descriptors(crop_gray.copy())


@requires_reference
@requires_cv2
def test_pyramid_matches_reference(ref_sift, crop_gray):
    from vfx_image_stitching_tpu.models.sift import (
        generate_base_image,
        compute_number_of_octaves,
        generate_gaussian_kernels,
        generate_gaussian_images,
        generate_dog_images,
    )

    base_r = ref_sift.generate_base_image(crop_gray, 1.6, 0.5)
    base_o = np.asarray(generate_base_image(jnp.asarray(crop_gray)))
    assert np.abs(base_o - base_r).max() < 1e-3

    n = compute_number_of_octaves(base_o.shape)
    assert n == ref_sift.compute_number_of_octaves(base_r.shape)

    kern_o = generate_gaussian_kernels(1.6, 3)
    kern_r = ref_sift.generate_gaussian_kernels(1.6, 3)
    np.testing.assert_allclose(kern_o, kern_r, atol=1e-12)

    pyr_r = ref_sift.generate_gaussian_images(base_r, n, kern_r)
    pyr_o = generate_gaussian_images(jnp.asarray(base_o), n, kern_o)
    for o in range(n):
        for lvl in range(6):
            assert (
                np.abs(np.asarray(pyr_o[o][lvl]) - pyr_r[o][lvl]).max() < 1e-3
            ), (o, lvl)

    dog_r = ref_sift.generate_DoG_images(pyr_r)
    dog_o = generate_dog_images(pyr_o)
    assert np.abs(np.asarray(dog_o[0][0]) - dog_r[0][0]).max() < 2e-3


@requires_reference
@requires_cv2
def test_keypoints_match_reference(ours, theirs):
    kps_o, _desc, stats = ours
    kps_ref, _ = theirs
    v = np.nonzero(np.asarray(kps_o.valid))[0]
    ref_arr = np.array(
        [[kp.pt[0], kp.pt[1], kp.size, kp.angle] for kp in kps_ref]
    )
    matched = 0
    for i in v:
        o = np.array(
            [float(kps_o.x[i]), float(kps_o.y[i]), float(kps_o.size[i]),
             float(kps_o.angle[i])]
        )
        if np.abs(ref_arr - o[None]).sum(1).min() < 0.1:
            matched += 1
    # tolerate a tiny fringe of borderline extrema flipping on f32 noise
    assert matched >= 0.95 * len(kps_ref)
    assert abs(len(v) - len(kps_ref)) <= max(2, len(kps_ref) // 20)


@requires_reference
@requires_cv2
def test_descriptors_match_reference(ours, theirs):
    kps_o, desc_o, _ = ours
    kps_ref, desc_ref = theirs
    v = np.nonzero(np.asarray(kps_o.valid))[0]
    ref_arr = np.array([[kp.pt[0], kp.pt[1], kp.size, kp.angle] for kp in kps_ref])
    matched, errs = 0, []
    for i in v:
        o = np.array(
            [float(kps_o.x[i]), float(kps_o.y[i]), float(kps_o.size[i]),
             float(kps_o.angle[i])]
        )
        d = np.abs(ref_arr - o[None]).sum(1)
        j = int(np.argmin(d))
        if d[j] < 0.1:
            matched += 1
            errs.append(np.abs(desc_o[i] - desc_ref[j]).max())
    assert matched >= 0.95 * len(kps_ref)
    errs = np.array(errs)
    # descriptors are 0..255-scaled integers; rint-level noise only
    assert np.median(errs) <= 1.0
    assert (errs <= 2.0).mean() > 0.97


@requires_reference
@requires_cv2
def test_no_capacity_overflow(ours):
    _, _, stats = ours
    assert (np.asarray(stats["cand_counts"]) < np.asarray(stats["cand_caps"])).all()
    assert (np.asarray(stats["loc_counts"]) < np.asarray(stats["loc_caps"])).all()
    assert (
        np.asarray(stats["oriented_counts"]) < np.asarray(stats["oriented_caps"])
    ).all()
    assert int(stats["final_count"]) < int(stats["final_cap"])


@requires_reference
@requires_cv2
def test_reference_signature_wrapper(crop_gray):
    from vfx_image_stitching_tpu.models.sift import (
        compute_keypoints_and_descriptors,
    )

    records, desc = compute_keypoints_and_descriptors(crop_gray)
    assert len(records) == desc.shape[0] > 0
    assert desc.shape[1] == 128
    r = records[0]
    assert hasattr(r, "pt") and hasattr(r, "octave") and r.class_id == -1


def test_unpack_octave_roundtrip():
    from vfx_image_stitching_tpu.models.sift import unpack_octave

    # packed = octave + layer<<8 + offset_byte<<16, octave sign-extended
    packed = jnp.asarray([0 + (2 << 8) + (128 << 16), 255 + (1 << 8)], jnp.int32)
    octv, layer, scale = unpack_octave(packed)
    assert int(octv[0]) == 0 and int(layer[0]) == 2
    assert float(scale[0]) == 1.0
    assert int(octv[1]) == -1 and int(layer[1]) == 1
    assert float(scale[1]) == 2.0


@requires_reference
def test_localize_split_matches_plain(crop_gray):
    """Split-mover localization must equal the plain path on every
    valid row: mask + integer fields + positions bit-exact; ``size``
    may drift by <= 4 ulp because the two jit graphs compile ``exp2``
    with different fusion (measured max 2 ulp; all other floats are
    bit-equal).  End-to-end keypoints/descriptors are compared under
    the same contract."""
    import dataclasses

    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )
    from vfx_image_stitching_tpu.models.sift.pyramid import (
        generate_base_image, compute_number_of_octaves,
        generate_gaussian_kernels, generate_gaussian_images,
        generate_dog_images,
    )
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked, localize_candidates_split_chunked,
    )

    cfg = SiftConfig()
    gray = jnp.asarray(crop_gray)
    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(base, num_octaves, kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        cap = min(cfg.capacities.scaled_candidates(o), 3 * h_o * w_o)
        layer, y, x, cv = extract_candidates(
            dog, cfg.image_border_width, thresh, cap
        )
        plain = localize_candidates_chunked(dog, layer, y, x, cv, o, cfg)
        split = localize_candidates_split_chunked(
            dog, layer, y, x, cv, o, cfg
        )
        vp = np.asarray(plain.valid)
        vs = np.asarray(split.valid)
        np.testing.assert_array_equal(vp, vs)
        for name in plain._fields:
            a = np.asarray(getattr(plain, name))[vp]
            b = np.asarray(getattr(split, name))[vp]
            if name == "size":
                ulp = np.abs(
                    a.view(np.int32).astype(np.int64)
                    - b.view(np.int32).astype(np.int64)
                )
                assert ulp.max(initial=0) <= 4, f"octave {o} size ulp {ulp.max()}"
            else:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"octave {o} {name}"
                )

    # End-to-end: the split path's final keypoints must match the plain
    # path's under the PARITY.md deviation-1 tolerance — positions and
    # integer fields exact, float fields within a few ulp, descriptors
    # within +-1 on a vanishing fraction of entries (the exp2 graph
    # noise in `size` can flip a bin value sitting exactly on the
    # 0.5/512 rounding boundary; measured: 1 of 10240 entries).
    cfg_split = dataclasses.replace(cfg, localize_split=True)
    run = jax.jit(sift_keypoints_and_descriptors, static_argnames=("cfg",))
    kp_a, d_a, _ = run(gray, cfg)
    kp_b, d_b, _ = run(gray, cfg_split)
    va, vb = np.asarray(kp_a.valid), np.asarray(kp_b.valid)
    np.testing.assert_array_equal(va, vb)
    d_a_, d_b_ = np.asarray(d_a)[va], np.asarray(d_b)[va]
    diff = d_a_ != d_b_
    assert np.abs(d_a_ - d_b_).max(initial=0) <= 1
    assert diff.mean() <= 1e-3, f"desc diff fraction {diff.mean()}"
    for name in ("x", "y", "octave"):
        np.testing.assert_array_equal(
            np.asarray(getattr(kp_a, name))[va],
            np.asarray(getattr(kp_b, name))[va], err_msg=name,
        )
    for name in ("size", "angle", "response"):
        a = np.asarray(getattr(kp_a, name))[va]
        b = np.asarray(getattr(kp_b, name))[va]
        ulp = np.abs(a.view(np.int32).astype(np.int64)
                     - b.view(np.int32).astype(np.int64))
        assert ulp.max(initial=0) <= 4, f"{name} ulp {ulp.max()}"


def test_localize_slim_matches_plain(crop_gray):
    """Slim-state early-exit localization must equal the plain path on
    every valid row (same contract as the split-mover test: mask +
    integer fields + positions bit-exact; ``response`` within 4 ulp:
    its ``val`` dot product FMA-contracts differently in the two
    executables — measured 1 ulp on 2/57 rows).  The slim loop stores
    the Newton update and re-derives only the gradient/Hessian/center
    lanes by regathering the cube at the recorded last-compute cell —
    bit-stable arithmetic — so any larger divergence is a recorded-cell
    bug, not float noise."""
    from vfx_image_stitching_tpu.models.sift.pyramid import (
        generate_base_image, compute_number_of_octaves,
        generate_gaussian_kernels, generate_gaussian_images,
        generate_dog_images,
    )
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked, localize_candidates_chunked_slim,
    )

    cfg = SiftConfig()
    gray = jnp.asarray(crop_gray)
    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(base, num_octaves, kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    checked_rows = 0
    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        cap = min(cfg.capacities.scaled_candidates(o), 3 * h_o * w_o)
        layer, y, x, cv = extract_candidates(
            dog, cfg.image_border_width, thresh, cap
        )
        plain = localize_candidates_chunked(dog, layer, y, x, cv, o, cfg)
        slim = localize_candidates_chunked_slim(dog, layer, y, x, cv, o, cfg)
        vp = np.asarray(plain.valid)
        np.testing.assert_array_equal(vp, np.asarray(slim.valid))
        checked_rows += int(vp.sum())
        for name in plain._fields:
            a = np.asarray(getattr(plain, name))[vp]
            b = np.asarray(getattr(slim, name))[vp]
            if name in ("size", "response"):
                ulp = np.abs(
                    a.view(np.int32).astype(np.int64)
                    - b.view(np.int32).astype(np.int64)
                )
                assert ulp.max(initial=0) <= 4, (
                    f"octave {o} {name} ulp {ulp.max()}"
                )
            else:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"octave {o} {name}"
                )
    assert checked_rows > 0


def test_localize_resident_matches_plain(crop_gray):
    """VMEM-resident scalar-Newton localization vs the plain path.

    Contract (same as the slim test): every field bit-identical on
    valid rows except ``response`` within 4 ulp — its ``val`` dot
    product FMA-contracts differently in the two executables (measured
    1 ulp on 2/57 rows, the same rows as slim).  The kernel's
    scalar-core solve wobbles <=1 ulp on ux/uy/us (enough to flip a
    knife-edge rint downstream — docs/RESIDENT_E2E_r04.json first
    attempt), so the wrapper consumes only the kernel's integer
    convergence state and re-derives all float lanes in XLA at the
    last-compute cell; those recomputed lanes (and pt_x/pt_y/size/
    octave_packed built from them) must be bit-exact — any divergence
    there is a recorded-cell or recompute bug, not float noise.  On CPU
    the kernel runs in interpret mode; same contract.  End-to-end byte
    parity on all four datasets is gated separately by
    scripts/verify_resident_e2e.py on chip.
    """
    from vfx_image_stitching_tpu.models.sift.pyramid import (
        generate_base_image, compute_number_of_octaves,
        generate_gaussian_kernels, generate_gaussian_images,
        generate_dog_images,
    )
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked, localize_candidates_resident,
    )

    cfg = SiftConfig()
    gray = jnp.asarray(crop_gray)
    base = generate_base_image(gray, cfg.sigma, cfg.assumed_blur)
    num_octaves = compute_number_of_octaves(base.shape)
    kernels = generate_gaussian_kernels(cfg.sigma, cfg.num_intervals)
    pyramid = generate_gaussian_images(base, num_octaves, kernels)
    dogs = generate_dog_images(pyramid)
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)

    checked_rows = 0
    for o in range(num_octaves):
        dog = dogs[o]
        h_o, w_o = dog.shape[-2:]
        cap = min(cfg.capacities.scaled_candidates(o), 3 * h_o * w_o)
        layer, y, x, cv = extract_candidates(
            dog, cfg.image_border_width, thresh, cap
        )
        plain = localize_candidates_chunked(dog, layer, y, x, cv, o, cfg)
        res = localize_candidates_resident(dog, layer, y, x, cv, o, cfg)
        vp = np.asarray(plain.valid)
        np.testing.assert_array_equal(vp, np.asarray(res.valid))
        checked_rows += int(vp.sum())
        for name in plain._fields:
            a = np.asarray(getattr(plain, name))[vp]
            b = np.asarray(getattr(res, name))[vp]
            if name == "response":
                ulp = np.abs(
                    a.view(np.int32).astype(np.int64)
                    - b.view(np.int32).astype(np.int64)
                )
                assert ulp.max(initial=0) <= 4, (
                    f"octave {o} {name} ulp {ulp.max()}"
                )
            else:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"octave {o} {name}"
                )
    assert checked_rows > 0


def test_localize_resident_height_not_multiple_of_8():
    """Resident kernel on an octave whose height is NOT a multiple of 8.

    All four reference datasets produce octave heights that are 8-
    multiples, so the ``ya = min(..., h-16)`` clamp in the kernel always
    landed 8-aligned — advisor r4 flagged that a height like 20 clamps
    to 4, violating the ``pl.multiple_of(ya, 8)`` promise (a potential
    Mosaic miscompile).  The wrapper now pads H to the next 8-multiple;
    this pins index-math parity at such a shape (h=21, hp=24) against
    the plain path, including candidates whose Newton walk reaches the
    bottom rows where the clamp bites.
    """
    from vfx_image_stitching_tpu.models.sift.extrema import (
        extrema_threshold, extract_candidates,
    )
    from vfx_image_stitching_tpu.models.sift.localize import (
        localize_candidates_chunked, localize_candidates_resident,
    )

    cfg = SiftConfig()
    rng = np.random.default_rng(2)
    # (5, 21, 131): h % 8 = 5, w % 128 = 3 — both pads exercised
    dog = jnp.asarray(
        rng.integers(-80, 80, (5, 21, 131)).astype(np.float32)
    )
    thresh = extrema_threshold(cfg.contrast_threshold, cfg.num_intervals)
    layer, y, x, cv = extract_candidates(
        dog, cfg.image_border_width, thresh, 256
    )
    assert int(np.asarray(cv).sum()) > 0, "need live candidates"
    plain = localize_candidates_chunked(dog, layer, y, x, cv, 0, cfg)
    res = localize_candidates_resident(dog, layer, y, x, cv, 0, cfg)
    vp = np.asarray(plain.valid)
    np.testing.assert_array_equal(vp, np.asarray(res.valid))
    for name in plain._fields:
        a = np.asarray(getattr(plain, name))[vp]
        b = np.asarray(getattr(res, name))[vp]
        if name == "response":
            ulp = np.abs(a.view(np.int32).astype(np.int64)
                         - b.view(np.int32).astype(np.int64))
            assert ulp.max(initial=0) <= 4
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
