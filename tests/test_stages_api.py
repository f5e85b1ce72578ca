"""Per-stage reference-API surface (sift_impl public function parity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.config import SiftCapacities, SiftConfig

CAPS = SiftCapacities(
    candidate_caps=(256, 128),
    localized_caps=(128,),
    oriented_caps=(128,),
    max_keypoints=256,
)
CFG = SiftConfig(capacities=CAPS)


@pytest.fixture(scope="module")
def chain():
    """One jitted pass through the 14-function stage surface."""
    from vfx_image_stitching_tpu.models.sift import (
        generate_base_image,
        compute_number_of_octaves,
        generate_gaussian_kernels,
        generate_gaussian_images,
        generate_DoG_images,
        find_scale_space_extrema,
        generate_descriptors,
        convert_keypoints_to_input_image_size,
        remove_duplicate_keypoints,
    )

    rng = np.random.default_rng(1)
    gray = rng.integers(0, 255, (64, 80)).astype(np.float32)

    @jax.jit
    def run(g):
        base = generate_base_image(g, CFG.sigma, CFG.assumed_blur)
        n_oct = compute_number_of_octaves(base.shape)
        kern = generate_gaussian_kernels(CFG.sigma, CFG.num_intervals)
        pyr = generate_gaussian_images(base, n_oct, kern)
        dogs = generate_DoG_images(pyr)
        kps = find_scale_space_extrema(pyr, dogs, cfg=CFG)
        raw_count = jnp.sum(kps.valid)
        kps = convert_keypoints_to_input_image_size(kps)
        desc = generate_descriptors(kps, pyr, cfg=CFG)
        kps_d, desc_d = remove_duplicate_keypoints(kps, desc)
        return pyr[0], dogs[0], raw_count, kps_d, desc_d

    pyr0, dog0, raw_count, kps_d, desc_d = run(jnp.asarray(gray))
    return dict(
        gray=gray, pyr0=np.asarray(pyr0), dog0=np.asarray(dog0),
        raw_count=int(raw_count), kps=jax.device_get(kps_d),
        desc=np.asarray(desc_d),
    )


def test_stage_chain_smoke(chain):
    from vfx_image_stitching_tpu.models.sift import unpack_octave

    assert chain["pyr0"].shape[0] == 6
    assert chain["dog0"].shape[0] == 5
    kps = chain["kps"]
    v = np.asarray(kps.valid)
    assert 0 < v.sum() <= chain["raw_count"]
    assert chain["desc"].shape == (kps.x.shape[0], 128)

    octv, layer, _scale = map(np.asarray, unpack_octave(jnp.asarray(kps.octave)))
    assert ((layer[v] >= 1) & (layer[v] <= 3)).all()
    assert (octv[v] >= -1).all()


def test_stage_chain_matches_monolithic(chain):
    """The stage chain reproduces the one-shot extractor's keypoint set."""
    from vfx_image_stitching_tpu.models.sift.extract import (
        sift_keypoints_and_descriptors,
    )

    kps_m, _desc_m, _ = jax.jit(
        sift_keypoints_and_descriptors, static_argnames=("cfg",)
    )(jnp.asarray(chain["gray"]), CFG)
    kps_s = chain["kps"]
    vs = np.asarray(kps_s.valid)
    vm = np.asarray(kps_m.valid)
    assert vs.sum() == vm.sum()

    def keyset(kp, v):
        return {
            (round(float(x), 3), round(float(y), 3), round(float(a), 2))
            for x, y, a in zip(
                np.asarray(kp.x)[v], np.asarray(kp.y)[v], np.asarray(kp.angle)[v]
            )
        }

    assert keyset(kps_s, vs) == keyset(kps_m, vm)


@pytest.fixture(scope="module")
def ref_sift(reference_dir):
    from tests.conftest import load_reference_module

    return load_reference_module("sift_impl")


@pytest.fixture(scope="module")
def ref_octave(ref_sift, reference_dir):
    """A small real crop run through the reference pyramid + extrema scan."""
    import cv2
    import os

    img = cv2.imread(os.path.join(reference_dir, "parrington", "prtn00.jpg"))
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[140:204, 200:280]
    base = ref_sift.generate_base_image(gray.astype("float32"), 1.6, 0.5)
    kernels = ref_sift.generate_gaussian_kernels(1.6, 3)
    gauss = ref_sift.generate_gaussian_images(base, 3, kernels)
    dogs = ref_sift.generate_DoG_images(gauss)
    # collect a handful of raw extrema candidates in octave 0 via the
    # reference's own 26-neighbor test (sift_impl.py:143-163)
    oct0 = dogs[0]
    cands = []
    thresh = np.floor(0.5 * 0.04 / 3 * 255)
    for layer in range(1, 4):
        prev_l, curr, nxt = oct0[layer - 1], oct0[layer], oct0[layer + 1]
        for y in range(5, curr.shape[0] - 5):
            for x in range(5, curr.shape[1] - 5):
                if ref_sift.is_pixel_an_extremum(
                    prev_l[y - 1 : y + 2, x - 1 : x + 2],
                    curr[y - 1 : y + 2, x - 1 : x + 2],
                    nxt[y - 1 : y + 2, x - 1 : x + 2],
                    thresh,
                ):
                    cands.append((x, y, layer))
    assert cands, "no extrema candidates in the crop"
    return dict(gauss=gauss, dogs=dogs, cands=cands)


def test_localize_extremum_via_quadratic_fit_parity(ref_sift, ref_octave):
    from vfx_image_stitching_tpu.models.sift import (
        localize_extremum_via_quadratic_fit,
    )

    dog0 = np.stack(list(ref_octave["dogs"][0]))
    checked = 0
    for (x, y, layer) in ref_octave["cands"][:12]:
        ref = ref_sift.localize_extremum_via_quadratic_fit(
            x, y, layer, 0, 3, ref_octave["dogs"][0], 1.6, 0.04, 5
        )
        ours = localize_extremum_via_quadratic_fit(
            x, y, layer, 0, 3, dog0, 1.6, 0.04, 5
        )
        assert (ref is None) == (ours is None), (x, y, layer)
        if ref is None:
            continue
        rkp, rlayer = ref
        okp, olayer = ours
        assert olayer == rlayer
        np.testing.assert_allclose(okp.pt, rkp.pt, atol=2e-3)
        np.testing.assert_allclose(okp.size, rkp.size, rtol=1e-4)
        assert okp.octave == rkp.octave
        checked += 1
    assert checked >= 1


def test_compute_keypoints_with_orientations_parity(ref_sift, ref_octave):
    from vfx_image_stitching_tpu.models.sift import (
        compute_keypoints_with_orientations,
        localize_extremum_via_quadratic_fit,
    )

    dog0 = np.stack(list(ref_octave["dogs"][0]))
    done = 0
    for (x, y, layer) in ref_octave["cands"]:
        ref = ref_sift.localize_extremum_via_quadratic_fit(
            x, y, layer, 0, 3, ref_octave["dogs"][0], 1.6, 0.04, 5
        )
        if ref is None:
            continue
        rkp, rlayer = ref
        ref_oriented = ref_sift.compute_keypoints_with_orientations(
            rkp, 0, ref_octave["gauss"][0][rlayer]
        )
        ours = localize_extremum_via_quadratic_fit(
            x, y, layer, 0, 3, dog0, 1.6, 0.04, 5
        )
        okp, olayer = ours
        our_oriented = compute_keypoints_with_orientations(
            okp, 0, np.asarray(ref_octave["gauss"][0][olayer])
        )
        assert len(our_oriented) == len(ref_oriented)
        ref_angles = sorted(k.angle for k in ref_oriented)
        our_angles = sorted(k.angle for k in our_oriented)
        np.testing.assert_allclose(our_angles, ref_angles, atol=0.01)
        done += 1
        if done >= 4:
            break
    assert done >= 1


def test_compare_keypoints_parity(ref_sift):
    from vfx_image_stitching_tpu.models.sift import compare_keypoints
    from vfx_image_stitching_tpu.models.sift.extract import KeyPointRecord

    rng = np.random.default_rng(7)

    def mk():
        return KeyPointRecord(
            pt=(float(rng.integers(0, 3)), float(rng.integers(0, 3))),
            size=float(rng.integers(1, 3)),
            angle=float(rng.integers(0, 2)),
            response=float(rng.integers(0, 2)),
            octave=0,
            class_id=int(rng.integers(-1, 1)),
        )

    for _ in range(200):
        a, b = mk(), mk()
        got = compare_keypoints(a, b)
        want = ref_sift.compare_keypoints(a, b)
        assert np.sign(got) == np.sign(want), (a, b)
