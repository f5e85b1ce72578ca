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
