"""Host (NumPy) compositor vs the reference oracle and the device scan.

compose/host.py (the VFX_HOST_COMPOSE latency path) replicates the
REFERENCE blend arithmetic exactly, so it must be byte-identical to the
sequential oracle (tests/oracles.py); versus the device scan it shares
the accepted +-1 tolerance (XLA may FMA-contract the f32 blend,
tests/test_compose.py).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests import oracles
from tests.test_compose import _assert_blend_parity
from vfx_image_stitching_tpu.compose import plan_compose, compose_mosaic
from vfx_image_stitching_tpu.compose.crop import crop_bounds
from vfx_image_stitching_tpu.compose.host import (
    compose_mosaic_host,
    content_bounds_host,
)


def _rand_images(rng, n, h, w):
    imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    # a few all-black columns exercise the occupancy select tree
    imgs[:, :, :3] = 0
    return imgs


@pytest.mark.parametrize("seed", range(5))
def test_host_equals_device_random_chain(seed):
    rng = np.random.default_rng(seed)
    n, h, w = 4, 36, 48
    images = _rand_images(rng, n, h, w)
    shifts, pairs = [], []
    for i in range(n - 1):
        dx = int(rng.integers(10, 34)) * (1 if (seed + i) % 2 == 0 else -1)
        dy = float(rng.integers(-5, 6)) + float(rng.random())
        xa = int(rng.integers(8, w - 8))
        ya = int(rng.integers(4, h - 4))
        shifts.append((float(dx), dy))
        pairs.append(((xa, ya), (xa - dx, ya - int(dy))))
    plan = plan_compose(h, w, n, [True] * n, shifts, pairs)
    oracle = oracles.compose_sequence(list(images), shifts, pairs)
    host = compose_mosaic_host(list(images), plan)
    np.testing.assert_array_equal(host, oracle)
    dev = np.asarray(compose_mosaic(jnp.asarray(images), plan))
    _assert_blend_parity(dev, host)


def test_host_equals_device_with_invalid_image():
    rng = np.random.default_rng(7)
    n, h, w = 4, 30, 40
    images = _rand_images(rng, n, h, w)
    valid = [True, True, False, True]
    shifts = [(12.0, 1.5), (0.0, 0.0), (-15.0, -2.0)]
    pairs = [((20, 10), (8, 9)), None, ((10, 12), (25, 14))]
    plan = plan_compose(h, w, n, valid, shifts, pairs)
    cyl_list = [images[i] if valid[i] else None for i in range(n)]
    oracle = oracles.compose_sequence(cyl_list, shifts, pairs)
    host = compose_mosaic_host(
        {i: images[i] for i in range(n) if valid[i]}, plan
    )
    np.testing.assert_array_equal(host, oracle)
    dev = np.asarray(compose_mosaic(jnp.asarray(images), plan))
    _assert_blend_parity(dev, host)


def test_host_equals_device_zero_overlap_range():
    """overlap_range == 0 pins alpha to 0 (degenerate pair semantics)."""
    rng = np.random.default_rng(3)
    h, w = 24, 32
    images = _rand_images(rng, 2, h, w)
    # xb - xa + W == 0  =>  overlap_range == 0
    pairs = [((float(w), 5.0), (0.0, 5.0))]
    shifts = [(16.0, 0.0)]
    plan = plan_compose(h, w, 2, [True, True], shifts, pairs)
    assert plan.steps[0].overlap_range == 0.0
    oracle = oracles.compose_sequence(list(images), shifts, pairs)
    host = compose_mosaic_host(list(images), plan)
    np.testing.assert_array_equal(host, oracle)
    dev = np.asarray(compose_mosaic(jnp.asarray(images), plan))
    _assert_blend_parity(dev, host)


def test_content_bounds_host_matches_device():
    rng = np.random.default_rng(5)
    mosaic = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    mosaic[:6] = 0
    mosaic[-3:] = 0
    mosaic[:, :4] = 0
    mosaic[:, -9:] = 0
    for thr in (0, 10, 255):
        dev = tuple(int(v) for v in crop_bounds(jnp.asarray(mosaic), thr)[:4])
        dev_any = bool(crop_bounds(jnp.asarray(mosaic), thr)[4])
        host = content_bounds_host(mosaic, thr)
        assert host[:4] == dev
        assert host[4] == dev_any


@pytest.mark.parametrize("extra_env", [{}, {"VFX_GRAY_FIRST": "1"}])
def test_pipeline_host_compose_matches_device(extra_env, monkeypatch, tmp_path):
    """Full driver: VFX_HOST_COMPOSE=1 matches the device path.

    Shifts must be identical (compose plays no part in them); mosaics
    agree within the device blend's accepted f32 tolerance.  Uses the
    2-image `out` dataset with the Harris backend (compose is
    backend-independent; Harris avoids the SIFT compile cost).  The
    gray-first variant additionally skips the RGB device uploads.
    """
    folder = "/root/reference/out"
    if not os.path.isdir(folder):
        pytest.skip("reference datasets unavailable")
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama

    monkeypatch.setenv("VFX_HOST_COMPOSE", "0")  # device-path baseline
    base = stitch_panorama(folder, backend="harris")
    monkeypatch.setenv("VFX_HOST_COMPOSE", "1")
    for k, v in extra_env.items():
        monkeypatch.setenv(k, v)
    hostc = stitch_panorama(folder, backend="harris")
    assert [tuple(s) for s in base.shifts] == [tuple(s) for s in hostc.shifts]
    assert base.mosaic.shape == hostc.mosaic.shape
    _assert_blend_parity(hostc.mosaic, base.mosaic)
    assert base.panorama.shape == hostc.panorama.shape
    _assert_blend_parity(hostc.panorama, base.panorama)


def test_plan_patch_point_translate_resume():
    """A one-pair change patches: translated prefix + suffix refold is
    byte-identical to a full fold of the final plan (incl. the drift
    coupling that moves every dy by delta/(N-1))."""
    from vfx_image_stitching_tpu.compose.host import (
        compose_mosaic_host_prefix,
        plan_patch_point,
        resume_compose_host,
        translate_prefix,
    )
    from vfx_image_stitching_tpu.estimate.drift import correct_drift

    rng = np.random.default_rng(7)
    n, h, w = 6, 36, 48
    images = list(_rand_images(rng, n, h, w))
    raw = [(30.0, 1.2), (28.0, -0.8), (31.0, 2.2), (27.0, 1.1),
           (29.0, -1.3)]
    pairs = []
    for i, (dx, dy) in enumerate(raw):
        xa, ya = 20 + i, 10 + i
        pairs.append(((float(xa), float(ya)), (xa - dx, ya - round(dy))))
    # escalation changes pair 3's shift and winning pair
    changed = 3
    raw_f = list(raw)
    raw_f[changed] = (24.0, 2.1)
    pairs_f = list(pairs)
    pairs_f[changed] = ((21.0, 12.0), (21.0 - 24.0, 12.0 - 2.0))

    spec_plan = plan_compose(
        h, w, n, [True] * n, correct_drift(raw, n), pairs
    )
    final_plan = plan_compose(
        h, w, n, [True] * n, correct_drift(raw_f, n), pairs_f
    )
    full = compose_mosaic_host(images, final_plan)

    patch = plan_patch_point(spec_plan, final_plan)
    assert patch is not None
    j, dty, dtx = patch
    # steps fold images 1..n-1; pair `changed` feeds the step of image
    # changed+1 which is step index `changed` — the prefix before it
    # must match up to the uniform translation
    assert j == changed
    snap_step = changed  # snapshot where the pipeline would place it
    canvas, occ = compose_mosaic_host_prefix(images, spec_plan, snap_step)
    canvas, occ = translate_prefix(canvas, occ, final_plan, dty, dtx)
    patched = resume_compose_host(canvas, occ, images, final_plan, snap_step)
    np.testing.assert_array_equal(patched, full)
    # confirmed-plan case: patch is the whole plan, zero delta
    same = plan_patch_point(final_plan, final_plan)
    assert same == (len(final_plan.steps), 0, 0)


def test_plan_patch_point_rejects_nonuniform_prefix():
    """A rounding flip in an early step must shrink the reusable prefix
    (and a full refold must remain the fallback)."""
    from vfx_image_stitching_tpu.compose.host import plan_patch_point

    n, h, w = 5, 36, 48
    raw = [(30.0, 0.5), (28.0, 1.0), (31.0, 2.0), (27.0, 1.0)]
    pairs = []
    for i, (dx, dy) in enumerate(raw):
        xa, ya = 20 + i, 10 + i
        pairs.append(((float(xa), float(ya)), (xa - dx, ya - round(dy))))
    # dy=0.5 in pair 0 sits on the rounding knife edge: a drift change
    # flips its rounded placement, so the prefix ends at step 0
    raw_f = list(raw)
    raw_f[3] = (27.0, 5.0)
    from vfx_image_stitching_tpu.estimate.drift import correct_drift

    spec_plan = plan_compose(h, w, n, [True] * n, correct_drift(raw, n),
                             pairs)
    final_plan = plan_compose(h, w, n, [True] * n, correct_drift(raw_f, n),
                              pairs)
    patch = plan_patch_point(spec_plan, final_plan)
    assert patch is not None
    j, _, _ = patch
    assert j < 3
