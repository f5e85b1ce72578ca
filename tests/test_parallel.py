"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from vfx_image_stitching_tpu.parallel import make_mesh, sharded_pairwise_shifts
from vfx_image_stitching_tpu.config import StitchConfig


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_pairwise_shifts_matches_unsharded():
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (8, 64, 48, 3), dtype=np.uint8))
    cfg = StitchConfig(backend="harris")

    mesh = make_mesh(8)
    sharded = sharded_pairwise_shifts(batch, mesh, cfg)

    from vfx_image_stitching_tpu.parallel.mesh import _pairwise_shift_step

    local = _pairwise_shift_step(batch, cfg)
    for s, l in zip(jax.device_get(sharded), jax.device_get(local)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(l), atol=1e-5)


def test_sharded_sift_matches_unsharded():
    """Flagship SIFT backend under an images-sharded mesh == unsharded."""
    import __graft_entry__ as ge

    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.integers(0, 256, (8, 32, 24, 3), dtype=np.uint8))
    cfg = ge._small_sift_config()

    mesh = make_mesh(8)
    sharded = sharded_pairwise_shifts(batch, mesh, cfg)

    from vfx_image_stitching_tpu.parallel.mesh import _pairwise_shift_step

    local = _pairwise_shift_step(batch, cfg)
    for s, l in zip(jax.device_get(sharded), jax.device_get(local)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(l), atol=1e-4)


def test_sharded_uneven_batch_matches_unsharded():
    """11 images on 8 devices (GSPMD pads the ragged shard) == unsharded."""
    rng = np.random.default_rng(2)
    batch = jnp.asarray(rng.integers(0, 256, (11, 64, 48, 3), dtype=np.uint8))
    cfg = StitchConfig(backend="harris")

    mesh = make_mesh(8)
    sharded = sharded_pairwise_shifts(batch, mesh, cfg)

    from vfx_image_stitching_tpu.parallel.mesh import _pairwise_shift_step

    local = _pairwise_shift_step(batch, cfg)
    for s, l in zip(jax.device_get(sharded), jax.device_get(local)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(l), atol=1e-5)


def test_sharded_multi_pano_matches_unsharded():
    """2-D (pano, images) mesh path == the unsharded multi-pano step."""
    from vfx_image_stitching_tpu.parallel.mesh import (
        _multi_pano_step,
        make_mesh_2d,
        sharded_multi_pano_shifts,
    )

    rng = np.random.default_rng(3)
    batch = jnp.asarray(
        rng.integers(0, 256, (2, 4, 64, 48, 3), dtype=np.uint8)
    )
    cfg = StitchConfig(backend="harris")

    mesh2 = make_mesh_2d(8)
    assert mesh2.devices.shape == (2, 4)
    sharded = sharded_multi_pano_shifts(batch, mesh2, cfg)

    local = _multi_pano_step(batch, cfg)
    for s, l in zip(jax.device_get(sharded), jax.device_get(local)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(l), atol=1e-5)


def test_shardmap_multi_pano_matches_vmap():
    """Default shard_map multi-pano full step == the vmap path, bit-equal.

    The shard_map step runs the unvmapped per-pano program per shard
    (conds stay conds — no select rewrite), so it must reproduce the
    vmapped step's outputs exactly; P=3 on the 2-wide pano axis also
    exercises the blank-pano padding + trim.
    """
    import __graft_entry__ as ge
    from vfx_image_stitching_tpu.parallel.mesh import (
        make_mesh_2d,
        sharded_multi_pano_full,
    )

    rng = np.random.default_rng(4)
    batch = jnp.asarray(
        rng.integers(0, 256, (3, 4, 64, 48, 3), dtype=np.uint8)
    )
    cfg = ge._small_sift_config()

    mesh2 = make_mesh_2d(8)
    smap = sharded_multi_pano_full(batch, mesh2, cfg)
    # the vmap path requires P to divide the pano axis — pad + trim here
    # (sharded_multi_pano_full does this internally for shard_map)
    padded = jnp.concatenate([batch, jnp.zeros_like(batch[:1])])
    vmap = sharded_multi_pano_full(padded, mesh2, cfg, mode="vmap")
    vmap = jax.tree.map(lambda x: x[:3], vmap)
    for s, v in zip(jax.tree.leaves(smap), jax.tree.leaves(vmap)):
        np.testing.assert_array_equal(np.asarray(s), np.asarray(v))


def test_stitch_many_pano_mesh_matches_unsharded(tmp_path):
    """End-to-end stitch_many on the 1-D pano-only mesh == single-device.

    make_mesh_pano is the preferred throughput layout (whole panoramas
    per device, docs/MESH_COST_r03b.json); this pins its end-to-end
    equality through _stitch_many_sharded's 1-D mesh handling.
    """
    import os

    import cv2
    pytest = __import__("pytest")
    if not os.path.isdir("/root/reference/out"):
        pytest.skip("reference repo not mounted")

    from vfx_image_stitching_tpu.parallel.mesh import make_mesh_pano
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many

    src = cv2.imread("/root/reference/out/out00.jpg")
    src2 = cv2.imread("/root/reference/out/out01.jpg")
    folders = []
    for name, off in (("pma", 0), ("pmb", 16), ("pmc", 32)):
        d = tmp_path / name
        d.mkdir()
        cv2.imwrite(str(d / "a.jpg"), src[off : off + 120, 40:180])
        cv2.imwrite(str(d / "b.jpg"), src2[off : off + 120, 40:180])
        (d / "pano.txt").write_text("a.jpg\n455.0\nb.jpg\n455.5\n")
        folders.append(str(d))

    mesh = make_mesh_pano(2)  # P=3 on 2 devices: uneven pano padding
    margins = {n: 2 for n in ("pma", "pmb", "pmc")}
    sharded = stitch_many(folders, backend="harris", margins=margins,
                          mesh=mesh)
    plain = stitch_many(folders, backend="harris", margins=margins)
    for name in ("pma", "pmb", "pmc"):
        assert sharded[name].shifts == plain[name].shifts
        np.testing.assert_array_equal(
            sharded[name].panorama, plain[name].panorama
        )


def test_graft_entry_contracts():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)


def test_stitch_many_sharded_matches_unsharded(tmp_path):
    """End-to-end multi-pano throughput on the 2-D mesh == single-device."""
    import os

    import cv2
    pytest = __import__("pytest")
    if not os.path.isdir("/root/reference/out"):
        pytest.skip("reference repo not mounted")

    from vfx_image_stitching_tpu.parallel.mesh import make_mesh_2d
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many

    src = cv2.imread("/root/reference/out/out00.jpg")
    src2 = cv2.imread("/root/reference/out/out01.jpg")
    folders = []
    for name, off in (("dsa", 0), ("dsb", 16)):
        d = tmp_path / name
        d.mkdir()
        cv2.imwrite(str(d / "a.jpg"), src[off : off + 120, 40:180])
        cv2.imwrite(str(d / "b.jpg"), src2[off : off + 120, 40:180])
        (d / "pano.txt").write_text("a.jpg\n455.0\nb.jpg\n455.5\n")
        folders.append(str(d))

    mesh = make_mesh_2d(8)
    sharded = stitch_many(
        folders, backend="harris", margins={"dsa": 2, "dsb": 2}, mesh=mesh
    )
    plain = stitch_many(folders, backend="harris",
                        margins={"dsa": 2, "dsb": 2})
    for name in ("dsa", "dsb"):
        assert sharded[name].shifts == plain[name].shifts
        np.testing.assert_array_equal(
            sharded[name].panorama, plain[name].panorama
        )
