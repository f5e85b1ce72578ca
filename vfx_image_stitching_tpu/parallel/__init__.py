"""Multi-chip scaling via jax.sharding meshes.

The reference is single-process/single-thread (SURVEY.md section 2); the
analogous scaling axis here is the image chain and the dataset batch:
per-image stages (projection, features) are embarrassingly parallel across
images, pairwise matching across the N-1 adjacent pairs, and only the
final blend is a sequential fold.  Communication is limited to the
boundary exchange implied by the adjacent-pair coupling (XLA inserts the
collective) and an all-gather of the tiny per-pair shift vectors — all of
which rides ICI on a real slice.
"""

from vfx_image_stitching_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_pano,
    sharded_pairwise_shifts,
    sharded_multi_pano_shifts,
    sharded_multi_pano_full,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_pano",
    "sharded_pairwise_shifts",
    "sharded_multi_pano_shifts",
    "sharded_multi_pano_full",
    "shard_batch",
]
