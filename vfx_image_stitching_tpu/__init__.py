"""TPU-native panorama stitching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``sapt36/VFX_Image_Stitching`` project (cylindrical panorama stitching with
two from-scratch feature backends — SIFT and Harris — translation-model
voting RANSAC, drift correction, linear blending and rectangling crop).

Design stance
-------------
* All dense pixel / feature math runs on device as fixed-shape jitted JAX
  (Pallas kernels for the fused hot spots); dynamic quantities (keypoint
  counts, growing canvases) are handled with fixed-capacity masked arrays.
* Host Python does only tiny scalar orchestration (pano.txt parsing, drift
  correction, canvas planning) in float64 — this mirrors the reference's
  Python-float semantics exactly where parity matters.
* Images are batched ``(N, H, W, 3)`` per dataset and the per-image /
  per-pair stages are vmapped and shardable over a ``jax.sharding.Mesh``
  (see :mod:`vfx_image_stitching_tpu.parallel`).

Reference parity
----------------
Behavior replicates the reference semantics including its quirks (forward
rounded cylindrical projection, absolute match thresholds, counter-based
blend alpha, non-converged-but-accepted extrema, pano.txt entry-drop
heuristic).  Reference citations use ``file:line`` of the original scripts,
e.g. ``image_stitching_harris.py:290-309``.
"""

from vfx_image_stitching_tpu.config import (
    HarrisConfig,
    MatchConfig,
    SiftCapacities,
    SiftConfig,
    StitchConfig,
)
from vfx_image_stitching_tpu.io import read_pano_data, load_dataset
from vfx_image_stitching_tpu.utils.cache import ensure_compilation_cache

# This harness's sitecustomize imports jax before user code, so the
# JAX_COMPILATION_CACHE_DIR env var never reaches jax's config — set it
# here (no-op if the user already configured a cache dir).  Cuts every
# later process's cold start from minutes of remote compiles to seconds
# (docs/COLDSTART_r04.json).
ensure_compilation_cache()

__version__ = "0.1.0"


def stitch_panorama(*args, **kwargs):
    """Lazy re-export of :func:`pipeline.stitch.stitch_panorama`."""
    from vfx_image_stitching_tpu.pipeline.stitch import stitch_panorama as fn

    return fn(*args, **kwargs)


def stitch_many(*args, **kwargs):
    """Lazy re-export of :func:`pipeline.multi.stitch_many`."""
    from vfx_image_stitching_tpu.pipeline.multi import stitch_many as fn

    return fn(*args, **kwargs)


__all__ = [
    "HarrisConfig",
    "MatchConfig",
    "SiftCapacities",
    "SiftConfig",
    "StitchConfig",
    "read_pano_data",
    "load_dataset",
    "stitch_panorama",
    "stitch_many",
    "__version__",
]
