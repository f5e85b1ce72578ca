"""Test configuration: force CPU JAX with 8 virtual devices.

The suite must run without a TPU; sharding tests use the virtual CPU mesh.
These env vars must be set before jax initializes a backend.

``VFX_TEST_TPU=1`` flips the suite to the real chip instead: the CPU
force is skipped and only ``-m tpu``-marked tests (compiled-Mosaic Pallas
kernels, on-chip extractors, one small end-to-end stitch) make sense —
run ``VFX_TEST_TPU=1 python -m pytest tests -m tpu``.
"""

import os
import sys

TPU_RUN = os.environ.get("VFX_TEST_TPU") == "1"

if not TPU_RUN:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_RUN:
    # The environment's TPU plugin prepends itself to JAX_PLATFORMS, so the
    # env var alone does not stick; force CPU through the config (must run
    # before any backend initialization).
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache (the SIFT graph is compile-heavy)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = os.environ.get("VFX_REFERENCE_DIR", "/root/reference")

import pytest  # noqa: E402


def have_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def have_cv2() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not have_reference(), reason="reference repo not mounted"
)
requires_cv2 = pytest.mark.skipif(not have_cv2(), reason="cv2 unavailable")


def load_reference_module(name: str):
    """Load /root/reference/<name>.py by PATH under a private module name.

    ``sys.path.insert(0, REFERENCE_DIR); import sift_impl`` is unsound in
    a full-suite process: the repo root ships same-named drop-in shims
    (sift_impl.py, image_stitching_{harris,sift}.py), so whichever gets
    imported first wins ``sys.modules`` and a later oracle fixture can
    silently receive OUR implementation instead of the reference — the
    parity test then compares us against ourselves.  Loading by explicit
    file path under a ``_ref_``-prefixed name (and temporarily pointing
    ``sys.modules['sift_impl']`` at the reference copy while executing a
    reference script that imports it) guarantees oracle independence.
    """
    import importlib.util

    key = "_ref_" + name
    if key in sys.modules:
        return sys.modules[key]
    path = os.path.join(REFERENCE_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    if name == "sift_impl":
        spec.loader.exec_module(mod)
        return mod
    saved = sys.modules.get("sift_impl")
    sys.modules["sift_impl"] = load_reference_module("sift_impl")
    try:
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["sift_impl"] = saved
        else:
            sys.modules.pop("sift_impl", None)
    return mod


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests only run on a real chip (VFX_TEST_TPU=1)."""
    on_tpu = TPU_RUN and jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(
        reason="needs a real TPU (set VFX_TEST_TPU=1, run -m tpu)"
    )
    skip_cpu_only = pytest.mark.skip(
        reason="CPU-mesh test; not meaningful under VFX_TEST_TPU=1"
    )
    for item in items:
        if "tpu" in item.keywords:
            if not on_tpu:
                item.add_marker(skip_tpu)
        elif TPU_RUN:
            item.add_marker(skip_cpu_only)


@pytest.fixture(scope="session")
def reference_dir() -> str:
    if not have_reference():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR
