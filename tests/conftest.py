"""Test configuration: force CPU JAX with 8 virtual devices.

The suite must run without a TPU; sharding tests use the virtual CPU mesh.
These env vars must be set before jax initializes a backend.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin prepends itself to JAX_PLATFORMS, so the env
# var alone does not stick; force CPU through the config (must run before
# any backend initialization).
import jax  # noqa: E402

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


@pytest.fixture(scope="session")
def reference_dir() -> str:
    if not have_reference():
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR
