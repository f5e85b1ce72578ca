"""Persistent-compilation-cache plumbing.

Round 1-3 believed this harness's remote compiles (1-10 min each) were
"not locally cached".  Root cause found in round 4: the environment's
``sitecustomize`` imports jax at interpreter start — BEFORE any user
script body runs — so ``os.environ["JAX_COMPILATION_CACHE_DIR"] = ...``
in scripts never reaches jax's config (env vars are read once at
import).  The backend itself supports caching fine (platform reports
"tpu", ``supports_executable_serialization`` is True): setting the dir
via ``jax.config.update`` makes a second process reuse every compiled
executable — measured 197.5 s -> 0.61 s for a probe jit, and the full
headline pipeline's second-process cold start drops 168 s -> 28 s
(zero cache misses under DEBUG logging; the rest is the 10.8 s jax
import, sub-threshold small compiles, and first data flow —
docs/COLDSTART_r04.json).

:func:`ensure_compilation_cache` is called on package import; it never
overrides a cache dir the user already configured.
"""

from __future__ import annotations

import os
import tempfile


def _default_dir() -> str:
    """Per-user cache dir (advisor r4: a fixed world-shared /tmp path can
    be pre-created and poisoned by another user on a shared machine)."""
    try:
        uid = os.getuid()
    except AttributeError:  # pragma: no cover - non-POSIX
        uid = "u"
    return os.path.join(tempfile.gettempdir(), f"jax_cache_vfx_{uid}")


def ensure_compilation_cache(default_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache somewhere, if unset.

    Uses (in order): an already-configured ``jax_compilation_cache_dir``
    (left untouched), the ``JAX_COMPILATION_CACHE_DIR`` env var (which
    jax itself missed if it was set after jax's import), then
    ``default_dir``.  Also lowers the min-compile-time threshold so the
    multi-second remote compiles are always captured.  Never raises:
    on any config incompatibility the pipeline just runs uncached.
    """
    try:
        import jax
        from jax._src import config as _jcfg

        if _jcfg.compilation_cache_dir.value:
            return
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", default_dir or _default_dir()
        )
        os.makedirs(path, mode=0o700, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # remote compiles report seconds-to-minutes; tiny host-side ones
        # are cheap to keep too (entries are tens of KB)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - best-effort plumbing
        pass
