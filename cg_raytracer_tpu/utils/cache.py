"""Persistent XLA compilation cache setup.

On this environment first-compiles go through a slow remote-compile tunnel
(minutes per computation); the persistent cache makes every subsequent process
reuse the compiled executable.  Called from CLI/bench entry points (not at package
import, to avoid surprising side effects for library users).
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if jax.default_backend() == "cpu":
        # XLA:CPU cache entries are AOT executables whose recorded machine
        # features can mismatch the loading host ("could lead to execution
        # errors such as SIGILL", cpu_aot_loader.cc) — observed as
        # intermittent SIGABRTs on reload in this environment.  CPU compiles
        # are fast anyway; the cache only pays for the TPU remote-compile
        # tunnel.
        return
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/cgrt_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
