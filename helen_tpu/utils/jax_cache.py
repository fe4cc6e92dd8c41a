"""Persistent XLA compilation cache.

TPU compiles of the consensus program can take tens of seconds (and remote
compile services add variance); caching compiled binaries on disk makes every
run after the first start in ~1 s. Enabled by default from the CLI; set
HELEN_TPU_XLA_CACHE="" to disable or to a path to relocate.
"""
from __future__ import annotations

import os
from typing import Optional

from helen_tpu.obs import get_logger

log = get_logger("jax_cache")

DEFAULT_DIR = os.path.expanduser("~/.cache/helen_tpu/xla")


def enable_persistent_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a local directory.

    Must run before the first compilation. Returns the directory in use, or
    None when disabled via HELEN_TPU_XLA_CACHE="".
    """
    env = os.environ.get("HELEN_TPU_XLA_CACHE")
    if env == "":
        return None
    cache_dir = cache_dir or env or DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log.debug("persistent XLA cache at %s", cache_dir)
    return cache_dir
