"""Worker-process spawn hygiene.

The stitch pool and the prediction writer pool spawn PURE-CPU worker
processes (numpy + h5py + the native stitch library — no JAX). But a spawned
interpreter re-runs ``sitecustomize``, and on accelerator hosts that can
bootstrap a full accelerator client per worker: on this project's TPU test
harness, ``PALLAS_AXON_POOL_IPS`` makes every interpreter import jax and
register a TPU relay client — 2.3 s of startup per worker (measured; a bare
interpreter is 0.015 s) plus a pointless device claim from processes that
never touch the chip.

``lean_worker_env()`` temporarily strips the accelerator-bootstrap trigger
variables from ``os.environ`` while a pool is being populated, so the
children inherit a clean environment and start lean. The parent's own
accelerator runtime is untouched: these variables are read once at
interpreter startup (sitecustomize), long before any pool exists.

The default scrub list covers the harness trigger; deployments can extend
or replace it with ``HELEN_TPU_SCRUB_WORKER_ENV`` (comma-separated variable
names; empty string disables scrubbing).
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Sequence, Tuple

# read once at import: variables whose PRESENCE makes a child interpreter
# bootstrap an accelerator client it will never use
_DEFAULT_SCRUB: Tuple[str, ...] = ("PALLAS_AXON_POOL_IPS",)


def _scrub_list() -> Sequence[str]:
    override = os.environ.get("HELEN_TPU_SCRUB_WORKER_ENV")
    if override is None:
        return _DEFAULT_SCRUB
    return tuple(v for v in (s.strip() for s in override.split(",")) if v)


@contextlib.contextmanager
def lean_worker_env() -> Iterator[None]:
    """Strip accelerator-bootstrap env vars for the duration of worker
    spawning. Wrap BOTH pool construction and the first submit round —
    ProcessPoolExecutor launches its workers lazily on submit."""
    saved = {}
    for var in _scrub_list():
        if var in os.environ:
            saved[var] = os.environ.pop(var)
    try:
        yield
    finally:
        os.environ.update(saved)
