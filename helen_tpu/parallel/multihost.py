"""Multi-host execution utilities.

Replaces the reference's localhost-only gloo rendezvous
(predict_gpu.py:186-191, train_distributed.py:284-288) with
``jax.distributed`` + jax.sharding:

  * ``initialize()`` joins the job (coordinator from env/args) — after it,
    ``jax.devices()`` spans all hosts and the mesh helpers in
    helen_tpu.parallel.mesh build global meshes whose collectives ride ICI
    within a slice and DCN across slices;
  * inference shards work per host — contiguous equal-count **image**
    blocks by default (balanced regardless of per-file image-count skew),
    or round-robin whole **files** (the reference's caller-sharding,
    CallConsensusInterface.py:134-145, host-granular): each host runs the
    local consensus driver over its shard and writes ``<prefix>_<host>.hdf``
    — zero cross-host communication, embarrassingly parallel, and stitch
    merges all shards (including regions whose chunks span shards);
  * training uses a global-mesh sharded step (parallel.sharding) — gradient
    psum is inserted by XLA; eval confusion matrices are summed across hosts
    with ``multihost_utils.process_allgather``.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from helen_tpu.obs import get_logger

log = get_logger("multihost")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> None:
    """Join a multi-host JAX job. No-op for single-process runs (the
    default when no coordinator is configured and ``auto`` is False).
    ``auto=True`` calls ``jax.distributed.initialize()`` with no arguments —
    on TPU pods the coordinator and process indices are discovered from the
    platform environment."""
    import jax

    if (not auto and num_processes in (None, 1) and not coordinator_address
            and not os.environ.get("JAX_COORDINATOR_ADDRESS")):
        log.info("single-process run (no coordinator configured)")
        return
    if auto and not coordinator_address:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    log.info(
        "joined distributed job: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_file_shard(files: Sequence[str], process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> List[str]:
    """This host's round-robin shard of the input files (deterministic across
    hosts; mirrors the reference round-robin, CallConsensusInterface.py:134-145)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(sorted(files)) if i % pc == pi]


def host_image_shard(num_images: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> List[int]:
    """Image-granular shard: better balance than whole-file sharding when
    files vary in image count (SURVEY.md §8.3 'multi-host input balance').
    Contiguous equal-count blocks, not round-robin: identical balance, but
    consecutive indices keep HDF5 reads sequential and let the packed cache
    use slab reads. Output placement stays deterministic because each
    image's (region, chunk) store key is intrinsic."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    start = (num_images * pi) // pc
    end = (num_images * (pi + 1)) // pc
    return list(range(start, end))


def broadcast_name(name: str, max_len: int = 256) -> str:
    """Broadcast a short string (e.g. a run-directory name) from process 0
    to all hosts. Identity in single-process runs."""
    import jax

    if jax.process_count() == 1:
        return name
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, dtype=np.uint8)
    if jax.process_index() == 0:
        raw = name.encode("utf-8")
        if len(raw) > max_len:
            raise ValueError(f"name too long to broadcast: {name!r}")
        buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(buf[buf != 0]).decode("utf-8")


def allsum_hosts(array: np.ndarray) -> np.ndarray:
    """Sum a small host-local numpy array (e.g. a confusion matrix) across
    all hosts. Identity in single-process runs.

    The transfer rides jax's default x64-disabled mode, so values are
    carried as float32: every host computes the SAME rounded sum (the
    property LR-plateau lockstep needs), but elements above 2^24 lose
    integer exactness — use :func:`allsum_hosts_exact` for counts."""
    import jax

    if jax.process_count() == 1:
        return array
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(array)
    return np.asarray(gathered).sum(axis=0)


def _split_limbs(values: np.ndarray) -> np.ndarray:
    """Non-negative integer-valued array -> (3, ...) float64 16-bit limbs."""
    v = np.rint(np.asarray(values)).astype(np.int64)
    if (v < 0).any():
        raise ValueError("allsum_hosts_exact requires non-negative counts")
    if (v >= 1 << 48).any():
        # the top limb is carried unmasked; values >= 2^48 would overflow it
        # and break the EXACT contract silently — fail loudly like negatives
        raise ValueError("allsum_hosts_exact requires per-host values < 2**48")
    return np.stack([v & 0xFFFF, (v >> 16) & 0xFFFF, v >> 32]).astype(np.float64)


def _combine_limbs(limbs: np.ndarray) -> np.ndarray:
    l = np.rint(np.asarray(limbs)).astype(np.int64)
    return l[0] + (l[1] << 16) + (l[2] << 32)


def allsum_hosts_exact(counts: np.ndarray) -> np.ndarray:
    """Sum non-negative integer-valued arrays across hosts EXACTLY.

    :func:`allsum_hosts` carries float32 over the wire (jax x64-disabled),
    which silently rounds counts above 2^24 — genome-scale confusion-matrix
    cells cross that at only ~17K images of 1000 columns. Here each value is
    split into 16-bit limbs, each limb summed in float32 (exact while a limb
    sum stays below 2^24, i.e. up to 256 hosts with per-host values below
    2^48), then recombined in int64. Returns int64."""
    import jax

    v = np.rint(np.asarray(counts)).astype(np.int64)
    if jax.process_count() == 1:
        return v
    return _combine_limbs(allsum_hosts(_split_limbs(v)))


def coordination_client():
    """Feature-detected handle to the coordination-service client.

    jax exposes no public barrier API (jax.distributed has only
    initialize/is_initialized/shutdown as of 0.9), so this shim probes the
    known locations of the distributed-runtime client, newest first. Returns
    None when no candidate resolves (single-process runs, or a jax upgrade
    that moved the internals — tests/test_multihost_unit.py fails loudly on
    the latter so the degradation is never silent)."""
    import jax

    candidates = (
        # a future public home, tried first so an upstream promotion is
        # picked up without a code change
        lambda: jax.distributed.global_state.client,
        # jax 0.4.x - 0.9.x internal location
        lambda: __import__(
            "jax._src.distributed", fromlist=["global_state"]
        ).global_state.client,
    )
    for get in candidates:
        try:
            client = get()
        except Exception:
            continue
        if client is not None and hasattr(client, "wait_at_barrier"):
            return client
    return None


def barrier(name: str = "helen_tpu", timeout_s: float = 86400.0) -> None:
    """Cross-host sync point (replaces the reference's dist.barrier,
    train_distributed.py:243,253).

    Prefers the coordination-service barrier over a device collective:
    hosts wait at this barrier for however long another host computes (e.g.
    process 0 stitching a genome for tens of minutes), and cross-host
    DEVICE collectives are subject to runtime transfer timeouts far below
    that — a parked sync_global_devices would abort the job. Falls back to
    the collective if the coordination client is unavailable.

    The default timeout is deliberately generous (24 h): pipeline barriers
    park hosts behind single-host work of genome-scale duration (a stitch on
    process 0 can run for hours on few threads); callers with tighter
    liveness requirements pass their own ``timeout_s``.
    """
    import jax

    if jax.process_count() == 1:
        return
    client = coordination_client()
    if client is not None:
        client.wait_at_barrier(f"helen_tpu:{name}", int(timeout_s * 1000))
        return
    log.warning("coordination-service barrier unavailable; "
                "falling back to a device collective")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
