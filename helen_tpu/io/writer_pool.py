"""Multi-process prediction writer pool.

libhdf5 serializes every call in-process (h5py's global lock), so a single
PredictionStore caps consensus throughput at ~3K images/s on a fast host
while the TPU emits ~18K (docs/performance.md, "Prediction-store write
throughput"). The pool runs K writer processes, each owning ONE shard file
``<prefix>_<host>_w<k>.hdf``; image chunks route to a deterministic writer
by region key, and the stitch engine already merges regions across any
number of prediction files (io/prediction_store.list_region_keys — the same
machinery that merges multi-host shards), so downstream behavior is
unchanged.

Duplicate/resume semantics stay first-write-wins and pool-wide: the driver
keeps the union of every shard's (region, chunk) keys (collected from the
workers at startup), so a resumed run skips chunks no matter which shard —
or which previous pool size — wrote them.

API-compatible with PredictionStore for everything the consensus driver
uses: ``write_prediction``, ``has_chunk``, ``flush``, ``close``, context
manager, plus ``paths``.
"""
from __future__ import annotations

import multiprocessing
import os
import queue as queue_mod
from typing import List, Sequence, Set, Tuple

from helen_tpu.obs import get_logger

log = get_logger("writer_pool")

_SENTINEL = "stop"
_FLUSH = "flush"


def _chunk_keys(path: str) -> Set[Tuple[str, str]]:
    """(region, chunk) keys present in an existing prediction file."""
    import h5py

    from helen_tpu.io.prediction_store import PRED_ROOT

    keys: Set[Tuple[str, str]] = set()
    if not os.path.exists(path):
        return keys
    with h5py.File(path, "r") as f:
        if PRED_ROOT not in f:
            return keys
        for contig in f[PRED_ROOT]:
            for region in f[PRED_ROOT][contig]:
                for k in f[PRED_ROOT][contig][region]:
                    if k not in ("contig_start", "contig_end"):
                        keys.add((region, k))
    return keys


def _writer_main(path: str, mode: str, work_q, result_q) -> None:
    """Worker: own one shard file; apply record blocks in arrival order.

    The idle loop polls with a timeout and watches the PARENT pid: if the
    driver is SIGKILLed (preemption, OOM killer), daemon children are NOT
    reaped by Python — an orphaned writer would sit in ``work_q.get()``
    forever holding its shard's HDF5 write lock, and the operator's
    ``--resume`` attempt would then die with 'unable to lock file'
    (observed live, r5). Orphans instead close the store (releasing the
    lock, leaving the shard readable) and exit within ~5 s."""
    try:
        from helen_tpu.io.prediction_store import PredictionStore

        parent = os.getppid()
        store = PredictionStore(path, mode)
        # report pre-existing chunks (resume) so the driver can build the
        # pool-wide dedupe set
        result_q.put(("chunks", sorted(store._chunks)))
        while True:
            try:
                item = work_q.get(timeout=5)
            except queue_mod.Empty:
                if os.getppid() != parent:  # driver died; we are orphaned
                    store.close()
                    return
                continue
            if item == _SENTINEL:
                break
            if item == _FLUSH:
                store.flush()
                result_q.put(("flushed", path))
                continue
            for contig, cs, ce, cid, position, bases, rles, quals in item:
                store.write_prediction(contig, cs, ce, cid, position, bases,
                                       rles, quals)
        store.close()
        result_q.put(("done", path))
    except BaseException as exc:  # surfaced by the driver
        import traceback

        result_q.put(("error", f"{exc!r}\n{traceback.format_exc()}"))


class PredictionWriterPool:
    """K spawn-processes, each writing one prediction shard file."""

    def __init__(self, paths: Sequence[str], mode: str = "w",
                 queue_depth: int = 8, block_records: int = 128,
                 extra_key_files: Sequence[str] = ()):
        assert len(paths) >= 1
        self.paths: List[str] = list(paths)
        # resume across pool-size changes: shards a PREVIOUS run wrote under
        # a different --writers count (or the single-writer file) are not in
        # ``paths``; their (region, chunk) keys preload the dedupe set so
        # those chunks are skipped, not recomputed and duplicated
        self._preload: Set[Tuple[str, str]] = set()
        for path in extra_key_files:
            self._preload.update(_chunk_keys(path))
        # records buffer per writer and ship in blocks: a multiprocessing
        # queue put costs ~1 ms in feeder-thread/pickle overhead per ITEM,
        # which at one record per item is slower than just writing locally;
        # one block amortizes that over block_records pickled-as-one arrays
        self._block_records = max(1, block_records)
        self._buffers: List[list] = [[] for _ in paths]
        ctx = multiprocessing.get_context("spawn")
        self._result_q = ctx.Queue()
        self._work_qs = []
        self._procs = []
        self._chunks: Set[Tuple[str, str]] = set()
        self._closed = False
        # writer processes are pure-CPU (h5py + numpy): scrub accelerator-
        # bootstrap env vars so each spawned interpreter starts lean instead
        # of registering its own TPU client (utils.procs.lean_worker_env)
        from helen_tpu.utils.procs import lean_worker_env

        with lean_worker_env():
            for path in self.paths:
                wmode = mode if (mode == "w" or os.path.exists(path)) else "w"
                q = ctx.Queue(maxsize=queue_depth)
                p = ctx.Process(target=_writer_main,
                                args=(path, wmode, q, self._result_q),
                                daemon=True)
                p.start()
                self._work_qs.append(q)
                self._procs.append(p)
        # startup barrier: every worker reports its existing chunk keys (or
        # an error, e.g. an unwritable path) before any writes are routed.
        # Poll with liveness checks — a worker that dies before reporting
        # (e.g. spawn re-import of a __main__ without a main guard) must
        # raise here, not hang the driver forever.
        for _ in self.paths:
            while True:
                try:
                    kind, payload = self._result_q.get(timeout=5)
                    break
                except queue_mod.Empty:
                    dead = [p for p in self._procs if not p.is_alive()]
                    if dead:
                        self._abort()
                        raise RuntimeError(
                            "prediction writer died during startup (exit "
                            f"codes {[p.exitcode for p in dead]}); if driving "
                            "from a script, guard it with "
                            "if __name__ == '__main__' (spawn re-imports it)"
                        )
            if kind == "error":
                self._abort()
                raise RuntimeError(f"prediction writer failed to start: {payload}")
            self._chunks.update(tuple(k) for k in payload)
        self._chunks.update(self._preload)

    # -- PredictionStore-compatible surface --------------------------------

    def has_chunk(self, contig: str, contig_start: int, contig_end: int,
                  chunk_id: int) -> bool:
        region = f"{contig}-{contig_start}-{contig_end}"
        return (region, str(chunk_id)) in self._chunks

    def write_prediction(self, contig, contig_start, contig_end, chunk_id,
                         position, bases, rles, quals=None) -> bool:
        if "/" in contig:
            raise ValueError(
                f"contig name {contig!r} contains '/', which is not "
                "representable in the prediction-store HDF5 layout"
            )
        region = f"{contig}-{contig_start}-{contig_end}"
        key = (region, str(chunk_id))
        if key in self._chunks:
            return False
        self._chunks.add(key)
        self._check_errors()
        # region-keyed routing keeps a region's chunks in one file (read
        # locality at stitch); stitch merges across files either way. crc32,
        # not hash(): str hashes are salted per process and stable shard
        # contents make runs reproducible
        import zlib

        w = zlib.crc32(region.encode()) % len(self._work_qs)
        buf = self._buffers[w]
        buf.append(
            (contig, int(contig_start), int(contig_end), int(chunk_id),
             position, bases, rles, quals)
        )
        if len(buf) >= self._block_records:
            self._ship(w)
        return True

    def _ship(self, w: int) -> None:
        if not self._buffers[w]:
            return
        try:
            self._work_qs[w].put(self._buffers[w], timeout=600)
        except queue_mod.Full:
            self._abort()
            raise RuntimeError(
                f"prediction writer {w} stopped consuming (process killed?)"
            )
        self._buffers[w] = []

    def flush(self) -> None:
        """Ship buffered records, ask every worker to flush its file, and
        wait until all have (so a hard kill right after flush() leaves every
        shard readable for --resume)."""
        self._check_errors()
        for w in range(len(self._work_qs)):
            self._ship(w)
        for w, q in enumerate(self._work_qs):
            try:
                q.put(_FLUSH, timeout=600)
            except queue_mod.Full:
                self._abort()
                raise RuntimeError(
                    f"prediction writer {w} stopped consuming (process killed?)"
                )
        pending = len(self._work_qs)
        while pending:
            # poll with liveness checks: a worker killed without reporting
            # (OOM/SIGKILL) must raise here, never hang the polish job
            try:
                kind, payload = self._result_q.get(timeout=5)
            except queue_mod.Empty:
                dead = [p for p in self._procs if not p.is_alive()]
                if dead:
                    self._abort()
                    raise RuntimeError(
                        "prediction writer died during flush (exit codes "
                        f"{[p.exitcode for p in dead]})"
                    )
                continue
            if kind == "error":
                self._abort()
                raise RuntimeError(f"prediction writer failed: {payload}")
            if kind == "flushed":
                pending -= 1

    def close(self) -> None:
        if self._closed:
            return
        for w in range(len(self._work_qs)):
            self._ship(w)
        self._closed = True
        # bounded put with liveness checks: if a worker died with its queue
        # full, an unbounded put would block forever and never reach the
        # liveness-checked drain loop below
        for w, q in enumerate(self._work_qs):
            while True:
                try:
                    q.put(_SENTINEL, timeout=5)
                    break
                except queue_mod.Full:
                    if not self._procs[w].is_alive():
                        self._abort()
                        raise RuntimeError(
                            f"prediction writer {w} died before close (exit "
                            f"code {self._procs[w].exitcode})"
                        )
        done = 0
        waited = 0.0
        while done < len(self._procs):
            try:
                kind, payload = self._result_q.get(timeout=5)
            except queue_mod.Empty:
                waited += 5
                # every worker enqueues "done" before exiting, so an empty
                # queue with no live workers means one died mid-write
                if all(not p.is_alive() for p in self._procs) or waited > 600:
                    self._abort()
                    raise RuntimeError(
                        "prediction writer hung or died during close (exit "
                        f"codes {[p.exitcode for p in self._procs]})"
                    )
                continue
            if kind == "error":
                self._abort()
                raise RuntimeError(f"prediction writer failed: {payload}")
            if kind == "done":
                done += 1
        for p in self._procs:
            p.join(timeout=60)

    def __enter__(self) -> "PredictionWriterPool":
        return self

    def __exit__(self, *exc) -> None:
        if exc and exc[0] is not None:
            self._abort()  # don't mask the driver's exception with a hang
        else:
            self.close()

    # -----------------------------------------------------------------------

    def _check_errors(self) -> None:
        try:
            kind, payload = self._result_q.get_nowait()
        except queue_mod.Empty:
            return
        if kind == "error":
            self._abort()
            raise RuntimeError(f"prediction writer failed: {payload}")
        # stray non-error messages (e.g. late "flushed") are dropped

    def _abort(self) -> None:
        self._closed = True
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        for p in self._procs:
            p.join(timeout=10)
