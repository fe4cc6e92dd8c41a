"""Consensus stitching engine.

Reassembles per-image label predictions into contig sequences in two stages
(the reference's hierarchy, Stitch.py:14-301):

1. **Intra-region merge** — all image chunks of one MarginPolish region share
   a positional coordinate system, so their predictions are merged by
   (position, insert_index, split_index) key with first-write-wins dedupe,
   then RLE-decoded to sequence. The reference does this with Python dicts
   (its stitch bottleneck, Stitch.py:204-247); here it's a vectorized numpy
   lexsort + a native RLE expansion.

2. **Inter-region join** — adjacent regions overlap by design; the tail of
   the running sequence is locally aligned (SSW) against the head of the next
   region and the sequences are joined at the first grouped match run of
   >= overlap_threshold bases (reference Stitch.py:96-190, :33-94).
   Degenerate cases (no alignment, no anchor, no overlap) are patched with
   10 Ns, faithfully reproducing the reference fallbacks.

Contig-level fan-out uses a process pool over groups of region keys
(reference Stitch.py:277-294).
"""
from __future__ import annotations

import concurrent.futures
import ctypes
import multiprocessing
import re
from typing import Iterable, List, Sequence, Tuple

import numpy as np

from helen_tpu.config import STITCH, StitchConfig
from helen_tpu.io.prediction_store import list_region_keys, read_region_chunks
from helen_tpu.obs import get_logger
from helen_tpu.stitch._native import get_lib
from helen_tpu.stitch.aligner import Aligner, Alignment, Filter
from helen_tpu.utils.filesystem import chunk_list

log = get_logger("stitch")

_CIGAR_RE = re.compile(r"(\d+)(\w)")


def anchor_positions(
    cigar_string: str, reference_begin: int, overlap_threshold: int
) -> Tuple[int, int]:
    """Find the first grouped match run of >= overlap_threshold bases; return
    (ref_pos, query_pos) of its start, or (-1, -1).

    Reference semantics (Stitch.py:33-94): '='/'X' count as 'M'; adjacent
    same-op runs are grouped; S and I advance the query, D advances the ref,
    M advances both.
    """
    cigar = cigar_string.replace("=", "M").replace("X", "M")
    tuples = [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]
    grouped: List[Tuple[str, int]] = []
    for length, op in tuples:
        if grouped and grouped[-1][0] == op:
            grouped[-1] = (op, grouped[-1][1] + length)
        else:
            grouped.append((op, length))
    ref_index = reference_begin
    read_index = 0
    for op, length in grouped:
        if op == "M" and length >= overlap_threshold:
            return ref_index, read_index
        if op in ("S", "I"):
            read_index += length
        elif op == "D":
            ref_index += length
        elif op == "M":
            ref_index += length
            read_index += length
        else:
            raise ValueError(f"invalid cigar operation in stitching: {op}")
    return -1, -1


def rle_decode(bases: np.ndarray, rles: np.ndarray) -> str:
    """Expand (base, run-length) labels to sequence via the native helper."""
    bases = np.ascontiguousarray(bases, dtype=np.uint8)
    rles = np.ascontiguousarray(rles, dtype=np.uint8)
    cap = int(rles.astype(np.int64).sum()) + 1
    buf = ctypes.create_string_buffer(cap)
    n = get_lib().helen_rle_expand(
        bases.tobytes(), rles.tobytes(), len(bases), buf, cap
    )
    if n < 0:
        raise RuntimeError("rle_expand buffer overflow")
    return buf.raw[:n].decode("ascii")


def _dedupe_region_rows(position: np.ndarray, *arrays: np.ndarray):
    """The parity-critical row selection shared by both region merges:
    drop padding rows, stable-lexsort by (pos, insert, split), keep the
    FIRST row per key — exactly the dedupe the reference's dict insert
    gives (Stitch.py:227-245). Returns the kept rows of each array, or
    None when nothing survives.

    NOTE on the padding mask: rows read back from the prediction store can
    never be negative — the store writes uint32 like the reference, wrapping
    (-1,-1,-1) padding to 4294967295 (prediction_store.write_prediction) —
    so for store data this filters nothing and the wrapped padding dedupes
    to one tail entry, in both pipelines. The mask still matters for direct
    in-memory callers.
    """
    valid = (position[:, 0] >= 0) & (position[:, 1] >= 0)
    position = position[valid]
    arrays = tuple(a[valid] for a in arrays)
    if position.shape[0] == 0:
        return None
    # np.lexsort is stable, so equal keys keep arrival order (first write wins)
    order = np.lexsort((position[:, 2], position[:, 1], position[:, 0]))
    p = position[order]
    first = np.ones(p.shape[0], dtype=bool)
    first[1:] = (p[1:] != p[:-1]).any(axis=1)
    keep = order[first]
    return tuple(a[keep] for a in arrays)


def merge_region_chunks(
    chunks: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]]
) -> str:
    """Positionally merge the image chunks of one region and decode.

    First-write-wins per (pos, insert_idx, split_idx) in chunk order; output
    ordered by ascending key; padding rows (pos<0 or insert_idx<0) dropped
    (reference Stitch.py:227-245).
    """
    pos_list, base_list, rle_list = [], [], []
    for position, bases, rles in chunks:
        # positions widen to int64 for the lexsort key; bases/rles stay at
        # their native (uint8) width — rle_decode consumes them as uint8
        pos_list.append(np.asarray(position, dtype=np.int64))
        base_list.append(np.asarray(bases))
        rle_list.append(np.asarray(rles))
    if not pos_list:
        return ""
    kept = _dedupe_region_rows(
        np.concatenate(pos_list, axis=0),
        np.concatenate(base_list, axis=0),
        np.concatenate(rle_list, axis=0),
    )
    if kept is None:
        return ""
    bases, rles = kept
    return rle_decode(bases, rles)


def merge_region_chunks_with_quality(
    chunks: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
) -> Tuple[str, str]:
    """merge_region_chunks for --fastq: chunks carry per-column phred
    arrays; returns (sequence, phred+33 quality string) expanded per base
    (each decoded base inherits its column's quality). Row selection goes
    through the same _dedupe_region_rows, so the sequence is byte-identical
    to what merge_region_chunks emits."""
    pos_list, base_list, rle_list, qual_list = [], [], [], []
    for position, bases, rles, quals in chunks:
        if quals is None:
            raise ValueError(
                "prediction store has no 'quals' dataset — re-run consensus "
                "with --qualities to produce FASTQ output"
            )
        pos_list.append(np.asarray(position, dtype=np.int64))
        base_list.append(np.asarray(bases))
        rle_list.append(np.asarray(rles))
        qual_list.append(np.asarray(quals, dtype=np.uint8))
    if not pos_list:
        return "", ""
    kept = _dedupe_region_rows(
        np.concatenate(pos_list, axis=0),
        np.concatenate(base_list, axis=0),
        np.concatenate(rle_list, axis=0),
        np.concatenate(qual_list, axis=0),
    )
    if kept is None:
        return "", ""
    bases, rles, quals = kept
    seq = rle_decode(bases, rles)
    # per-base quality: the emitted count per column must mirror the native
    # decoder exactly — base class 0 emits nothing (label_decoder contract)
    # and out-of-range classes (>4, corrupt stores) are skipped there too
    counts = np.where((bases > 0) & (bases <= 4), rles.astype(np.int64), 0)
    qual = np.repeat(
        np.minimum(quals.astype(np.int64), 93) + 33, counts
    ).astype(np.uint8).tobytes().decode("ascii")
    assert len(qual) == len(seq), (len(qual), len(seq))
    return seq, qual


class _SegmentRope:
    """Append/tail-oriented string accumulator.

    The reference stitches by rebuilding the whole running string at every
    join (Stitch.py:170-177) — O(contig_length) copying per region, which is
    quadratic over a contig (its stitch stage costs 20-60 min on a human
    genome partly because of this). Joins only ever need the LAST
    ``overlap_bases`` characters, so we keep the sequence as a list of
    segments and touch only the tail; the full string is materialized once at
    the end.
    """

    def __init__(self, initial: str):
        self.parts = [initial] if initial else []
        self.length = len(initial)

    def tail(self, k: int) -> str:
        """Last min(k, length) characters (k <= 0 returns the whole string,
        matching Python's s[-0:] quirk the reference relies on)."""
        if k <= 0 or k >= self.length:
            return "".join(self.parts)
        out = []
        need = k
        for seg in reversed(self.parts):
            if need <= 0:
                break
            take = seg[-need:] if need < len(seg) else seg
            out.append(take)
            need -= len(take)
        return "".join(reversed(out))

    def drop_tail(self, k: int) -> None:
        """Remove the last k characters (k<=0: clears everything, matching
        the reference's s[:-0] == '' semantics)."""
        if k <= 0 or k >= self.length:
            self.parts = []
            self.length = 0
            return
        need = k
        while need > 0 and self.parts:
            seg = self.parts[-1]
            if len(seg) <= need:
                self.parts.pop()
                need -= len(seg)
            else:
                self.parts[-1] = seg[:-need]
                need = 0
        self.length -= k

    def append(self, s: str) -> None:
        if s:
            self.parts.append(s)
            self.length += len(s)

    def materialize(self) -> str:
        return "".join(self.parts)


def alignment_stitch(
    sequence_chunks: Sequence[Tuple],
    cfg: StitchConfig = STITCH,
) -> Tuple:
    """Join sorted overlapping region sequences with SSW anchors.

    Faithful to the reference merge loop (Stitch.py:96-190) including its
    N-fill fallback behaviors; the accumulation is segment-based (see
    _SegmentRope) so cost is linear in contig length.

    Chunks are (contig, start, end, sequence[, quality]); when the optional
    per-base quality string is present (--fastq runs), a second rope mirrors
    every sequence operation (anchor joins cut both at the same offsets;
    N fills get quality '!') and the return gains the joined quality —
    the sequence itself is byte-identical either way.
    """
    chunks = sorted(sequence_chunks, key=lambda c: (c[1], c[2]))
    contig, running_start, running_end, first_sequence = chunks[0][:4]
    with_quality = len(chunks[0]) > 4
    rope = _SegmentRope(first_sequence)
    qrope = _SegmentRope(chunks[0][4]) if with_quality else None
    aligner = Aligner(cfg.match_score, cfg.mismatch_penalty,
                      cfg.gap_open_penalty, cfg.gap_extend_penalty)
    filt = Filter()
    for chunk in chunks[1:]:
        _, this_start, this_end, this_sequence = chunk[:4]
        this_quality = chunk[4] if with_quality else None
        if this_start < running_end:
            overlap_bases = running_end - this_start
            overlap_bases = overlap_bases + int(overlap_bases * cfg.base_error_rate)
            left_chunk = rope.tail(overlap_bases)
            qleft = qrope.tail(overlap_bases) if with_quality else None
            right_chunk = this_sequence[:overlap_bases]
            alignment = Alignment()
            aligner.SetReferenceSequence(left_chunk, len(left_chunk))
            aligner.Align_cpp(right_chunk, filt, alignment, 0)
            if alignment.best_score == 0:
                log.warning("no alignment found between %s:%d-%d and running sequence",
                            contig, this_start, this_end)
                # reference behavior: append the overlap prefix after 10 Ns
                if len(right_chunk) > 10:
                    rope.append(10 * "N")
                    rope.append(right_chunk)
                    if with_quality:
                        qrope.append(10 * "!")
                        qrope.append(this_quality[:overlap_bases])
                    running_end = this_end
            else:
                pos_a, pos_b = anchor_positions(
                    alignment.cigar_string, alignment.reference_begin,
                    cfg.overlap_threshold,
                )
                if pos_a == -1 or pos_b == -1:
                    log.warning("no anchor in alignment at %s:%d (cigar %s)",
                                contig, this_start, alignment.cigar_string)
                    if len(this_sequence) > 10:
                        # running[:-ov] + left_chunk + 10N + this == running + 10N + this
                        rope.append(10 * "N")
                        rope.append(this_sequence)
                        if with_quality:
                            qrope.append(10 * "!")
                            qrope.append(this_quality)
                        running_end = this_end
                else:
                    rope.drop_tail(overlap_bases)
                    rope.append(left_chunk[:pos_a])
                    rope.append(this_sequence[pos_b:])
                    if with_quality:
                        qrope.drop_tail(overlap_bases)
                        qrope.append(qleft[:pos_a])
                        qrope.append(this_quality[pos_b:])
                    running_end = this_end
        else:
            log.warning("no overlap between chunks at %s:%d (running end %d)",
                        contig, this_start, running_end)
            if len(this_sequence) > 10:
                rope.append(10 * "N")
                rope.append(this_sequence)
                if with_quality:
                    qrope.append(10 * "!")
                    qrope.append(this_quality)
                running_end = this_end
    if with_quality:
        return (contig, running_start, running_end, rope.materialize(),
                qrope.materialize())
    return contig, running_start, running_end, rope.materialize()


def _stitch_key_group(
    contig: str,
    key_group: Sequence[Tuple[Tuple[str, ...], str, int, int]],
    cfg: StitchConfig,
    with_quality: bool = False,
) -> Tuple:
    """Worker: decode each region in the group, then join them.
    (Equivalent of reference Stitch.small_chunk_stitch.) Each region's chunks
    are merged across all prediction files holding them (image-granular
    multi-host shards interleave a region's chunks across host files)."""
    region_sequences = []
    for file_paths, region_key, start, end in key_group:
        if with_quality:
            seq, qual = merge_region_chunks_with_quality(
                read_region_chunks(file_paths, contig, region_key, with_quals=True)
            )
            region_sequences.append((contig, int(start), int(end), seq, qual))
        else:
            seq = merge_region_chunks(read_region_chunks(file_paths, contig, region_key))
            region_sequences.append((contig, int(start), int(end), seq))
    return alignment_stitch(region_sequences, cfg)


class Stitcher:
    """Contig-level stitch driver with process-pool fan-out.

    ``with_quality=True`` (FASTQ output) threads per-base qualities through
    the merges and joins; ``stitch_iter`` then yields (contig, sequence,
    quality) triples instead of pairs.
    """

    def __init__(self, cfg: StitchConfig = STITCH, threads: int = 4,
                 with_quality: bool = False, executor=None):
        """``executor``: an optional PRE-WARMED process pool from
        :func:`prewarm_stitch_pool`. The Stitcher takes ownership (it is
        shut down by stitch_iter exactly as an internally-created pool
        would be) — callers create it early so the worker spawn + heavy
        imports overlap preceding pipeline stages (consensus) instead of
        serializing into the stitch wall time."""
        self.cfg = cfg
        self.threads = max(1, threads)
        self.with_quality = with_quality
        self._executor = executor

    def _result(self, joined: Tuple):
        return joined[3:5] if self.with_quality else joined[3]

    def _join(self, results: List[Tuple]):
        if not results:
            return ("", "") if self.with_quality else ""
        # alignment_stitch sorts its input by (start, end) itself
        return self._result(alignment_stitch(results, self.cfg))

    def _plan(self, prediction_files: List[str], contigs: Sequence[str]):
        plan = []
        for contig in contigs:
            keys = list_region_keys(prediction_files, contig)
            group_size = max(
                self.cfg.min_sequence_for_multithreading,
                len(keys) // self.threads + 1,
            )
            plan.append((contig, list(chunk_list(keys, group_size))))
        return plan

    def stitch_iter(self, prediction_files: List[str], contigs: Sequence[str]):
        """Yield (contig, sequence) in the given contig order, with ONE
        process pool shared across every contig's key groups — work on later
        contigs overlaps the in-order joins, so fragmented assemblies
        (hundreds of small contigs) keep all workers busy instead of
        draining the pool at each contig boundary (the reference rebuilds
        its pool per contig, Stitch.py:277-299)."""
        plan = self._plan(prediction_files, contigs)
        total_groups = sum(len(g) for _, g in plan)

        def emit(contig, joined):
            return ((contig, *joined) if self.with_quality
                    else (contig, joined))

        if self.threads == 1 or total_groups <= 1:
            if self._executor is not None:  # owned but unused: release it
                self._executor.shutdown(wait=False, cancel_futures=True)
                self._executor = None
            for contig, groups in plan:
                yield emit(contig, self._join(
                    [_stitch_key_group(contig, g, self.cfg, self.with_quality)
                     for g in groups]
                ))
            return
        # spawn (not fork): the parent may hold JAX/TPU runtime threads,
        # and forking a multithreaded process can deadlock. Workers are
        # pure-CPU (numpy + h5py + native SSW): lean_worker_env keeps the
        # spawned interpreters from bootstrapping an accelerator client
        # (2.3 s/worker + a device claim on the TPU harness — utils.procs)
        from helen_tpu.utils.procs import lean_worker_env

        if self._executor is not None:
            ex = self._executor  # pre-warmed (prewarm_stitch_pool)
            self._executor = None
        else:
            try:
                ex = concurrent.futures.ProcessPoolExecutor(
                    max_workers=self.threads,
                    mp_context=multiprocessing.get_context("spawn"),
                )
            except (OSError, concurrent.futures.process.BrokenProcessPool) as exc:
                log.warning("stitch process pool unavailable (%s); running "
                            "in-process", exc)
                for contig, groups in plan:
                    yield emit(contig, self._join(
                        [_stitch_key_group(contig, g, self.cfg,
                                           self.with_quality)
                         for g in groups]
                    ))
                return
        done = False
        try:
            try:
                with lean_worker_env():
                    # workers launch lazily inside submit — keep every spawn
                    # inside the scrubbed-env window
                    futures = {
                        contig: [ex.submit(_stitch_key_group, contig, g,
                                           self.cfg, self.with_quality)
                                 for g in groups]
                        for contig, groups in plan
                    }
            except (concurrent.futures.process.BrokenProcessPool,
                    RuntimeError) as exc:
                # a pre-warmed pool can arrive broken (a worker died during
                # warmup — BrokenProcessPool) or already shut down
                # (RuntimeError); never let that kill the stitch — run
                # in-process
                log.warning("stitch pool unusable at submit (%s); running "
                            "in-process", exc)
                done = True  # owned pool is shut down by the finally below
                for contig, groups in plan:
                    yield emit(contig, self._join(
                        [_stitch_key_group(contig, g, self.cfg,
                                           self.with_quality)
                         for g in groups]
                    ))
                return
            for contig, groups in plan:
                results: List[Tuple] = []
                failed_groups: List[Sequence] = []
                for fut, g in zip(futures[contig], groups):
                    # fut.exception() blocks until done and RETURNS the error
                    # (a broken pool surfaces here as BrokenProcessPool too)
                    exc = fut.exception()
                    if exc is None:
                        results.append(fut.result())
                    else:
                        log.warning("stitch worker failed (%s); will retry "
                                    "in-process", exc)
                        failed_groups.append(g)
                # a failed worker must never silently shrink the output —
                # retry its group here, IN-PROCESS (a direct call, not
                # ex.submit: pool spawns happen only at submit time, so
                # keeping the retry out of the pool means no worker can
                # ever spawn outside the lean_worker_env window above),
                # and let real errors propagate
                for g in failed_groups:
                    results.append(
                        _stitch_key_group(contig, g, self.cfg, self.with_quality)
                    )
                yield emit(contig, self._join(results))
            done = True
        finally:
            # on abandonment (consumer error/GeneratorExit mid-iteration),
            # drop the queued work for later contigs instead of blocking in
            # shutdown(wait=True) until every doomed group finishes
            ex.shutdown(wait=done, cancel_futures=not done)

    def stitch(self, prediction_files: List[str], contig: str) -> str:
        for row in self.stitch_iter(prediction_files, [contig]):
            return row[1]  # sequence (rows are (contig, seq[, qual]))
        return ""


def _warm_worker() -> int:
    """Run inside a freshly spawned stitch worker: pull in the heavy
    imports and build/load the native library NOW so the first real task
    doesn't pay them."""
    import h5py  # noqa: F401
    import numpy  # noqa: F401

    from helen_tpu.stitch._native import get_lib

    get_lib()
    return 0


def prewarm_stitch_pool(threads: int):
    """Create the stitch process pool and start spawning + warming its
    workers immediately (one no-op task per worker triggers the lazy
    spawn; the task imports numpy/h5py and loads the native SSW library).

    Call this BEFORE a long preceding stage (polish calls it before
    consensus) and hand the pool to ``Stitcher(executor=...)`` /
    ``perform_stitch(executor=...)`` — worker spawn + imports (~1-3 s on
    small hosts) then overlap that stage instead of serializing into the
    stitch wall time. Returns None when ``threads <= 1`` (the Stitcher
    would take its serial path anyway). The receiving Stitcher owns the
    pool; if stitch never runs, the creator must shut it down."""
    if threads <= 1:
        return None
    from helen_tpu.utils.procs import lean_worker_env

    with lean_worker_env():
        ex = concurrent.futures.ProcessPoolExecutor(
            max_workers=threads,
            mp_context=multiprocessing.get_context("spawn"),
        )
        for _ in range(threads):
            ex.submit(_warm_worker)  # spawn + import in the background
    return ex


def stitch_contig(
    prediction_files: List[str],
    contig: str,
    threads: int = 4,
    cfg: StitchConfig = STITCH,
) -> str:
    return Stitcher(cfg, threads).stitch(prediction_files, contig)
